"""Multi-host contract simulation: round-robin record sharding over N
simulated hosts produces per-record report blocks identical to a
single-host run."""
import io
import random
import re

from kmergutsjava_tpu.config import EngineConfig
from kmergutsjava_tpu.formats.fasta import FastaRecord
from kmergutsjava_tpu.formats.table_tools import (signatures_from_proteins,
                                                  write_data_dir)
from kmergutsjava_tpu.models.pipeline import Engine
from kmergutsjava_tpu.parallel.multihost import shard_records

AA = "ACDEFGHIKLMNPQRSTVWY"


def _record_blocks(report: str, aa: bool):
    """Split a report into per-record blocks keyed by record id."""
    head = "PROTEIN-ID\t" if aa else "processing "
    blocks = {}
    cur_id, cur = None, []
    for line in report.splitlines():
        if line.startswith(head):
            if cur_id is not None:
                blocks[cur_id] = "\n".join(cur)
            cur_id = re.split(r"[\t\[]", line[len(head):])[0]
            cur = [line]
        elif cur_id is not None:
            cur.append(line)
    if cur_id is not None:
        blocks[cur_id] = "\n".join(cur)
    return blocks


def test_round_robin_hosts_match_single_host(tmp_path):
    rng = random.Random(13)
    prots = ["".join(rng.choice(AA) for _ in range(rng.randint(15, 80)))
             for _ in range(40)]
    write_data_dir(str(tmp_path / "d"), signatures_from_proteins(
        [(p, i % 6, i % 4) for i, p in enumerate(prots)]),
        [f"f{i}" for i in range(6)])
    records = [FastaRecord(f"p{i}", p, "") for i, p in enumerate(prots)]
    fasta = lambda recs: "".join(f">{r.id}\n{r.seq}\n" for r in recs)

    def run(recs):
        out = io.StringIO()
        Engine(EngineConfig(aa=True, min_hits=2)).run(
            str(tmp_path / "d"), None, out, stdout=True,
            query_stream=io.StringIO(fasta(recs)))
        return out.getvalue()

    single = _record_blocks(run(records), aa=True)
    merged = {}
    for host in range(3):
        shard = list(shard_records(records, host, 3))
        assert all(int(r.id[1:]) % 3 == host for r in shard)
        merged.update(_record_blocks(run(shard), aa=True))
    assert merged == single
    assert len(single) == len(prots)
