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
from kmergutsjava_tpu.parallel.multihost import (merge_report_shards,
                                                 shard_records,
                                                 split_report_blocks)

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


CODON = {  # one codon per aa, for building DNA that translates cleanly
    "A": "GCT", "C": "TGT", "D": "GAT", "E": "GAA", "F": "TTT",
    "G": "GGT", "H": "CAT", "I": "ATT", "K": "AAA", "L": "CTT",
    "M": "ATG", "N": "AAT", "P": "CCT", "Q": "CAA", "R": "CGT",
    "S": "TCT", "T": "ACT", "V": "GTT", "W": "TGG", "Y": "TAT"}


def _run_engine(data_dir, recs, aa):
    out = io.StringIO()
    Engine(EngineConfig(aa=aa, min_hits=2)).run(
        data_dir, None, out, stdout=True,
        query_stream=io.StringIO(
            "".join(f">{r.id}\n{r.seq}\n" for r in recs)))
    return out.getvalue()


def test_merge_report_shards_byte_identical(tmp_path):
    """merge_report_shards must reassemble per-host report shards into the
    EXACT single-run bytes, in both aa and DNA modes (the reference's
    deliverable is the report text, ref KmerGutsJava.java:398-404,
    :516-522; ordering :805-818)."""
    rng = random.Random(29)
    prots = ["".join(rng.choice(AA) for _ in range(rng.randint(15, 80)))
             for _ in range(25)]
    d = str(tmp_path / "d")
    write_data_dir(d, signatures_from_proteins(
        [(p, i % 6, i % 4) for i, p in enumerate(prots)]),
        [f"f{i}" for i in range(6)])
    for aa in (True, False):
        if aa:
            records = [FastaRecord(f"p{i}", p, "")
                       for i, p in enumerate(prots)]
        else:
            records = [FastaRecord(
                f"c{i}", "".join(CODON[c] for c in p), "")
                for i, p in enumerate(prots)]
        single = _run_engine(d, records, aa)
        for nproc in (2, 3, 5):
            shards = [_run_engine(d, list(shard_records(records, p, nproc)),
                                  aa) for p in range(nproc)]
            assert merge_report_shards(shards) == single, (aa, nproc)
    # block splitting sanity: one block per record, heads preserved
    blocks = split_report_blocks(single)
    assert len(blocks) == len(prots)
    assert all(b.startswith("processing ") for b in blocks)
    assert "".join(blocks) == single


def test_merge_report_shards_rejects_bad_input():
    import pytest

    with pytest.raises(ValueError, match="before the first record block"):
        split_report_blocks("Lookup time: 3 ms.\nPROTEIN-ID\tA\t20\n")
    # a non-round-robin partition (shard sizes impossible for one corpus)
    ok = "PROTEIN-ID\tA\t20\n"
    with pytest.raises(ValueError, match="round-robin"):
        merge_report_shards([ok, ok * 3])
