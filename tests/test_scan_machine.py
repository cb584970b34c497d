"""Device scan machine vs the exact host machine (and the independent
oracle) on randomized containers."""
import io
import random

import numpy as np

from java_oracle import oracle_gather_hits
from kmergutsjava_tpu.calls.grouping import (GroupingParams, Report,
                                             _otu_add_batch, gather_hits)
from kmergutsjava_tpu.calls.scan_machine import gather_hits_scan_batch

FUNCS = [f"fn{i}" for i in range(8)]


def _random_container(rng, n, n_fi, span):
    pos = sorted(rng.sample(range(span), min(n, span)))
    return (np.array(pos, np.int64),
            np.array([rng.randrange(5) for _ in pos], np.int32),
            np.array([rng.randrange(300) for _ in pos], np.int32),
            np.array([rng.randrange(n_fi) for _ in pos], np.int32),
            np.array([rng.choice([0.1, 0.25, 1.0, 2.5]) for _ in pos],
                     np.float32))


def test_scan_machine_vs_host_machine():
    rng = random.Random(5)
    for batch in range(12):
        params_kw = dict(min_hits=rng.choice([2, 3, 5]),
                         min_weighted_hits=rng.choice([0, 0, 1]),
                         max_gap=rng.choice([30, 200]),
                         order_constraint=rng.random() < 0.3)
        p = GroupingParams(**params_kw)
        containers = [_random_container(rng, rng.randint(0, 40),
                                        rng.choice([1, 2, 4]),
                                        rng.choice([100, 2000]))
                      for _ in range(25)]
        results = gather_hits_scan_batch(containers, FUNCS, p)
        oi_scan = []
        oi_host = []
        for (pos, oi, avg, fi, wt), (lines, updates) in zip(containers,
                                                            results):
            out = io.StringIO()
            hits = list(zip(pos.tolist(), oi.tolist(), avg.tolist(),
                            fi.tolist(),
                            [np.float32(w) for w in wt]))
            gather_hits(hits, FUNCS, oi_host, Report(out), p)
            assert out.getvalue().splitlines() == lines, (
                batch, params_kw, pos, fi)
            for o, inc in updates:
                _otu_add_batch(oi_scan, o, inc)
        assert oi_scan == oi_host, (batch, params_kw)


def test_scan_machine_vs_independent_oracle():
    rng = random.Random(11)
    p = GroupingParams(min_hits=2, max_gap=100)
    params = (2, 0, 100, False, False)
    containers = [_random_container(rng, rng.randint(0, 30), 3, 500)
                  for _ in range(30)]
    results = gather_hits_scan_batch(containers, FUNCS, p)
    for (pos, oi, avg, fi, wt), (lines, _) in zip(containers, results):
        hits = list(zip(pos.tolist(), oi.tolist(), avg.tolist(), fi.tolist(),
                        [np.float32(w) for w in wt]))
        want = oracle_gather_hits(hits, FUNCS, [], params)
        assert lines == want


def test_scan_grouping_end_to_end(tmp_path):
    """Engine with grouping_impl='scan' produces byte-identical reports."""
    import io

    from kmergutsjava_tpu.config import EngineConfig
    from kmergutsjava_tpu.formats.table_tools import (signatures_from_proteins,
                                                      write_data_dir)
    from kmergutsjava_tpu.models.pipeline import Engine

    rng = random.Random(21)
    aa_chars = "ACDEFGHIKLMNPQRSTVWY"
    prots = ["".join(rng.choice(aa_chars) for _ in range(rng.randint(15, 90)))
             for _ in range(30)]
    triples = [(p, i % 5, i % 7) for i, p in enumerate(prots)]
    write_data_dir(str(tmp_path / "d"), signatures_from_proteins(triples),
                   [f"f{i}" for i in range(5)])
    fasta = "".join(f">p{i}\n{p}\n" for i, p in enumerate(prots))
    outs = {}
    for impl in ("host", "scan"):
        for aa in (True, False):
            q = fasta if aa else "".join(
                f">c{i}\n" + "".join(rng.choice("ACGT") for _ in range(250))
                + "\n" for i in range(6))
            out = io.StringIO()
            Engine(EngineConfig(aa=aa, min_hits=2, grouping_impl=impl)).run(
                str(tmp_path / "d"), None, out, stdout=True,
                query_stream=io.StringIO(q))
            outs[(impl, aa)] = out.getvalue()
    assert outs[("host", True)] == outs[("scan", True)]
    assert outs[("host", False)] == outs[("scan", False)]
    assert "CALL\t" in outs[("host", True)]
