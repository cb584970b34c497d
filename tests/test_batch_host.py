"""batch_single_fi_calls vs the exact per-container machine."""
import io
import random

import numpy as np

from kmergutsjava_tpu.calls.batch_host import batch_single_fi_calls
from kmergutsjava_tpu.calls.grouping import (GroupingParams, Report,
                                             _otu_add_batch, gather_hits)

FUNCS = [f"fn{i}" for i in range(6)]


def test_batch_vs_machine_fuzz():
    rng = random.Random(77)
    for trial in range(120):
        p = GroupingParams(min_hits=rng.choice([2, 3, 5]),
                           min_weighted_hits=rng.choice([0, 0, 1]),
                           max_gap=rng.choice([20, 100, 500]))
        n_containers = rng.randint(1, 12)
        cnt, pos, otu, fi, wt = [], [], [], [], []
        per_container = {}
        for cid in range(n_containers):
            n = rng.randint(0, 30)
            ps = sorted(rng.sample(range(2000), n))
            f0 = rng.randrange(len(FUNCS))  # single fi per container
            hits = [(q, rng.randrange(5), rng.randrange(300), f0,
                     np.float32(rng.choice([0.1, 0.25, 1.0])))
                    for q in ps]
            per_container[cid] = hits
            for h in hits:
                cnt.append(cid)
                pos.append(h[0])
                otu.append(h[1])
                fi.append(h[3])
                wt.append(h[4])
        elig = np.ones(n_containers, dtype=bool)
        got = batch_single_fi_calls(
            np.array(cnt, np.int64), np.array(pos, np.int64),
            np.array(otu, np.int32), np.array(fi, np.int32),
            np.array(wt, np.float32), elig, FUNCS, p)
        for cid in range(n_containers):
            out = io.StringIO()
            oi_m = []
            gather_hits(list(per_container[cid]), FUNCS, oi_m, Report(out), p)
            lines, updates = got.get(cid, ([], []))
            assert out.getvalue().splitlines() == lines, (trial, cid)
            oi_b = []
            for o, inc in updates:
                _otu_add_batch(oi_b, o, inc)
            assert oi_b == oi_m, (trial, cid)
