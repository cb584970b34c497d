"""gather_hits_arrays (with its single-run fast path) must reproduce the
exact tuple-level machine byte-for-byte on randomized containers."""
import io
import random

import numpy as np

from kmergutsjava_tpu.calls.grouping import (GroupingParams, Report,
                                             gather_hits, gather_hits_arrays)

FUNCS = [f"fn{i}" for i in range(8)]


def _random_container(rng, n, n_fi, gappy):
    pos = sorted(rng.sample(range(0, 3000 if gappy else 300), n))
    fi = [rng.randrange(n_fi) for _ in range(n)]
    otu = [rng.randrange(6) for _ in range(n)]
    avg = [rng.randrange(400) for _ in range(n)]
    wt = [rng.choice([0.25, 0.5, 1.0, 0.1]) for _ in range(n)]
    return pos, otu, avg, fi, wt


def run_both(pos, otu, avg, fi, wt, oi_init, **kw):
    p = GroupingParams(**kw)
    out_a, out_b = io.StringIO(), io.StringIO()
    oi_a = [list(x) for x in oi_init]
    oi_b = [list(x) for x in oi_init]
    hits = list(zip(pos, otu, avg, fi, [np.float32(w) for w in wt]))
    gather_hits(hits, FUNCS, oi_a, Report(out_a), p)
    gather_hits_arrays(np.array(pos, np.int64), np.array(otu, np.int32),
                       np.array(avg, np.int32), np.array(fi, np.int32),
                       np.array(wt, np.float32), FUNCS, oi_b, Report(out_b), p)
    return (out_a.getvalue(), oi_a), (out_b.getvalue(), oi_b)


def test_fastpath_single_fi_no_gaps():
    rng = random.Random(0)
    for trial in range(60):
        n = rng.randint(0, 40)
        pos, otu, avg, fi, wt = _random_container(rng, n, 1, gappy=False)
        oi_init = [[rng.randrange(6), rng.randint(1, 5)]
                   for _ in range(rng.randint(0, 4))]
        a, b = run_both(pos, otu, avg, fi, wt, oi_init,
                        min_hits=rng.choice([2, 3, 5]))
        assert a == b, (trial, pos, otu, fi)


def test_fallback_mixed_fi_and_gaps():
    rng = random.Random(1)
    for trial in range(60):
        n = rng.randint(0, 50)
        pos, otu, avg, fi, wt = _random_container(
            rng, n, rng.choice([1, 2, 3]), gappy=bool(trial % 2))
        oi_init = [[rng.randrange(6), rng.randint(1, 4)]
                   for _ in range(rng.randint(0, 5))]
        a, b = run_both(pos, otu, avg, fi, wt, oi_init,
                        min_hits=rng.choice([2, 3]),
                        max_gap=rng.choice([50, 200]),
                        min_weighted_hits=rng.choice([0, 2]))
        assert a == b, (trial, pos, fi)


def test_weight_threshold_and_float32_sum():
    # weights that tickle float32 sequential accumulation
    pos = list(range(0, 70, 10))
    wt = [0.1] * 7
    a, b = run_both(pos, [1] * 7, [0] * 7, [2] * 7, wt, [], min_hits=2)
    assert a == b
    assert "CALL\t0\t67\t7\t2\tfn2\t" in a[0]
