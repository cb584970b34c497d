"""Differential fuzz: calls/grouping vs an independent line-by-line
transcription of the Java state machine (tests/java_oracle.py)."""
import io
import random

import numpy as np

from java_oracle import oracle_gather_hits
from kmergutsjava_tpu.calls.grouping import (GroupingParams, Report,
                                             gather_hits, gather_hits_arrays,
                                             tabulate_otu_data)

FUNCS = [f"fn{i}" for i in range(6)]


def _random_hits(rng, n, n_fi, span):
    pos = sorted(rng.sample(range(span), n)) if n <= span else \
        sorted(rng.randrange(span) for _ in range(n))
    return [(p, rng.randrange(5), rng.randrange(300), rng.randrange(n_fi),
             np.float32(rng.choice([0.1, 0.25, 1.0, 2.5])))
            for p in pos]


def test_grouping_vs_independent_oracle():
    rng = random.Random(42)
    for trial in range(400):
        n = rng.randint(0, 60)
        n_fi = rng.choice([1, 2, 3, 6])
        span = rng.choice([100, 400, 3000])
        hits = _random_hits(rng, n, n_fi, span)
        min_hits = rng.choice([2, 3, 5])
        min_weighted = rng.choice([0, 0, 1])
        max_gap = rng.choice([30, 200])
        order_c = rng.random() < 0.25
        params = (min_hits, min_weighted, max_gap, order_c, False)
        p = GroupingParams(min_hits=min_hits, min_weighted_hits=min_weighted,
                           max_gap=max_gap, order_constraint=order_c)

        oi_oracle = []
        want_lines = oracle_gather_hits(list(hits), FUNCS, oi_oracle, params)

        out = io.StringIO()
        oi_mine = []
        gather_hits(list(hits), FUNCS, oi_mine, Report(out), p)
        got_lines = out.getvalue().splitlines()
        assert got_lines == want_lines, (trial, hits)
        assert oi_mine == oi_oracle, (trial, hits)

        # array path too
        out2 = io.StringIO()
        oi_arr = []
        gather_hits_arrays(
            np.array([h[0] for h in hits], np.int64),
            np.array([h[1] for h in hits], np.int32),
            np.array([h[2] for h in hits], np.int32),
            np.array([h[3] for h in hits], np.int32),
            np.array([h[4] for h in hits], np.float32),
            FUNCS, oi_arr, Report(out2), p)
        assert out2.getvalue().splitlines() == want_lines, (trial, hits)
        assert oi_arr == oi_oracle, (trial, hits)


def test_multi_container_otu_accumulation():
    """OTU counter threads across a sequence's six frame containers."""
    rng = random.Random(7)
    for trial in range(150):
        params = (2, 0, 100, False, False)
        p = GroupingParams(min_hits=2, max_gap=100)
        containers = [_random_hits(rng, rng.randint(0, 25),
                                   rng.choice([1, 2]), 300)
                      for _ in range(6)]
        oi_oracle = []
        want = []
        for c in containers:
            want += oracle_gather_hits(list(c), FUNCS, oi_oracle, params)
        oi_mine = []
        out = io.StringIO()
        for c in containers:
            gather_hits_arrays(
                np.array([h[0] for h in c], np.int64),
                np.array([h[1] for h in c], np.int32),
                np.array([h[2] for h in c], np.int32),
                np.array([h[3] for h in c], np.int32),
                np.array([h[4] for h in c], np.float32),
                FUNCS, oi_mine, Report(out), p)
        assert out.getvalue().splitlines() == want, trial
        assert oi_mine == oi_oracle, trial
        # and the OTU line itself
        out_a, out_b = io.StringIO(), io.StringIO()
        tabulate_otu_data("s", 1, [list(x) for x in oi_oracle], Report(out_a))
        tabulate_otu_data("s", 1, oi_mine, Report(out_b))
        assert out_a.getvalue() == out_b.getvalue()


def test_debug_output_vs_independent_oracle():
    from java_oracle import oracle_gather_hits_debug

    rng = random.Random(99)
    for trial in range(150):
        n = rng.randint(0, 40)
        hits = _random_hits(rng, n, rng.choice([1, 2, 4]),
                            rng.choice([100, 1000]))
        params = (2, 0, rng.choice([50, 200]), rng.random() < 0.3, True)
        p = GroupingParams(min_hits=2, max_gap=params[2],
                           order_constraint=params[3], debug=True)
        oi_a, oi_b = [], []
        want = oracle_gather_hits_debug(list(hits), FUNCS, oi_a, params)
        out = io.StringIO()
        gather_hits(list(hits), FUNCS, oi_b, Report(out), p)
        assert out.getvalue().splitlines() == want, (trial, hits)
        assert oi_a == oi_b
