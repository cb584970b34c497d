"""Native batch grouping (kmergutsjava_tpu/native/grouping.cpp) vs the exact Python machine.

Randomized multi-container batches — mixed function indices, gaps, seeds,
order constraint, weight thresholds — must reproduce the tuple-level
machine's CALL text and OTU-counter state byte-for-byte.
"""
import io
import random

import numpy as np
import pytest

from kmergutsjava_tpu.calls.batch_native import (batch_group_calls,
                                                 native_available)
from kmergutsjava_tpu.calls.grouping import (GroupingParams, Report,
                                             _otu_add_batch, gather_hits)

FUNCS = [f"fn{i}" for i in range(8)]

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no g++ toolchain")


def _random_container(rng, n, n_fi, gappy):
    pos = sorted(rng.sample(range(0, 3000 if gappy else 300), n))
    fi = [rng.randrange(n_fi) for _ in range(n)]
    otu = [rng.randrange(6) for _ in range(n)]
    avg = [rng.randrange(400) for _ in range(n)]
    wt = [rng.choice([0.25, 0.5, 1.0, 0.1]) for _ in range(n)]
    return pos, otu, avg, fi, wt


def _run_batch(containers, p):
    """containers: list of (pos, otu, avg, fi, wt) per container id 0..n-1."""
    cnt = np.concatenate([np.full(len(c[0]), i, np.int64)
                          for i, c in enumerate(containers)])
    pos = np.concatenate([np.asarray(c[0], np.int64) for c in containers])
    otu = np.concatenate([np.asarray(c[1], np.int32) for c in containers])
    avg = np.concatenate([np.asarray(c[2], np.int32) for c in containers])
    fi = np.concatenate([np.asarray(c[3], np.int32) for c in containers])
    wt = np.concatenate([np.asarray(c[4], np.float32) for c in containers])
    uniq, starts = np.unique(cnt, return_index=True)
    bounds = np.append(starts, len(cnt))
    todo = np.arange(len(uniq), dtype=np.int64)
    return batch_group_calls(cnt, pos, otu, avg, fi, wt, todo, bounds,
                             FUNCS, p)


@pytest.mark.parametrize("seed,oc", [(0, False), (1, False), (2, True),
                                     (3, True)])
def test_native_matches_python_machine(seed, oc):
    rng = random.Random(seed)
    for trial in range(40):
        n_containers = rng.randint(1, 6)
        containers = []
        for _ in range(n_containers):
            n = rng.randint(2, 60)
            containers.append(_random_container(
                rng, n, rng.choice([2, 3, 4]), gappy=bool(trial % 2)))
        p = GroupingParams(min_hits=rng.choice([2, 3, 5]),
                           min_weighted_hits=rng.choice([0, 2]),
                           max_gap=rng.choice([50, 200]),
                           order_constraint=oc)
        native = _run_batch(containers, p)
        for i, (pos, otu, avg, fi, wt) in enumerate(containers):
            out = io.StringIO()
            oi_py = [[1, 3], [4, 2]]
            hits = list(zip(pos, otu, avg, fi,
                            [np.float32(w) for w in wt]))
            gather_hits(hits, FUNCS, oi_py, Report(out), p)
            lines_py = [ln for ln in out.getvalue().splitlines() if ln]
            kind, lines_nat, updates = native[i]
            assert kind == "pre"
            assert lines_nat == lines_py, (trial, i, pos, fi)
            oi_nat = [[1, 3], [4, 2]]
            for o, inc in updates:
                _otu_add_batch(oi_nat, o, inc)
            assert oi_nat == oi_py, (trial, i)


def test_native_seed_carryover_across_gap():
    """A trailing new-function pair survives a gap close; the next CALL's
    start anchors on the pre-gap seed position (ref :441-450)."""
    pos = [0, 10, 20, 30, 40, 50, 1000, 1010, 1020]
    fi = [1, 1, 1, 1, 2, 2, 2, 2, 2]
    otu = [3] * 9
    avg = [0] * 9
    wt = [1.0] * 9
    p = GroupingParams(min_hits=2)
    native = _run_batch([(pos, otu, avg, fi, wt)], p)
    out = io.StringIO()
    hits = list(zip(pos, otu, avg, fi, [np.float32(w) for w in wt]))
    gather_hits(hits, FUNCS, [], Report(out), p)
    assert native[0][1] == [ln for ln in out.getvalue().splitlines() if ln]
    # the second CALL must start at the seed position 40, not 1000
    assert any(ln.startswith("CALL\t40\t") for ln in native[0][1])


def test_native_empty_and_single():
    p = GroupingParams(min_hits=2)
    native = _run_batch([([5], [1], [0], [2], [0.5])], p)
    assert native[0] == ("pre", [], [])


def test_group_batch_mt_bit_identical():
    """The range-parallel group_batch must emit exactly the sequential
    call/update columns (hit count > 65536 engages the MT path)."""
    from kmergutsjava_tpu.calls.batch_native import _run_machine
    from kmergutsjava_tpu.utils.native import load_grouping
    from test_native_scatter import threads

    rng = np.random.default_rng(61)
    n = 200_000
    n_cont = 3000
    cnt_s = np.sort(rng.integers(0, n_cont, n).astype(np.int64))
    pos_s = np.empty(n, np.int64)
    uniq, starts = np.unique(cnt_s, return_index=True)
    bounds = np.append(starts, n)
    for a, b in zip(bounds[:-1], bounds[1:]):
        pos_s[a:b] = np.sort(rng.integers(0, 4000, b - a))
    otu_s = rng.integers(0, 6, n).astype(np.int32)
    avg_s = rng.integers(0, 400, n).astype(np.int32)
    fi_s = rng.integers(0, 8, n).astype(np.int32)
    wt_s = rng.choice(np.float32([0.25, 0.5, 1.0, 0.1]), n)
    todo = np.arange(len(uniq), dtype=np.int64)
    p = GroupingParams(min_hits=3, min_weighted_hits=0, max_gap=200,
                       order_constraint=False, debug=False)
    lib = load_grouping()
    with threads(1):
        a = _run_machine(lib, cnt_s, pos_s, otu_s, avg_s, fi_s, wt_s,
                         todo, bounds, p)
    with threads(4):
        b = _run_machine(lib, cnt_s, pos_s, otu_s, avg_s, fi_s, wt_s,
                         todo, bounds, p)
    assert a[1] == b[1] and a[1] > 0   # n_calls
    nc = a[1]
    nu = int(np.sum(a[8][:nc]))
    lengths = [nc, nc, nc, nc, nc, nc, nc, nu, nu]
    assert len(a) - 2 == len(lengths)
    for x, y, m in zip(a[2:], b[2:], lengths):
        assert np.array_equal(x[:m], y[:m])


def test_emit_report_mt_bit_identical():
    """The sequence-range-parallel emit_report must produce the exact
    sequential report bytes (n_seq > 4096 engages the MT path)."""
    from kmergutsjava_tpu.calls.batch_native import try_native_report
    from kmergutsjava_tpu.models.prepare import Prepared
    from kmergutsjava_tpu.lookup.parity import LookupHits
    from test_native_scatter import threads

    rng = np.random.default_rng(67)
    n_seq = 6000
    prep = Prepared(frames=1)
    for i in range(n_seq):
        prep.add_record(f"q{i}", int(rng.integers(20, 900)))
    n = 60_000
    cnt = np.sort(rng.integers(0, n_seq, n).astype(np.int64))
    pos = np.empty(n, np.int64)
    uniq, starts = np.unique(cnt, return_index=True)
    bnds = np.append(starts, n)
    for a, b in zip(bnds[:-1], bnds[1:]):
        pos[a:b] = np.sort(rng.integers(0, 800, b - a))
    hits = LookupHits(
        cnt_id=cnt, pos=pos,
        otu=rng.integers(0, 6, n).astype(np.int32),
        avg_from_end=rng.integers(0, 400, n).astype(np.int32),
        fi=rng.integers(0, 8, n).astype(np.int32),
        wt=rng.choice(np.float32([0.25, 0.5, 1.0]), n), kmers_found=-1)
    p = GroupingParams(min_hits=2, min_weighted_hits=0, max_gap=150,
                       order_constraint=False, debug=False)

    def render(nthreads):
        rep = Report(io.StringIO())
        with threads(nthreads):
            ok = try_native_report(prep, hits, FUNCS, True, rep, p)
        assert ok
        return rep.stream.getvalue()

    a, b = render(1), render(4)
    assert a == b and a.count("\n") >= n_seq * 2
