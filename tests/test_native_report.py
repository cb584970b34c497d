"""The fully-native report path (grouping.cpp emit_report) must reproduce
the Python emission loop byte-for-byte, and its C++ Java-"%f" twin must
match utils/javafmt.jformat exactly."""
import io
import random

import numpy as np
import pytest

from kmergutsjava_tpu.calls.batch_native import (native_available,
                                                 try_native_report)
from kmergutsjava_tpu.calls.grouping import (GroupingParams, Report,
                                             process_aa_seq, process_dna_seq)
from kmergutsjava_tpu.config import EngineConfig
from kmergutsjava_tpu.lookup.parity import LookupHits
from kmergutsjava_tpu.models.pipeline import Engine
from kmergutsjava_tpu.models.prepare import Prepared
from kmergutsjava_tpu.utils.javafmt import jformat
from kmergutsjava_tpu.utils.native import load_grouping

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no native toolchain")

FUNCS = [f"fn {i}" for i in range(9)]


def _native_jweight(w):
    lib = load_grouping()
    buf = np.zeros(512, dtype=np.uint8)
    n = lib.jweight(np.float32(w), buf)
    return buf[:n].tobytes().decode()


def test_jweight_matches_jformat_specials():
    for w in (0.0, -0.0, 1.0, 2.5, 0.0078125, -0.0078125, 0.0234375,
              float("nan"), float("inf"), float("-inf"),
              float(np.float32(0.1)), float(np.float32(3.4e38)),
              float(np.float32(1e-38)), float(np.float32(-7.25))):
        assert _native_jweight(w) == jformat(float(np.float32(w))), w


def test_jweight_matches_jformat_randomized():
    rng = np.random.default_rng(0)
    # uniform, wide-exponent, and tie-prone dyadic values
    vals = [rng.uniform(-100, 100, 400).astype(np.float32),
            (rng.uniform(-1, 1, 400) * 10.0
             ** rng.integers(-8, 8, 400)).astype(np.float32),
            (rng.integers(-(1 << 20), 1 << 20, 400)
             * 2.0 ** rng.integers(-24, 0, 400)).astype(np.float32)]
    for arr in vals:
        for w in arr:
            assert _native_jweight(w) == jformat(float(w)), repr(w)


def _random_case(rng, aa, dup_ids):
    prep = Prepared()
    n_rec = rng.randint(1, 12)
    frames = 1 if aa else 6
    ids = []
    for i in range(n_rec):
        qid = f"s{rng.randrange(3)}" if dup_ids else f"seq{i}"
        ids.append(qid)
        if aa:
            prep.new_container((qid, "+", 0))
        else:
            for s in ("+", "-"):
                for f in range(3):
                    prep.new_container((qid, s, f))
        prep.id_len[qid] = rng.randint(8, 500)
    n_cont = n_rec * frames
    # random flat hits over random containers, shuffled order
    n_hits = rng.randint(0, 300)
    cnt = np.array([rng.randrange(n_cont) for _ in range(n_hits)], np.int64)
    pos = np.array([rng.randrange(0, 900) for _ in range(n_hits)], np.int64)
    otu = np.array([rng.randrange(7) for _ in range(n_hits)], np.int32)
    avg = np.array([rng.randrange(400) for _ in range(n_hits)], np.int32)
    fi = np.array([rng.randrange(len(FUNCS)) for _ in range(n_hits)], np.int32)
    wt = np.array([rng.choice([0.25, 0.5, 1.0, 0.1, 0.0078125])
                   for _ in range(n_hits)], np.float32)
    hits = LookupHits(cnt_id=cnt, pos=pos, otu=otu, avg_from_end=avg,
                      fi=fi, wt=wt, kmers_found=-1)
    return prep, hits


def _python_report(prep, hits, aa, params):
    eng = Engine(EngineConfig(aa=aa, min_hits=params.min_hits,
                              min_weighted_hits=params.min_weighted_hits,
                              max_gap=params.max_gap,
                              order_constraint=params.order_constraint))
    container_hits = eng._bucket_hits(prep, hits, FUNCS, params)
    out = io.StringIO()
    report = Report(out)
    for qid, ln in prep.id_len.items():
        if aa:
            process_aa_seq(qid, ln, container_hits, FUNCS, report, params)
        else:
            process_dna_seq(qid, ln, container_hits, FUNCS, report, params)
    return out.getvalue()


@pytest.mark.parametrize("aa", [True, False])
@pytest.mark.parametrize("dup_ids", [False, True])
def test_native_report_matches_python(aa, dup_ids):
    rng = random.Random(42 if aa else 43)
    for trial in range(40):
        prep, hits = _random_case(rng, aa, dup_ids)
        params = GroupingParams(
            min_hits=rng.choice([2, 3, 5]),
            min_weighted_hits=rng.choice([0, 1]),
            max_gap=rng.choice([50, 200]),
            order_constraint=rng.random() < 0.25)
        out = io.StringIO()
        ok = try_native_report(prep, hits, FUNCS, aa, Report(out), params)
        assert ok
        expect = _python_report(prep, hits, aa, params)
        assert out.getvalue() == expect, (trial, aa, dup_ids, params)


def test_native_report_empty_corpus():
    prep = Prepared()
    z = np.zeros(0)
    hits = LookupHits.from_lists(z, z, z, z, z, z, -1)
    out = io.StringIO()
    assert try_native_report(prep, hits, FUNCS, False, Report(out),
                             GroupingParams(min_hits=2))
    assert out.getvalue() == ""
