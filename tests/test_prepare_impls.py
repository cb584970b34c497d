"""numpy feeder prepare vs jitted-ops prepare: identical query streams."""
import random

import numpy as np
import pytest

from kmergutsjava_tpu.formats.fasta import FastaRecord
from kmergutsjava_tpu.lookup.store import QueryKmerStore
from kmergutsjava_tpu.models.prepare import (prepare_aa, prepare_aa_numpy,
                                             prepare_dna, prepare_dna_numpy)

AA = "ACDEFGHIKLMNPQRSTVWY*Xz ."
DNA = "acgtuACGTUnNrswkM."


def _records(rng, chars, n, lo, hi):
    return [FastaRecord(f"r{i}", "".join(rng.choice(chars)
                                         for _ in range(rng.randint(lo, hi))), "")
            for i in range(n)]


def _collect(prepare_fn, records, tmp_path, tag):
    store = QueryKmerStore(10007, 10**9, str(tmp_path / tag))
    prep = prepare_fn(records, store)
    rec = store.finalize()
    out = sorted(zip(rec["value"].tolist(), rec["cnt"].tolist(),
                     rec["pos"].tolist()))
    store.close()
    return prep.containers, prep.id_len, out


@pytest.mark.parametrize("mode", ["aa", "dna"])
def test_numpy_matches_jax(tmp_path, mode):
    rng = random.Random(4 if mode == "aa" else 5)
    if mode == "aa":
        records = _records(rng, AA, 30, 1, 150)
        fns = (prepare_aa_numpy, prepare_aa)
    else:
        records = _records(rng, DNA, 15, 1, 400)
        fns = (prepare_dna_numpy, prepare_dna)
    a = _collect(fns[0], records, tmp_path, "np")
    b = _collect(fns[1], records, tmp_path, "jax")
    assert a == b


def test_numpy_dna_matches_oracle(tmp_path):
    import java_oracle as oracle

    rng = random.Random(6)
    for _ in range(8):
        seq = "".join(rng.choice(DNA) for _ in range(rng.randint(1, 300)))
        store = QueryKmerStore(101, 10**9, str(tmp_path / "o"))
        prepare_dna_numpy([FastaRecord("x", seq, "")], store)
        rec = store.finalize()
        got = {}
        for r in rec:
            got.setdefault(int(r["cnt"]), []).append((int(r["value"]), int(r["pos"])))
        want = oracle.prepare_query(seq, aa=False)
        for row in range(6):
            assert got.get(row, []) == want[row], seq
        store.close()


@pytest.mark.parametrize("mode", ["aa", "dna"])
def test_native_matches_numpy(tmp_path, mode):
    from kmergutsjava_tpu.models.prepare import (prepare_aa_native,
                                                 prepare_dna_native)

    rng = random.Random(40 if mode == "aa" else 41)
    if mode == "aa":
        records = _records(rng, AA, 40, 1, 200)
        fns = (prepare_aa_native, prepare_aa_numpy)
    else:
        records = _records(rng, DNA, 25, 1, 500)
        fns = (prepare_dna_native, prepare_dna_numpy)
    a = _collect(fns[0], records, tmp_path, "nat")
    b = _collect(fns[1], records, tmp_path, "np2")
    assert a[0] == b[0] and a[1] == b[1]
    # record multisets equal (native emits per-record, numpy batched-global)
    assert sorted(a[2]) == sorted(b[2])


def test_native_dna_matches_oracle(tmp_path):
    import java_oracle as oracle
    from kmergutsjava_tpu.models.prepare import prepare_dna_native

    rng = random.Random(42)
    for _ in range(10):
        seq = "".join(rng.choice(DNA) for _ in range(rng.randint(1, 300)))
        store = QueryKmerStore(101, 10**9, str(tmp_path / "on"))
        prep = prepare_dna_native([FastaRecord("x", seq, "")], store)
        assert prep is not None
        rec = store.finalize()
        got = {}
        for r in rec:
            got.setdefault(int(r["cnt"]), []).append((int(r["value"]),
                                                      int(r["pos"])))
        want = oracle.prepare_query(seq, aa=False)
        for row in range(6):
            assert sorted(got.get(row, [])) == sorted(want[row]), seq
        store.close()
