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


@pytest.mark.parametrize("mode", ["aa", "dna"])
def test_bulk_matches_native(tmp_path, mode):
    """The zero-per-record bulk path (native parse buffer fed straight to
    the native feeder) must equal the record-iterator native path:
    containers (incl. lazily synthesized keys), id_len, and the record
    multiset. Sequences avoid FASTA-structural chars (the bulk path
    parses real FASTA text; '>' and whitespace would change parsing, not
    feeding — parser quirks are pinned separately by test_fasta_fuzz)."""
    import io

    from kmergutsjava_tpu.models.prepare import (prepare_aa_native,
                                                 prepare_dna_native,
                                                 try_prepare_bulk)

    rng = random.Random(50 if mode == "aa" else 51)
    chars = (AA if mode == "aa" else DNA).replace(" ", "").replace(".", "x")
    records = _records(rng, chars, 35, 8, 300)
    fasta = "".join(f">{r.id} d{r.id}\n{r.seq}\n" for r in records)

    store = QueryKmerStore(10007, 10**9, str(tmp_path / "blk"))
    prep = try_prepare_bulk(None, io.StringIO(fasta), store,
                            aa=(mode == "aa"), flush_chars=2000)
    assert prep is not None
    rec = store.finalize()
    a = (prep.containers, prep.id_len,
         sorted(zip(rec["value"].tolist(), rec["cnt"].tolist(),
                    rec["pos"].tolist())))
    store.close()
    fn = prepare_aa_native if mode == "aa" else prepare_dna_native
    b = _collect(fn, records, tmp_path, "nat2")
    assert a[0] == b[0] and a[1] == b[1]
    assert a[2] == sorted(b[2])


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


@pytest.mark.parametrize("mode", ["aa", "dna"])
def test_feeder_mt_bit_identical(tmp_path, mode):
    """The record-range-parallel feeder must emit exactly the sequential
    record stream (>1MB of chars engages the MT path)."""
    from kmergutsjava_tpu.models.prepare import (prepare_aa_native,
                                                 prepare_dna_native)
    from test_native_scatter import threads

    rng = random.Random(70 if mode == "aa" else 71)
    chars = AA if mode == "aa" else DNA
    records = _records(rng, chars, 800, 500, 4000)  # ~1.8M chars
    fn = prepare_aa_native if mode == "aa" else prepare_dna_native

    def run(nthreads, tag):
        with threads(nthreads):
            store = QueryKmerStore(10007, 10**9, str(tmp_path / tag))
            prep = fn(records, store)
            rec = store.finalize()
            out = (rec["value"].tolist(), rec["cnt"].tolist(),
                   rec["pos"].tolist())
            store.close()
            return prep.containers, out

    a = run(1, "t1")
    b = run(4, "t4")
    assert a == b
