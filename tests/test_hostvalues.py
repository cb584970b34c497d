"""Host value-recompute helpers + fingerprint-candidate verification.

The SPMD probe ships only the uint16 fingerprint plane to the device
(parallel/sharded_lookup.py); exactness rests on (a) ops/hostvalues.py
recomputing query values at candidate coordinates identically to the
prepare oracle, and (b) verify_candidates resolving engineered
fingerprint collisions with the exact host window re-probe.
"""
import numpy as np
import pytest

from kmergutsjava_tpu.formats.kmer_table import build_table
from kmergutsjava_tpu.lookup.xla import FP_MOD, XlaLookup
from kmergutsjava_tpu.ops.hostvalues import aa_values_at, dna_values_at
from test_table import random_signatures


def test_aa_values_at_matches_prepare_oracle():
    import java_oracle as oracle

    rng = np.random.default_rng(11)
    aa = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)
    b, L = 6, 64
    mat = rng.choice(aa, size=(b, L)).astype(np.uint8)
    want = {}
    for r in range(b):
        s = mat[r].tobytes().decode()
        (pairs,) = oracle.prepare_query(s, aa=True)
        for v, p in pairs:
            want[(r, p)] = v
    rr = np.array([k[0] for k in want], np.int64)
    cc = np.array([k[1] for k in want], np.int64)
    got = aa_values_at(mat, rr, cc)
    assert got.tolist() == [want[(r, c)] for r, c in zip(rr, cc)]


def test_dna_values_at_matches_prepare_oracle():
    import java_oracle as oracle

    rng = np.random.default_rng(12)
    bases = np.frombuffer(b"ACGT", np.uint8)
    b, L = 5, 120
    mat = np.zeros((b, L), np.uint8)
    lens = rng.integers(60, L + 1, b).astype(np.int64)
    for r in range(b):
        mat[r, : lens[r]] = rng.choice(bases, size=lens[r])
    rrs, ggs, ccs, want = [], [], [], []
    for r in range(b):
        s = mat[r, : lens[r]].tobytes().decode()
        frames = oracle.prepare_query(s, aa=False)
        for g in range(6):
            for v, p in frames[g]:
                rrs.append(r)
                ggs.append(g)
                ccs.append(p)
                want.append(v)
    got = dna_values_at(mat, lens, np.array(rrs, np.int64),
                        np.array(ggs, np.int64), np.array(ccs, np.int64))
    assert got.tolist() == want


def _collision_table():
    """Table whose slots [h, h+1] hold v1 < v2 with EQUAL fingerprint and
    EQUAL home: any fingerprint probe for v2 candidates v1's slot first."""
    ns = 101
    v1 = 1_000_003 + (90 - 1_000_003 % ns)  # home slot 90
    v2 = v1 + FP_MOD * ns          # same fp (mod 65535), same home (mod ns)
    rng = np.random.default_rng(13)
    sig = random_signatures(rng, 40, max_val=1_000_000)
    # filler homes in [0, 50): their probe chains (<= 40 long) can never
    # reach slot 90, so v1/v2 land exactly at [90, 91]
    filler = np.unique(rng.integers(0, 1_000_000 // ns, 40) * ns
                       + rng.integers(0, 50, 40)).astype(np.int64)
    sig["kmers"] = filler
    for k in ("otu", "avg_from_end", "fi", "wt"):
        sig[k] = sig[k][: len(filler)]
    kmers = np.concatenate([sig["kmers"], [v1, v2]])
    pad = lambda a, x: np.concatenate([a, np.asarray(x, a.dtype)])
    table = build_table(kmers, pad(sig["otu"], [1, 2]),
                        pad(sig["avg_from_end"], [10, 20]),
                        pad(sig["fi"], [3, 4]),
                        pad(sig["wt"], [0.5, 0.25]), num_sigs=ns)
    h = v1 % ns
    assert table.slots["kmer"][h] == v1
    assert table.slots["kmer"][h + 1] == v2
    return table, v1, v2, ns


def test_verify_candidates_resolves_collision():
    from kmergutsjava_tpu.parallel.sharded_lookup import verify_candidates

    table, v1, v2, ns = _collision_table()
    h = v1 % ns
    v3 = v1 + 2 * FP_MOD * ns  # same fp+home, NOT in the table
    # fabricated device answers: candidate = first fp match = slot h
    slotp = np.array([h + 1, h + 1, h + 1], np.int64)
    values = np.array([v1, v2, v3], np.int64)
    found, slots = verify_candidates(table, slotp, values,
                                     max(8, table.max_probe))
    assert found.tolist() == [True, True, False]
    assert slots[0] == h and slots[1] == h + 1


def test_sharded_device_path_resolves_collision():
    """End-to-end through the mesh probe: the device really candidates
    v1's slot for v2/v3 (same fingerprint), and the host verification
    corrects it to the exact answer."""
    from kmergutsjava_tpu.parallel.mesh import make_mesh
    from kmergutsjava_tpu.parallel.sharded_lookup import (
        make_sharded_lookup, sharded_lookup_queries)

    table, v1, v2, ns = _collision_table()
    v3 = v1 + 2 * FP_MOD * ns
    mesh = make_mesh(4, 2)
    pw = max(8, table.max_probe)
    step, planes = make_sharded_lookup(mesh, table, pw)
    values = np.array([v1, v2, v3], np.int64)
    found, otu, avg, fi, wt = sharded_lookup_queries(
        mesh, step, planes, values, table, pad_multiple=8)
    assert found.tolist() == [True, True, False]
    ref = XlaLookup(table).lookup(values, np.zeros(3), np.arange(3))
    assert sorted(zip(ref.otu.tolist(), ref.wt.tolist())) == sorted(
        zip(otu[:2].tolist(), wt[:2].tolist()))
    assert (otu[0], fi[0]) == (1, 3) and (otu[1], fi[1]) == (2, 4)


def test_kmer_window_mods_matches_int64():
    """int32 modular residues == int64 pack + mod, for every window."""
    import jax.numpy as jnp

    from kmergutsjava_tpu.ops.kmerize import (MAX_MOD32, MOD32_LIMIT,
                                              kmer_window_mods,
                                              kmer_windows)

    rng = np.random.default_rng(7)
    offs = rng.integers(0, 22, (40, 60)).astype(np.uint8)
    ns = rng.integers(0, 55, 40)
    v64, ok64 = kmer_windows(jnp.asarray(offs), jnp.asarray(ns))
    # spans the no-reduction regime (<= MAX_MOD32) and the per-run
    # reduction regime above it, up to the hard cap
    for mods in [(65535,), (4999, 65535), (3335021, 65535), (MAX_MOD32,),
                 (MAX_MOD32 + 1,), (25_000_017, 65535), (60_000_011,),
                 (MOD32_LIMIT,)]:
        res, ok32 = kmer_window_mods(jnp.asarray(offs), jnp.asarray(ns),
                                     mods)
        assert np.array_equal(np.asarray(ok64), np.asarray(ok32))
        m = np.asarray(ok64)
        for r, mod in zip(res, mods):
            assert np.array_equal((np.asarray(v64) % mod)[m],
                                  np.asarray(r)[m]), mod
    with pytest.raises(ValueError):
        kmer_window_mods(jnp.asarray(offs), jnp.asarray(ns),
                         (MOD32_LIMIT + 1,))


def test_fused_step_int64_fallback(monkeypatch):
    """Tables beyond MAX_MOD32 route through the int64 prepare; answers
    are identical."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kmergutsjava_tpu.parallel import annotate_step
    from kmergutsjava_tpu.parallel.mesh import DATA_AXIS, make_mesh

    rng = np.random.default_rng(21)
    sig = random_signatures(rng, 1200)
    table = build_table(**sig)
    mesh = make_mesh(2, 4)
    pw = max(8, table.max_probe)
    aa = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)
    ascii_u8 = rng.choice(aa, size=(8, 64)).astype(np.uint8)
    # splice real signature 8-mers in so the hit path is exercised
    for row in range(8):
        v = int(sig["kmers"][rng.integers(len(sig["kmers"]))])
        digits = [(v // 20 ** (7 - i)) % 20 for i in range(8)]
        col = int(rng.integers(0, 64 - 16))
        ascii_u8[row, col: col + 8] = aa[digits]
    lengths = np.full(8, 64, np.int64)
    outs = {}
    for name, cap in (("i32", None), ("i64", 0)):
        if cap is not None:
            monkeypatch.setattr(annotate_step, "MOD32_LIMIT", cap)
        step, planes = annotate_step.make_sharded_annotate_step(
            mesh, table, pw)
        outs[name] = np.asarray(step(
            planes["fp"],
            jax.device_put(jnp.asarray(ascii_u8),
                           NamedSharding(mesh, P(DATA_AXIS, None))),
            jax.device_put(jnp.asarray(lengths),
                           NamedSharding(mesh, P(DATA_AXIS)))))
        monkeypatch.undo()
    assert np.array_equal(outs["i32"], outs["i64"])
    assert (outs["i32"] > 0).any()  # hit path exercised
