"""Native C++ dense-tile scatter (kmergutsjava_tpu/native/scatter.cpp) vs the numpy path.

The two scatters may assign channel ranks differently (encounter order vs
value order), so equality is asserted at the hits level — the contract both
must satisfy — plus direct structural invariants on the native outputs.
"""
import numpy as np
import pytest

from kmergutsjava_tpu.formats.kmer_table import build_table
from kmergutsjava_tpu.lookup.pallas_stream import (
    BLOCK, ROWS, PallasStreamLookup, StreamingStreamLookup)
from kmergutsjava_tpu.lookup.xla import FP_MOD
from kmergutsjava_tpu.utils.native import load_scatter
from test_lookup import canon, make_queries
from test_table import random_signatures

pytestmark = pytest.mark.skipif(load_scatter() is None,
                                reason="native scatter unavailable")


def force_numpy(lk: PallasStreamLookup) -> PallasStreamLookup:
    lk._scatter_dense = lambda *a, **kw: lk._scatter_dense_numpy(*a, **kw)
    lk._decode = lambda *a, **kw: lk._decode_numpy(*a, **kw)
    return lk


@pytest.mark.parametrize("seed,load,nq", [(0, 0.6, 4000), (1, 0.9, 8000)])
def test_native_vs_numpy_hits(seed, load, nq):
    rng = np.random.default_rng(seed)
    sig = random_signatures(rng, 3000)
    table = build_table(**sig, load_factor=load)
    values, cnt, pos = make_queries(rng, sig["kmers"], nq)
    values[::7] = values[0]  # heavy duplication
    a = force_numpy(PallasStreamLookup(table)).lookup(values, cnt, pos)
    b = PallasStreamLookup(table).lookup(values, cnt, pos)
    assert canon(a) == canon(b)
    assert a.kmers_found == b.kmers_found


def test_native_vs_numpy_channel_overflow():
    """Same home slot hammered past C channels: overflow split may differ
    between the two scatters but the merged hits must not."""
    rng = np.random.default_rng(5)
    sig = random_signatures(rng, 500)
    table = build_table(**sig)
    base = sig["kmers"][:6]
    values = np.concatenate([
        np.repeat(base, 40),
        base + np.int64(table.num_sigs),      # same homes, different values
        rng.integers(0, 10**9, 300, dtype=np.int64)])
    rng.shuffle(values)
    cnt = np.arange(len(values), dtype=np.int64) % 4
    pos = np.arange(len(values), dtype=np.int64)
    a = force_numpy(PallasStreamLookup(table)).lookup(values, cnt, pos)
    b = PallasStreamLookup(table).lookup(values, cnt, pos)
    assert canon(a) == canon(b)


@pytest.mark.parametrize("n_chunks", [1, 9])
def test_streaming_native_matches_numpy_oneshot(n_chunks):
    rng = np.random.default_rng(13)
    sig = random_signatures(rng, 2000)
    table = build_table(**sig, load_factor=0.8)
    values, cnt, pos = make_queries(rng, sig["kmers"], 9000)
    values[::5] = values[1]
    a = force_numpy(PallasStreamLookup(table)).lookup(values, cnt, pos)
    s = StreamingStreamLookup(PallasStreamLookup(table),
                              compute_kmers_found=True)
    for part in np.array_split(np.arange(len(values)), n_chunks):
        s.add_batch(values[part], cnt[part], pos[part])
    b = s.finish()
    assert canon(a) == canon(b)
    assert a.kmers_found == b.kmers_found


def test_native_scatter_invariants():
    """Structural checks on the raw native outputs: placed queries' flat
    index + shift decode back to their home slot and tile fingerprint;
    duplicates share a cell; per-home placements never exceed C."""
    rng = np.random.default_rng(17)
    sig = random_signatures(rng, 1500)
    table = build_table(**sig)
    lk = PallasStreamLookup(table)
    values, _, _ = make_queries(rng, sig["kmers"], 5000)
    values[::3] = values[2]
    tiles, homes, flat, shift = lk._scatter_dense_native(
        load_scatter(), values)
    assert np.array_equal(homes, values % np.int64(lk.num_sigs))
    ok = shift >= 0
    planes = lk.channels // 4
    fl, sh = flat[ok], shift[ok]
    within = fl % BLOCK
    row = (fl // BLOCK) % ROWS
    rest = fl // (BLOCK * ROWS)
    p = rest % planes
    sup = rest // planes
    rk = 4 * p + sh // 8
    blk = sup * ROWS + row
    assert np.array_equal(blk * BLOCK + within, homes[ok])
    got_fp = tiles[sup, rk, row, within]
    assert np.array_equal(got_fp, (values[ok] % FP_MOD).astype(np.uint16))
    # duplicates share one cell
    dup = ok & (values == values[2])
    assert dup.any()
    cells = set(zip(flat[dup].tolist(), shift[dup].tolist()))
    assert len(cells) == 1
    # distinct tile cells used per home never exceed C (values may share a
    # cell: equal values always do, fp-colliding values occasionally do)
    cells_per_home = {}
    for h, f, s_ in zip(homes[ok].tolist(), fl.tolist(), sh.tolist()):
        cells_per_home.setdefault(h, set()).add((f, s_))
    assert max(len(s) for s in cells_per_home.values()) <= lk.channels
