"""Differential tests for the Pallas tile-join sparse probe
(lookup/pallas_tilejoin.py) against the parity oracle, in interpret mode
on CPU — the TPU compile/correctness probe (tilejoin_supported) plants the
same contract on real hardware."""
import numpy as np
import pytest

from kmergutsjava_tpu.constants import MAX_ENCODED
from kmergutsjava_tpu.formats.kmer_table import build_table
from kmergutsjava_tpu.lookup.parity import lookup_stream
from kmergutsjava_tpu.lookup.xla import XlaLookup


def _fixture(n_sigs=4000, seed=3, load_factor=0.6):
    rng = np.random.default_rng(seed)
    kmers = np.unique(rng.integers(0, MAX_ENCODED, size=int(n_sigs * 1.2),
                                   dtype=np.int64))[:n_sigs]
    return build_table(
        kmers,
        rng.integers(0, 100, len(kmers)).astype(np.int32),
        rng.integers(0, 500, len(kmers)).astype(np.int32),
        rng.integers(0, 50, len(kmers)).astype(np.int32),
        rng.random(len(kmers)).astype(np.float32),
        load_factor=load_factor,
    ), kmers


def _mixed_queries(kmers, n, seed=11):
    rng = np.random.default_rng(seed)
    hit = rng.choice(kmers, size=n // 2)
    miss = rng.integers(0, MAX_ENCODED, size=n - n // 2, dtype=np.int64)
    v = np.concatenate([hit, miss])
    rng.shuffle(v)
    return v


def _sorted_cols(hits):
    order = np.lexsort((hits.pos, hits.cnt_id))
    return [np.asarray(c)[order] for c in
            (hits.cnt_id, hits.pos, hits.otu, hits.avg_from_end,
             hits.fi, hits.wt)]


@pytest.mark.parametrize("form", ["gather", "gather2", "gather2u",
                                  "gather2b", "mxu"])
@pytest.mark.parametrize("load_factor", [0.5, 0.8])
def test_tilejoin_matches_parity(load_factor, form, monkeypatch):
    monkeypatch.setenv("KMER_TJ_FORM", form)
    table, kmers = _fixture(load_factor=load_factor)
    values = _mixed_queries(kmers, 3000)
    cnt = np.zeros(len(values), np.int64)
    pos = np.arange(len(values), dtype=np.int64)
    want = lookup_stream(table, values, cnt, pos)
    lk = XlaLookup(table, probe_impl="tilejoin")
    assert lk._tj_form == form
    got = lk.lookup(values, cnt, pos)
    assert len(got) == len(want)
    for a, b in zip(_sorted_cols(got), _sorted_cols(want)):
        np.testing.assert_array_equal(a, b)


def test_tilejoin_streaming_front_end():
    """The tile-join impl behind the chunked streaming front end
    (lookup/xla.py StreamingLookup) must agree with the one-shot path."""
    from kmergutsjava_tpu.lookup.xla import StreamingLookup

    table, kmers = _fixture(n_sigs=2500, seed=5)
    values = _mixed_queries(kmers, 4000, seed=6)
    lk = XlaLookup(table, probe_impl="tilejoin", chunk=1024)
    want = lk.lookup(values, np.zeros(len(values), np.int64),
                     np.arange(len(values), dtype=np.int64))
    st = StreamingLookup(lk, compute_kmers_found=True)
    for s in range(0, len(values), 700):
        e = min(s + 700, len(values))
        st.add_batch(values[s:e], 0, np.arange(s, e, dtype=np.int64))
    got = st.finish()
    assert len(got) == len(want)
    for a, b in zip(_sorted_cols(got), _sorted_cols(want)):
        np.testing.assert_array_equal(a, b)


def test_tilejoin_overflow_fallback():
    """Queries past a tile's bin capacity must resolve via the exact host
    pass — adversarial skew: thousands of queries homing to one tile
    (table big enough to span many tiles, so _tile_cap's hash-uniform
    sizing is far below the skewed load and ranks genuinely overflow)."""
    table, kmers = _fixture(n_sigs=200_000, seed=9)
    lk = XlaLookup(table, probe_impl="tilejoin")
    assert lk._occ_tiles > 4
    assert lk._tile_cap(4096) < 1500  # the skew below must overflow
    rng = np.random.default_rng(10)
    # every query lands in the first tile's slot range
    span = lk.stride * 128
    skew = rng.integers(0, min(span, table.num_sigs), size=2000,
                        dtype=np.int64)
    # half of them actual signatures from that range
    in_range = kmers[(kmers % table.num_sigs) < span]
    if len(in_range):
        skew[: len(in_range)] = in_range[:2000]
    cnt = np.zeros(len(skew), np.int64)
    pos = np.arange(len(skew), dtype=np.int64)
    want = lookup_stream(table, skew, cnt, pos)
    got = lk.lookup(skew, cnt, pos)
    assert len(got) == len(want)
    for a, b in zip(_sorted_cols(got), _sorted_cols(want)):
        np.testing.assert_array_equal(a, b)


def test_bin_queries_tiles_roundtrip():
    from kmergutsjava_tpu.lookup.pallas_tilejoin import (TPG,
                                                         bin_queries_tiles)

    rng = np.random.default_rng(2)
    stride = 112
    homes = rng.integers(0, stride * 128 * 4 * TPG, size=500).astype(
        np.int64)
    qfp = rng.integers(0, 65535, size=500).astype(np.uint16)
    cap = 512
    ids, packed_b, bo, rk = bin_queries_tiles(
        qfp, homes, stride, cap=cap, pad_blocks_to=4)
    assert len(ids) % 4 == 0
    assert packed_b.shape[1:] == (TPG, cap // 128, 128)
    ok = rk < TPG * cap  # no overflow sentinel expected at this load
    assert ok.all()
    # every query's packed cell carries its fingerprint and reconstructs
    # its home slot exactly (rank encodes sub-tile * cap + within-rank)
    p = packed_b.reshape(len(ids), TPG * cap)[bo, rk]
    r = (ids[bo] * TPG + rk // cap) * 128 + ((p >> 7) & 127)
    np.testing.assert_array_equal(p >> 14, qfp.astype(np.int32))
    np.testing.assert_array_equal(r * stride + (p & 127), homes)


def test_native_dense_binner_matches_numpy():
    """scatter.cpp bin_tiles_dense vs the numpy compressed binner: the
    packed cell contents and per-query ranks must agree tile-by-tile
    (block numbering differs — dense covers every super-tile — so the
    comparison maps numpy's compressed blocks onto the dense ids)."""
    from kmergutsjava_tpu.lookup.pallas_tilejoin import (TPG,
                                                        bin_queries_tiles)
    from kmergutsjava_tpu.utils.native import bin_tiles_dense_native

    rng = np.random.default_rng(4)
    stride = 112
    n_tiles = 8 * TPG
    homes = rng.integers(0, stride * 128 * n_tiles, size=4000).astype(
        np.int64)
    qfp = rng.integers(0, 65535, size=4000).astype(np.uint16)
    cap = 256
    res = bin_tiles_dense_native(homes.astype(np.int32), qfp, stride, TPG,
                                 n_tiles, cap)
    if res is None:
        pytest.skip("native scatter toolchain unavailable")
    ids_n, pb_n, bo_n, rk_n = res
    ids_p, pb_p, bo_p, rk_p = bin_queries_tiles(qfp, homes, stride, cap)
    # every query resolves to the same packed word and in-block cell
    flat_n = pb_n.reshape(len(ids_n), TPG * cap)
    flat_p = pb_p.reshape(len(ids_p), TPG * cap)
    ok = rk_p < TPG * cap
    np.testing.assert_array_equal(rk_n, rk_p)  # incl. overflow sentinels
    np.testing.assert_array_equal(ids_n[bo_n[ok]], ids_p[bo_p[ok]])
    np.testing.assert_array_equal(flat_n[bo_n[ok], rk_n[ok]],
                                  flat_p[bo_p[ok], rk_p[ok]])


def test_tilejoin_dense_native_path_end_to_end():
    """XlaLookup tilejoin with the dense native binner engaged (n >=
    2*n_tiles) must byte-match the parity oracle."""
    table, kmers = _fixture(n_sigs=30_000, seed=12)
    lk = XlaLookup(table, probe_impl="tilejoin")
    n = max(4 * lk.n_tiles, 4000)
    values = _mixed_queries(kmers, n, seed=13)
    cnt = np.zeros(len(values), np.int64)
    pos = np.arange(len(values), dtype=np.int64)
    want = lookup_stream(table, values, cnt, pos)
    got = lk.lookup(values, cnt, pos)
    assert len(got) == len(want)
    for a, b in zip(_sorted_cols(got), _sorted_cols(want)):
        np.testing.assert_array_equal(a, b)


def test_auto_crossover_picks_tilejoin_when_armed(monkeypatch):
    """The auto ladder flips HBM-large planes to the tile-join kernel
    exactly when the toolchain probe arms it (threshold lowered via
    KMER_CHUNKED_MIN_BYTES so the test table qualifies)."""
    from kmergutsjava_tpu.lookup import pallas_tilejoin as tj

    table, kmers = _fixture(n_sigs=200_000, seed=15)
    monkeypatch.setenv("KMER_TILEJOIN_MIN_BYTES", "100000")
    monkeypatch.setattr(tj, "tilejoin_supported", lambda *a, **k: True)
    lk = XlaLookup(table)
    assert lk.probe_impl == "tilejoin"
    # same plane size with the probe disarmed: the chunked/rows1 ladder
    monkeypatch.setattr(tj, "tilejoin_supported", lambda *a, **k: False)
    lk2 = XlaLookup(table)
    assert lk2.probe_impl in ("chunked", "rows1")
    # and the armed path still answers exactly
    values = _mixed_queries(kmers, 2500, seed=16)
    cnt = np.zeros(len(values), np.int64)
    pos = np.arange(len(values), dtype=np.int64)
    want = lookup_stream(table, values, cnt, pos)
    got = lk.lookup(values, cnt, pos)
    assert len(got) == len(want)
    for a, b in zip(_sorted_cols(got), _sorted_cols(want)):
        np.testing.assert_array_equal(a, b)


def test_probe_correct_all_forms_interpret():
    """The planted-candidate self-probe must pass for every kernel form
    in interpret mode (the TPU probe runs the same contract compiled)."""
    from kmergutsjava_tpu.lookup.pallas_tilejoin import _probe_correct

    for form in ("gather", "gather2", "gather2u", "gather2b", "mxu"):
        assert _probe_correct(interpret=True, form=form), form


def test_select_tile_cap_quantile(monkeypatch):
    """Round-5 adaptive cap: picks the smallest 128-multiple within the
    overflow budget, honors env overrides, and is sticky-monotone."""
    table, _ = _fixture(n_sigs=200_000, seed=17)
    lk = XlaLookup(table, probe_impl="tilejoin")
    tiles = lk._occ_tiles
    rng = np.random.default_rng(18)
    n = 40 * tiles  # mean 40/tile: Poisson max ~ 70 << 128
    homes = rng.integers(0, table.num_sigs, size=n).astype(np.int32)
    cap = lk._select_tile_cap(homes, n, n)
    assert cap == 128  # far below the legacy mean+8sigma sizing
    assert lk._tile_cap(n) >= 256
    # budget respected: overflow at the chosen cap <= 1% of n
    counts = np.bincount((homes.astype(np.int64) // lk.stride) >> 7,
                         minlength=tiles)
    big = counts[counts > cap]
    assert big.size == 0 or (big - cap).sum() <= 0.01 * n
    # sticky: a later sparser batch reuses the compiled cap
    small = homes[: n // 8]
    assert lk._select_tile_cap(small, len(small), len(small)) == cap
    # env overrides
    monkeypatch.setenv("KMER_TILEJOIN_CAP", "300")
    assert lk._select_tile_cap(homes, n, n) == 384  # rounded to 128
    monkeypatch.delenv("KMER_TILEJOIN_CAP")
    monkeypatch.setenv("KMER_TILEJOIN_CAP_MODE", "legacy")
    assert lk._select_tile_cap(homes, n, n) == lk._tile_cap(n)


def test_tilejoin_adaptive_cap_overflow_end_to_end():
    """With the quantile cap, a small overflow tail is EXPECTED (not just
    adversarial): results must stay byte-identical to parity through the
    exact host pass."""
    table, kmers = _fixture(n_sigs=150_000, seed=19)
    lk = XlaLookup(table, probe_impl="tilejoin")
    # enough queries that some tiles exceed the quantile cap
    n = 140 * lk._occ_tiles
    values = _mixed_queries(kmers, n, seed=20)
    cnt = np.zeros(len(values), np.int64)
    pos = np.arange(len(values), dtype=np.int64)
    want = lookup_stream(table, values, cnt, pos)
    got = lk.lookup(values, cnt, pos)
    assert len(got) == len(want)
    for a, b in zip(_sorted_cols(got), _sorted_cols(want)):
        np.testing.assert_array_equal(a, b)


def test_tilejoin_form_timeout_cache(monkeypatch, tmp_path):
    """Advisor r4: a recent probe timeout is disk-cached with a TTL so
    new processes skip the probe; a stale marker re-probes."""
    import importlib
    import json
    import time

    import jax

    from kmergutsjava_tpu.lookup import pallas_tilejoin as tj

    monkeypatch.setattr(tj.jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.delenv("KMER_TILEJOIN", raising=False)
    cache_dir = tmp_path / ".cache" / "kmergutsjava_tpu"
    cache_dir.mkdir(parents=True)
    key = f"tilejoin6/{jax.__version__}/{jax.devices()[0].device_kind}"
    path = cache_dir / "kernel_probes.json"

    probes = {"n": 0}
    monkeypatch.setattr(
        tj, "_probe_correct",
        lambda interpret, form="gather": probes.__setitem__(
            "n", probes["n"] + 1) or True)

    # fresh timeout marker: no probe, form disarmed
    path.write_text(json.dumps({key: f"timeout@{time.time()}"}))
    tj._FORM = None
    assert tj.tilejoin_form() is None
    assert probes["n"] == 0
    # stale marker: re-probe and arm the first (fastest) form
    path.write_text(json.dumps({key: "timeout@100.0"}))
    tj._FORM = None
    assert tj.tilejoin_form() == "gather2b"
    assert probes["n"] == 1
    assert json.loads(path.read_text())[key] == "gather2b"
    tj._FORM = None  # leave module state clean for other tests


def test_tilejoin_zipf_skew_matches_parity():
    """Zipf-skewed homes: many tiles overflow their quantile cap by
    varying amounts (not just one adversarial tile) — the mixed
    device/host-exact resolution must still match parity exactly."""
    table, kmers = _fixture(n_sigs=120_000, seed=23)
    lk = XlaLookup(table, probe_impl="tilejoin")
    rng = np.random.default_rng(24)
    n = 60_000
    # zipf rank sampling concentrated on a few slot neighborhoods
    ranks = rng.zipf(1.3, size=n).astype(np.int64)
    anchors = rng.integers(0, table.num_sigs, 64)
    values = np.where(
        rng.random(n) < 0.4,
        rng.choice(kmers, n),                       # real signatures
        (anchors[ranks % 64] + ranks) % np.int64(MAX_ENCODED))
    cnt = np.zeros(n, np.int64)
    pos = np.arange(n, dtype=np.int64)
    want = lookup_stream(table, values, cnt, pos)
    got = lk.lookup(values, cnt, pos)
    assert len(got) == len(want)
    for a, b in zip(_sorted_cols(got), _sorted_cols(want)):
        np.testing.assert_array_equal(a, b)
    # and through the streaming front end with several chunk sizes
    from kmergutsjava_tpu.lookup.xla import StreamingLookup

    st = StreamingLookup(XlaLookup(table, probe_impl="tilejoin",
                                   chunk=7000))
    st.add_batch(values, 0, pos)
    got2 = st.finish()
    want2 = lookup_stream(table, values, np.zeros(n, np.int64), pos)
    assert len(got2) == len(want2)

def test_banded_binner_native_matches_numpy():
    """scatter.cpp bin_tiles_dense with n_bands > 1 (the gather2b form's
    band-partitioned cells) vs the numpy twin: packed cells, block ids
    and ranks (incl. per-BAND overflow sentinels) must agree exactly."""
    from kmergutsjava_tpu.lookup.pallas_tilejoin import (TPG,
                                                         band_geometry,
                                                         bin_queries_tiles)
    from kmergutsjava_tpu.utils.native import bin_tiles_dense_native

    rng = np.random.default_rng(31)
    stride, n_tiles, cap = 112, 4 * TPG, 512
    nbands = band_geometry(16, cap // 128)[0]
    assert nbands == 4
    # skewed homes so some (tile, band) bins genuinely overflow
    n = 3 * n_tiles * cap // 2
    homes = (rng.integers(0, n_tiles * stride * 128, size=n)
             * rng.choice([0, 1], size=n, p=[0.3, 0.7])).astype(np.int64)
    qfp = rng.integers(0, 65535, size=n).astype(np.uint16)
    res = bin_tiles_dense_native(homes.astype(np.int32), qfp, stride, TPG,
                                 n_tiles, cap, n_bands=nbands)
    if res is None:
        pytest.skip("native scatter toolchain unavailable")
    ids_n, pb_n, bo_n, rk_n = res
    ids_p, pb_p, bo_p, rk_p = bin_queries_tiles(qfp, homes, stride, cap,
                                                n_bands=nbands)
    assert (rk_p >= TPG * cap).any()  # the skew really overflowed bands
    np.testing.assert_array_equal(rk_n, rk_p)
    ok = rk_p < TPG * cap
    np.testing.assert_array_equal(ids_n[bo_n[ok]], ids_p[bo_p[ok]])
    flat_n = pb_n.reshape(len(ids_n), TPG * cap)
    flat_p = pb_p.reshape(len(ids_p), TPG * cap)
    np.testing.assert_array_equal(flat_n[bo_n[ok], rk_n[ok]],
                                  flat_p[bo_p[ok], rk_p[ok]])
    # every in-bin query sits inside its band's cell range
    band_of_cell = ((rk_p[ok] % cap) * nbands) // cap
    r = homes[ok] // stride
    off = homes[ok] - r * stride
    bw = band_geometry(16, cap // 128)[2]
    np.testing.assert_array_equal(band_of_cell, off // bw)


def test_banded_quantile_cap_ladder():
    """banded_quantile_cap walks the banded ladder (no cap128 without a
    real band split) and sizes against per-BAND overflow, which exceeds
    the per-tile overflow at the same cap."""
    from kmergutsjava_tpu.lookup.pallas_tilejoin import (BANDED_CAPS,
                                                         banded_quantile_cap)

    rng = np.random.default_rng(33)
    tiles = 256
    # uniform ~900/tile (the production banded chunk density): per-band
    # mean ~112.5 of 128 -> cap 1024 fits the 1% budget with margin
    counts8 = rng.poisson(900 / 8, size=(tiles, 8))
    n = counts8.sum()
    cap = banded_quantile_cap(counts8, 0.01 * n, 4096, 16)
    assert cap == 1024
    over = (counts8.reshape(tiles, 8, 1).sum(2) - 128)
    assert over[over > 0].sum() <= 0.01 * n
    # ~1250/tile: per-band mean ~156 > 128 -> the ladder must jump to
    # 2048 (bcap 256), NOT to an unbandable 1152/1280
    counts8b = rng.poisson(1250 / 8, size=(tiles, 8))
    capb = banded_quantile_cap(counts8b, 0.01 * counts8b.sum(), 4096, 16)
    assert capb == 2048 and capb in BANDED_CAPS
    # ceiling respected
    assert banded_quantile_cap(counts8b, 0.0, 256, 16) == 256


def test_tilejoin_banded_overflow_end_to_end(monkeypatch):
    """gather2b under band-overflow load (per-band capacity is 1/n_bands
    of the tile cap, so bands overflow before tiles do): the mixed
    device/host-exact resolution must match parity exactly."""
    monkeypatch.setenv("KMER_TJ_FORM", "gather2b")
    table, kmers = _fixture(n_sigs=150_000, seed=35)
    lk = XlaLookup(table, probe_impl="tilejoin")
    assert lk._tj_form == "gather2b"
    rng = np.random.default_rng(36)
    n = 140 * lk._occ_tiles
    values = _mixed_queries(kmers, n, seed=36)
    # concentrate a slice of queries into one band of one tile
    span = min(lk.stride * 14, table.num_sigs)  # ~ band 0 of tile 0
    values[: n // 10] = rng.integers(0, span, size=n // 10, dtype=np.int64)
    cnt = np.zeros(n, np.int64)
    pos = np.arange(n, dtype=np.int64)
    want = lookup_stream(table, values, cnt, pos)
    got = lk.lookup(values, cnt, pos)
    assert len(got) == len(want)
    for a, b in zip(_sorted_cols(got), _sorted_cols(want)):
        np.testing.assert_array_equal(a, b)
