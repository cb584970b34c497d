"""Pallas TPU kernel: tile-join sparse probe (manual-DMA merge join).

The sparse-regime gather backends (lookup/xla.py rows1/chunked) are bound
by XLA's dynamic-gather issue rate, not by HBM bandwidth: the chunked scan
measured ~244M lookups/s on a 512MB plane (~8% of HBM) with the gather
itself the limiter (docs/performance.md, round-3 roofline). This kernel
replaces the per-query dynamic gather with the mechanism XLA cannot
express: *index-driven block DMA* plus an *exact MXU one-hot row extract*,
so the only "gather" is the Pallas pipeline's own HBM->VMEM block copy.

Design (the TPU-native analog of the reference's sorted merge-join,
/root/reference/lib/src/kmergutsjava/KmerGutsJava.java:944-1034, which
sorts queries by home slot and streams the table forward past them):

- the fingerprint plane uses the SAME overlapped rows1 geometry as
  lookup/xla.py (row r = slots [r*stride, r*stride+128), stride =
  128 - w), viewed as tiles of TILE_ROWS=128 consecutive rows — a probe
  window never leaves its row, hence never its tile;
- queries are binned by home TILE on the host (sorted merge-join order);
  the grid walks only the tiles that received queries, their ids scalar-
  prefetched so the plane BlockSpec's index_map DMAs exactly those 32KB
  tiles HBM->VMEM, double-buffered by the Pallas pipeline — sequential
  HBM traffic at DMA (not gather-issue) rates;
- inside VMEM the per-query row extract is a one-hot matmul on the MXU:
  win[q, lane] = onehot(rr_q)[q, :] @ tile[:, lane]. Mosaic cannot
  compile a wide dynamic VMEM gather ("multiple source vregs along the
  gather dimension", lookup/pallas_kernel.py), but the MXU contraction is
  exact here: the uint16 fingerprints split into hi/lo bytes, each <= 255
  and exactly representable in bfloat16, so two bf16 matmuls against a
  0/1 one-hot reconstruct the row bit-exactly in f32 (win = hi*256+lo
  <= 65535 < 2^24);
- the first-event reduction (earliest fingerprint CANDIDATE or EMPTY in
  the window) then runs on the VPU in the lane domain, exactly
  lookup/xla.py's ``_first_event`` contract: per query it emits
  (off, state) with state 1 = candidate at off (host verifies against
  the full k-mer values), 2 = empty first (definitive miss), 0 =
  unresolved (host exact pass).

HBM traffic per visited tile: 32KB of plane + ~9 bytes per query cell —
per query at metagenome densities (~hundreds of queries/tile) this is
~tens of bytes, an order of magnitude under the gather paths' 256.

The host side (binning, verification, exact fallback, compaction) is
shared with XlaLookup via the same (off, state) bins contract, so the
kernel plugs into dispatch_probe/resolve_probe and the streaming front
end unchanged; differential tests against lookup/parity.py pin the
semantics end-to-end.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

TILE_ROWS = 128   # plane rows per grid tile: [128, 128] u16 = 32KB DMA
LANES = 128


def _tilejoin_kernel(w: int, cap: int, ids_ref, plane_ref, qfp_ref, rr_ref,
                     off_ref, out_off_ref, out_state_ref):
    # plane tile [TILE_ROWS, 128] uint16 -> exact bf16 hi/lo split (both
    # <= 255, exactly representable; the MXU contraction against a 0/1
    # one-hot is then bit-exact in f32). Query bins arrive as [cap, 1]
    # int32 columns (the TPU block-shape rules bar a bare [1, cap] row,
    # and a column broadcasts against every [cap, 128] intermediate with
    # no relayout).
    tile = plane_ref[0].astype(jnp.int32)                 # [128, 128]
    hi = (tile >> 8).astype(jnp.bfloat16)
    lo = (tile & 0xFF).astype(jnp.bfloat16)
    rr = rr_ref[0]                                        # [cap, 1] int32
    # one-hot row selector [cap, TILE_ROWS] (0/1 in bf16)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, TILE_ROWS), 1)
    onehot = (row_ids == rr).astype(jnp.bfloat16)
    win = (jnp.dot(onehot, hi, preferred_element_type=jnp.float32) * 256.0
           + jnp.dot(onehot, lo, preferred_element_type=jnp.float32)
           ).astype(jnp.int32)                            # [cap, 128] exact
    # first-event scan in the lane domain (lookup/xla.py _first_event)
    qfp = qfp_ref[0]                                      # [cap, 1]
    off = off_ref[0]                                      # [cap, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (cap, LANES), 1)
    rel = lane - off
    in_w = (rel >= 0) & (rel < w)
    from .xla import FP_EMPTY

    big2 = jnp.int32(2 * w)
    key = jnp.where((win == qfp) & in_w, rel * 2,
                    jnp.where((win == jnp.int32(FP_EMPTY)) & in_w,
                              rel * 2 + 1, big2))
    fst = jnp.min(key, axis=-1, keepdims=True)            # [cap, 1]
    hit = fst < big2
    is_cand = hit & (jnp.bitwise_and(fst, jnp.int32(1)) == 0)
    out_off_ref[0] = jnp.where(
        is_cand, jax.lax.shift_right_logical(fst, jnp.int32(1)), 0)
    out_state_ref[0] = (is_cand.astype(jnp.int32)
                        + 2 * (hit & ~is_cand).astype(jnp.int32))


@functools.partial(jax.jit,
                   static_argnames=("w", "cap", "interpret"))
def tilejoin_probe(plane3, tile_ids, qfp_b, rr_b, off_b, w, cap,
                   interpret=False):
    """Grid over the used tiles: tile_ids[b] (scalar-prefetched) drives the
    plane BlockSpec's index_map, so the Pallas pipeline DMAs tile b's 32KB
    slice while tile b-1 computes. Returns (off, state) int32 arrays of
    shape [nblocks, cap] with the probe_fingerprint_pass contract."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nblocks = qfp_b.shape[0]
    col = pl.BlockSpec((1, cap, 1), lambda b, ids: (b, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, TILE_ROWS, LANES),
                         lambda b, ids: (ids[b], 0, 0)),
            col, col, col,
        ],
        out_specs=[col, col],
    )
    # pure int32/uint16/bf16 kernel: keep jnp helpers from minting i64
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_tilejoin_kernel, w, cap),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nblocks, cap, 1), jnp.int32),
                jax.ShapeDtypeStruct((nblocks, cap, 1), jnp.int32),
            ],
            interpret=interpret,
        )(tile_ids, plane3, qfp_b, rr_b, off_b)


def plane_tiles(fp2d: np.ndarray) -> np.ndarray:
    """View the overlapped rows1 plane [R, 128] as [T, 128, 128] tiles,
    padding the last tile's rows with FP_EMPTY."""
    from .xla import FP_EMPTY

    r = len(fp2d)
    t = -(-r // TILE_ROWS)
    if t * TILE_ROWS > r:
        fp2d = np.concatenate(
            [fp2d, np.full((t * TILE_ROWS - r, LANES), FP_EMPTY,
                           np.uint16)])
    return fp2d.reshape(t, TILE_ROWS, LANES)


def bin_queries_tiles(q_fp: np.ndarray, homes: np.ndarray, stride: int,
                      cap: int, pad_blocks_to: int = 1):
    """Host-side merge-join routing: group queries by home TILE into
    [nblocks, cap, 1] padded int32 column bins (the kernel's block-legal
    layout; cap must be a multiple of 8). Tiles are derived, not dense,
    so the block list is the sorted unique tile set. Returns (tile_ids
    int32, qfp_b, rr_b, off_b, block_of, rank_of); overflowed queries
    (rank >= cap) stay out of the bins and resolve via the exact host
    pass. nblocks is padded up to ``pad_blocks_to`` (repeating tile 0)
    so distinct batches share compiled executables."""
    assert cap % 8 == 0
    n = len(homes)
    r = (homes // stride).astype(np.int64)
    t = r >> 7                      # tile of TILE_ROWS=128 rows
    rr = (r & 127).astype(np.int32)
    off = (homes - r * stride).astype(np.int32)
    order = np.argsort(t, kind="stable")
    t_s = t[order]
    tile_ids, starts, counts = np.unique(t_s, return_index=True,
                                         return_counts=True)
    nuse = len(tile_ids)
    block_of_sorted = np.repeat(np.arange(nuse, dtype=np.int64), counts)
    rank_sorted = np.arange(n, dtype=np.int64) - starts[block_of_sorted]
    nblocks = max(nuse, 1)
    if pad_blocks_to > 1:
        nblocks = -(-nblocks // pad_blocks_to) * pad_blocks_to
    qfp_b = np.zeros((nblocks, cap, 1), np.int32)
    rr_b = np.zeros((nblocks, cap, 1), np.int32)
    off_b = np.zeros((nblocks, cap, 1), np.int32)
    ok = rank_sorted < cap
    bo, rk = block_of_sorted[ok], rank_sorted[ok]
    sel = order[ok]
    qfp_b[bo, rk, 0] = q_fp[sel]
    rr_b[bo, rk, 0] = rr[sel]
    off_b[bo, rk, 0] = off[sel]
    ids = np.zeros(nblocks, np.int32)
    ids[:nuse] = tile_ids.astype(np.int32)  # pad blocks re-read tile 0
    block_of = np.empty(n, np.int64)
    rank_of = np.empty(n, np.int64)
    block_of[order] = block_of_sorted
    rank_of[order] = rank_sorted
    return ids, qfp_b, rr_b, off_b, block_of, rank_of


_SUPPORTED: Optional[bool] = None


def tilejoin_supported(force: Optional[str] = None) -> bool:
    """Compile-and-correctness probe for the tile-join kernel, cached per
    (jax version, device kind) on disk like pallas_stream.stream16_supported
    — the kernel arms itself only where Mosaic compiles it AND the planted
    candidates come back right. KMER_TILEJOIN=0 never arms; =1 re-probes
    ignoring the disk cache; =force arms unconditionally. Non-TPU backends
    return False (the XLA gather is the right tool there; the kernel stays
    differentially tested in interpret mode by tests/test_tilejoin.py)."""
    global _SUPPORTED
    env = force if force is not None else os.environ.get("KMER_TILEJOIN")
    if env == "0":
        return False
    if env == "force":
        return True
    if _SUPPORTED is not None:
        return _SUPPORTED
    if jax.default_backend() != "tpu":
        _SUPPORTED = False
        return False
    import json

    cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                             "kmergutsjava_tpu")
    key = f"tilejoin/{jax.__version__}/{jax.devices()[0].device_kind}"
    cache_path = os.path.join(cache_dir, "kernel_probes.json")
    try:
        with open(cache_path) as fh:
            cached = json.load(fh)
        if key in cached and env != "1":
            _SUPPORTED = bool(cached[key])
            return _SUPPORTED
    except Exception:  # noqa: BLE001 — cache is best-effort
        cached = {}
    import threading

    result: dict = {}

    def probe() -> None:
        try:
            result["ok"] = _probe_correct(interpret=False)
        except Exception:  # noqa: BLE001 — compile crash = not supported
            result["ok"] = False

    # a broken toolchain may hang the compile; never disk-cache a timeout
    deadline = float(os.environ.get("KMER_TILEJOIN_PROBE_TIMEOUT", 240))
    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(deadline)
    ok = bool(result.get("ok", False))
    _SUPPORTED = ok
    if "ok" in result:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            cached[key] = ok
            tmp = cache_path + f".tmp{os.getpid()}"
            with open(tmp, "w") as fh:
                json.dump(cached, fh)
            os.replace(tmp, cache_path)
        except Exception:  # noqa: BLE001
            pass
    return ok


def _probe_correct(interpret: bool) -> bool:
    """Plant known candidates/empties across a 3-tile plane and check the
    kernel's (off, state) against the reference contract."""
    from .xla import FP_EMPTY

    w = 16
    stride = LANES - w
    rng = np.random.default_rng(7)
    plane = rng.integers(0, 60000, (3 * TILE_ROWS, LANES)).astype(np.uint16)
    plane[5, 20:] = FP_EMPTY          # empty run inside tile 0, row 5
    cap = 8
    # queries: (tile, rr, off) with planted outcomes
    qs = [
        (0, 5, 10, plane[5, 13], 3, 1),     # candidate at off 3 (< empty)
        (0, 5, 15, 1, 5, 2),                # empty first at rel 5 -> miss
        (2, 100, 50, plane[2 * TILE_ROWS + 100, 57], 7, 1),  # cand off 7
        (1, 64, 0, 1, 0, 0),                # occupied, no match: unresolved
    ]
    homes = np.array([((t * TILE_ROWS + rr_) * stride + o)
                      for t, rr_, o, _, _, _ in qs], np.int64)
    qfp = np.array([f for *_, f, _, _ in qs], np.uint16)
    # avoid accidental matches/empties for the unresolved case
    t3, rr3, o3 = qs[3][:3]
    row3 = plane[t3 * TILE_ROWS + rr3]
    row3[o3: o3 + w] = np.arange(100, 100 + w, dtype=np.uint16)
    ids, qfp_b, rr_b, off_b, bo, rk = bin_queries_tiles(
        qfp, homes, stride, cap)
    off_o, st_o = tilejoin_probe(
        plane_tiles(plane), jnp.asarray(ids), jnp.asarray(qfp_b),
        jnp.asarray(rr_b), jnp.asarray(off_b), w, cap,
        interpret=interpret)
    off_h = np.asarray(jax.device_get(off_o))[bo, rk, 0]
    st_h = np.asarray(jax.device_get(st_o))[bo, rk, 0]
    want_st = np.array([s for *_, s in qs])
    want_off = np.array([o if s == 1 else 0 for *_, o, s in qs])
    return (np.array_equal(st_h, want_st)
            and np.array_equal(off_h, want_off))
