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
  128 - w), grouped into tiles of TILE_ROWS=128 consecutive rows — a
  probe window never leaves its row, hence never its tile. Tiles are
  stored TRANSPOSED in HBM ([offset-within-row, row], built once at
  table load), so the kernel's contraction needs no in-kernel transpose;
- queries are binned by home TILE on the host (sorted merge-join order)
  with (qfp, row, offset) PACKED into one int32 per query
  (qfp<<14 | rr<<7 | off) and shaped [nblocks, cap/128, 128] — exactly
  the TPU's native (8,128) tiling, zero layout padding (the first cut of
  this kernel shipped [cap, 1] columns and XLA's 128x trailing-dim pad
  made it HBM-bound on padding garbage at 126M cells/s);
- the grid walks only the tiles that received queries, their ids
  scalar-prefetched so the plane BlockSpec's index_map DMAs exactly
  those 32KB tiles HBM->VMEM, double-buffered by the Pallas pipeline —
  sequential HBM traffic at DMA (not gather-issue) rates;
- inside VMEM the per-query row extract is a one-hot matmul on the MXU:
  winT[off_lane, q] = tileT[off_lane, :] @ onehot(rr_q). Mosaic cannot
  compile a wide dynamic VMEM gather ("multiple source vregs along the
  gather dimension", lookup/pallas_kernel.py), but the MXU contraction
  is exact here: the uint16 fingerprints split into hi/lo bytes, each
  <= 255 and exactly representable in bfloat16, so two bf16 matmuls
  against a 0/1 one-hot reconstruct the row bit-exactly in f32
  (win = hi*256+lo <= 65535 < 2^24);
- the first-event reduction (earliest fingerprint CANDIDATE or EMPTY in
  the window, lookup/xla.py ``_first_event`` semantics) then runs on the
  VPU over the sublane (offset) axis and one packed int32 ``fst`` per
  query returns to the host: fst even < 2w = candidate at fst>>1 (host
  verifies against the full k-mer values), odd < 2w = empty first
  (definitive miss), 2w = unresolved (host exact pass).

HBM traffic per visited tile: 32KB of plane + 4 bytes per query cell in
+ 1 out (the first-event codes byte-pack four per int32 lane — worth
+2% on-chip and 4x less D2H for host-fed dispatches) — per query at
metagenome densities (~hundreds of queries per tile) that is tens of
bytes, an order of magnitude under the gather paths' 256.

The host side (binning, verification, exact fallback, compaction) is
shared with XlaLookup via the (off, state) dispatch/resolve contract, so
the kernel plugs into dispatch_probe/resolve_probe and the streaming
front end unchanged; differential tests against lookup/parity.py pin the
semantics end-to-end (tests/test_tilejoin.py), and a compile+correctness
self-probe gates arming per toolchain."""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

TILE_ROWS = 128   # plane rows per tile: [128, 128] u16 = 32KB; also the
#                   one-hot contraction length (MXU MACs per query =
#                   TILE_ROWS * LANES, which is why tiles stay 128 rows)
TILE_OFF2 = 64    # gather2 packed plane: two offsets per int32 sublane
LANES = 128
TPG = int(os.environ.get("KMER_TILEJOIN_TPG", "8"))
#                   tiles per grid step: amortizes the measured ~240ns
#                   per-step fixed cost (grid bookkeeping + DMA setup)
#                   without growing the per-query extract; the DMA unit
#                   becomes 256KB of consecutive plane. Sweep ladder at
#                   512MB/cap=512 (gather form): TPG 4/8/16 = 2.70/2.96/
#                   3.15B cells/s — 8 is the knee; 16 trades compile
#                   size and sparse-skip granularity for +6%
#                   (KMER_TILEJOIN_TPG overrides for sweeps).


def band_geometry(w: int, cap128: int):
    """Static band layout shared by the banded kernel form ("gather2b")
    and the host binners. A tile's query cells are partitioned into
    ``n_bands`` home-offset bands (band b owns offsets
    [b*bw, min((b+1)*bw, stride))), each owning ``gpb`` consecutive
    128-lane groups — so every group's probe windows live in a STATIC
    ~(bw+w)/2-sublane slice of the packed tile instead of all
    TILE_OFF2=64, which is what cuts the kernel's per-cell VPU
    gather+scan cost ~3x. n_bands is the largest power of two <= 8
    dividing cap128 (a power of two keeps 8/n_bands integral, so the
    n_bands*bw span always covers [0, stride) and the cap-selection
    histogram at 8-band granularity aggregates exactly).
    Returns (n_bands, gpb, bw)."""
    stride = LANES - w
    n_bands = 1
    while n_bands < 8 and cap128 % (n_bands * 2) == 0:
        n_bands *= 2
    bu = -(-stride // 8)
    bw = bu * (8 // n_bands)
    return n_bands, cap128 // n_bands, bw


BANDED_CAPS = (128, 256, 512, 1024, 2048, 3072, 4096)
#   the banded form's candidate cap ladder: cap128 = 1,2,4,8,16,24,32
#   all keep n_bands maximal for their size (1,2,4,8,8,8,8) — a 128-step
#   ladder would pass through caps like 896 (cap128=7) whose only legal
#   band count is 1, silently degrading the kernel to the full-tile scan


def banded_quantile_cap(counts8: np.ndarray, budget: float,
                        ceil_cap: int, w: int) -> int:
    """Smallest BANDED_CAPS entry whose per-(tile, band) overflow —
    queries past their band's cap/n_bands cell capacity, which the
    resolver routes to the exact host pass — stays under ``budget``
    queries (or the first entry >= ceil_cap). ``counts8`` is the
    [n_tiles, 8] histogram at 8-band granularity; coarser band counts
    aggregate exactly because every bw is a multiple of the 8-band unit
    (band_geometry)."""
    for cap in BANDED_CAPS:
        n_bands = band_geometry(w, cap // 128)[0]
        cn = counts8.reshape(len(counts8), n_bands, 8 // n_bands).sum(2)
        over = cn - cap // n_bands
        if float(over[over > 0].sum()) <= budget or cap >= ceil_cap:
            return cap
    return BANDED_CAPS[-1]


def _pack_out(out_ref, t: int, g4: int, cap128: int, fst: list) -> None:
    # pack four groups' first-event codes per int32 lane (each code
    # <= 2w <= 128 fits a byte): 4x less output HBM/D2H per cell —
    # group g lands in byte g%4 of packed row g//4 (host decode:
    # pallas_tilejoin.decode_fst via a uint8 view)
    for go in range(g4):
        acc = fst[4 * go]
        for b in range(1, 4):
            gi = 4 * go + b
            if gi < cap128:
                acc = acc | (fst[gi] << (8 * b))
        out_ref[0, t, go:go + 1, :] = acc


def _tilejoin_kernel(w: int, cap128: int, tpg: int, form: str, ids_ref,
                     planeT_ref, packed_ref, out_ref):
    # transposed plane tiles [tpg, off, row] uint16 (or [tpg, off/2, row]
    # int32 for "gather2"); three row-extract forms (see tilejoin_probe
    # docstring): "gather" (lane-axis take_along_axis — production where
    # Mosaic accepts it), "gather2" (same gather on an offset-PACKED
    # int32 plane: two fingerprints per lane halve the per-cell vreg
    # traffic of the extract+scan), and "mxu" (exact bf16 hi/lo one-hot
    # matmuls — guaranteed-compile fallback)
    from .xla import FP_EMPTY

    big2 = jnp.int32(2 * w)
    g4 = -(-cap128 // 4)
    if form in ("gather2", "gather2u", "gather2b"):
        # packed plane element (o2, r) = fp[2*o2, r] | fp[2*o2+1, r]<<16:
        # the extract gathers HALF the sublanes and skips the u16->i32
        # conversion; the first-event scan runs per half with the same
        # rel*2(+empty) code algebra (b_lo = 2*rel at the even offset).
        # "gather2u" folds the two-sided window test into ONE unsigned
        # compare (negative b bitcasts to a huge u32). "gather2b" adds
        # home-offset BANDING on top (band_geometry): group g's queries
        # all live in a static offset band, so its gather+scan touch only
        # the ~(bw+w)/2 sublanes that band's windows can reach instead of
        # all TILE_OFF2=64 — the host binner routes each query to its
        # band's groups (bin_queries_tiles n_bands).
        emp = jnp.int32(FP_EMPTY)
        ubig = jnp.uint32(2 * w)
        banded = form == "gather2b"
        if banded:
            stride = LANES - w
            n_bands, gpb, bw = band_geometry(w, cap128)

        def in_win(b):
            if form == "gather2":
                return (b >= 0) & (b < big2)
            return jax.lax.bitcast_convert_type(b, jnp.uint32) < ubig

        def slice_of(g):
            # static sublane window of group g's band (full tile unbanded)
            if not banded:
                return 0, TILE_OFF2
            b = g // gpb
            s_lo = (b * bw) // 2
            s_hi = (min((b + 1) * bw, stride) - 1 + w - 1) // 2
            return s_lo, min(s_hi, TILE_OFF2 - 1) - s_lo + 1

        for t in range(tpg):                # static unroll
            band_tiles = {}
            fst = []
            for g in range(cap128):         # static unroll
                s_lo, ns = slice_of(g)
                if (s_lo, ns) not in band_tiles:
                    band_tiles[(s_lo, ns)] = (
                        planeT_ref[t, s_lo:s_lo + ns],   # [ns, row] int32
                        jax.lax.broadcasted_iota(
                            jnp.int32, (ns, LANES), 0) * 4 + 4 * s_lo)
                tileP, o4 = band_tiles[(s_lo, ns)]
                p = packed_ref[0, t, g:g + 1, :]          # [1, 128] int32
                rr = (p >> 7) & 127
                off2 = (p & 127) * 2
                qfp = p >> 14
                idx = jnp.broadcast_to(rr, tileP.shape)
                win = jnp.take_along_axis(tileP, idx, axis=1)
                lo = win & 0xFFFF
                hi = jax.lax.shift_right_logical(win, 16)
                e_lo = lo == emp
                e_hi = hi == emp
                b_lo = o4 - off2            # = 2*rel at the even offset
                b_hi = b_lo + 2
                k_lo = jnp.where(((lo == qfp) | e_lo) & in_win(b_lo),
                                 b_lo + e_lo.astype(jnp.int32), big2)
                k_hi = jnp.where(((hi == qfp) | e_hi) & in_win(b_hi),
                                 b_hi + e_hi.astype(jnp.int32), big2)
                fst.append(jnp.min(jnp.minimum(k_lo, k_hi), axis=0,
                                   keepdims=True))
            _pack_out(out_ref, t, g4, cap128, fst)
        return
    # one iota serves both roles: row ids (vs rr, for the one-hot) and
    # window offsets (vs off, for rel) both live on the sublane axis
    o_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 0)
    r_ids = o_ids
    for t in range(tpg):                    # static unroll
        # NOTE: the plane block is (tpg, 128, 128) — tpg IS its leading
        # dim (the bins carry an extra leading 1 from their (1, ...) spec)
        tileT = planeT_ref[t].astype(jnp.int32)           # [off, row]
        if form == "mxu":
            # exact bf16 hi/lo split (both <= 255, exactly representable;
            # the MXU contraction against a 0/1 one-hot is bit-exact in
            # f32: win = hi*256+lo <= 65535 < 2^24)
            hiT = (tileT >> 8).astype(jnp.bfloat16)
            loT = (tileT & 0xFF).astype(jnp.bfloat16)
        fst = []
        for g in range(cap128):             # static unroll, cap128 <= ~8
            p = packed_ref[0, t, g:g + 1, :]              # [1, 128] int32
            rr = (p >> 7) & 127
            off = p & 127
            qfp = p >> 14                                 # [1, 128]
            if form == "gather":
                # lane-axis gather: the gather dim (rows, on lanes of the
                # transposed tile) spans ONE vreg of 128 lanes, which
                # this Mosaic accepts — unlike the sublane-axis gather
                # that blocks lookup/pallas_kernel.py. Measured +47%
                # over the MXU form at cap=512 (the MXU form is 60%
                # MXU-bound; this one rides the VPU).
                idx = jnp.broadcast_to(rr, (TILE_ROWS, LANES))
                winT = jnp.take_along_axis(tileT, idx, axis=1)
            else:
                # one-hot column selector [row, q] — rr lives on lanes,
                # rows on sublanes: no relayout anywhere
                onehot = (r_ids == rr).astype(jnp.bfloat16)   # [row, q]
                winT = (jnp.dot(hiT, onehot,
                                preferred_element_type=jnp.float32) * 256.0
                        + jnp.dot(loT, onehot,
                                  preferred_element_type=jnp.float32)
                        ).astype(jnp.int32)               # [off, q] exact
            rel = o_ids - off                             # [off, q]
            in_w = (rel >= 0) & (rel < w)
            key = jnp.where((winT == qfp) & in_w, rel * 2,
                            jnp.where((winT == jnp.int32(FP_EMPTY)) & in_w,
                                      rel * 2 + 1, big2))
            fst.append(jnp.min(key, axis=0, keepdims=True))
        _pack_out(out_ref, t, g4, cap128, fst)


@functools.partial(jax.jit,
                   static_argnames=("w", "cap128", "tpg", "form",
                                    "interpret"))
def tilejoin_probe(plane3T, tile_ids, packed_b, w, cap128, tpg=TPG,
                   form="gather", interpret=False):
    """Grid over the used SUPER-tiles (tpg consecutive plane tiles):
    tile_ids[b] (scalar-prefetched, in super-tile units) drives the plane
    BlockSpec's index_map, so the Pallas pipeline DMAs super-tile b's
    tpg*32KB slice while b-1 computes. Returns BYTE-PACKED first-event
    codes int32 [nblocks, tpg, ceil(cap128/4), 128]: group g's code for
    a lane lives in byte g%4 of packed row g//4 (each code <= 2w <= 128
    fits a byte; decode with ``unpack_fst``/``decode_fst``): even < 2w =
    candidate at code>>1, odd < 2w = empty-first miss, 2w =
    unresolved."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nblocks = packed_b.shape[0]
    g4 = -(-cap128 // 4)
    plane_rows = (TILE_OFF2 if form.startswith("gather2")
                  else TILE_ROWS)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((tpg, plane_rows, LANES),
                         lambda b, ids: (ids[b], 0, 0)),
            pl.BlockSpec((1, tpg, cap128, LANES),
                         lambda b, ids: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tpg, g4, LANES),
                               lambda b, ids: (b, 0, 0, 0)),
    )
    # pure int32/uint16/bf16 kernel: keep jnp helpers from minting i64
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_tilejoin_kernel, w, cap128, tpg, form),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nblocks, tpg, g4, LANES),
                                           jnp.int32),
            interpret=interpret,
        )(tile_ids, plane3T, packed_b)


def unpack_fst(out: np.ndarray, cap: int) -> np.ndarray:
    """Unpack the kernel's byte-packed output into per-cell first-event
    codes [nblocks, tpg*cap] (cell rank = sub_tile*cap + g*128 + lane;
    group g's byte sits at byte g%4 of packed row g//4)."""
    nblocks, tpg, g4, lanes = out.shape
    cap128 = cap // 128
    # little-endian int32 -> [nblocks, tpg, g4, lanes, 4] bytes
    b = np.ascontiguousarray(out).view(np.uint8).reshape(
        nblocks, tpg, g4, lanes, 4)
    # -> [nblocks, tpg, g4, 4, lanes] -> group-major rows
    codes = b.transpose(0, 1, 2, 4, 3).reshape(nblocks, tpg, g4 * 4, lanes)
    return codes[:, :, :cap128, :].reshape(nblocks, tpg * cap)


def plane_tiles(fp2d: np.ndarray, tpg: int = TPG,
                form: str = "gather") -> np.ndarray:
    """Group the overlapped rows1 plane [R, 128] into [T, 128, 128]
    TRANSPOSED tiles (tile[t][o, r] = fp2d[t*128 + r, o]), padding the
    tile count to a multiple of ``tpg`` with FP_EMPTY rows. One pass at
    table load; the kernel then contracts with no in-kernel transpose.
    For form "gather2" the offsets pack pairwise into int32 tiles
    [T, 64, 128] (element (o2, r) = fp[2*o2, r] | fp[2*o2+1, r] << 16),
    matching the kernel's packed extract."""
    from .xla import FP_EMPTY

    r = len(fp2d)
    t = -(-(-(-r // TILE_ROWS)) // tpg) * tpg
    if t * TILE_ROWS > r:
        fp2d = np.concatenate(
            [fp2d, np.full((t * TILE_ROWS - r, LANES), FP_EMPTY,
                           np.uint16)])
    tiles = np.ascontiguousarray(
        fp2d.reshape(t, TILE_ROWS, LANES).transpose(0, 2, 1))
    if form.startswith("gather2"):
        t32 = tiles.astype(np.uint32)
        return np.ascontiguousarray(
            t32[:, 0::2, :] | (t32[:, 1::2, :] << 16)).view(np.int32)
    return tiles


def pack_query(q_fp, rr, off):
    """qfp<<14 | rr<<7 | off, int32 (qfp < 2^16, rr < 128, off < 128)."""
    return ((q_fp.astype(np.int32) << 14) | (rr.astype(np.int32) << 7)
            | off.astype(np.int32))


def bin_queries_tiles(q_fp: np.ndarray, homes: np.ndarray, stride: int,
                      cap: int, pad_blocks_to: int = 1, tpg: int = TPG,
                      n_bands: int = 1):
    """Host-side merge-join routing: group queries by home SUPER-tile
    (``tpg`` consecutive plane tiles) into [nblocks, tpg, cap/128, 128]
    PACKED int32 bins (the kernel's layout-native shape; cap, the
    per-sub-tile capacity, must be a multiple of 128). Super-tiles are
    derived, not dense, so the block list is the sorted unique set.
    Returns (super_ids int32, packed_b, block_of, rank_of) where rank_of
    = sub_tile*cap + rank-within-sub-tile indexes the flattened
    [tpg*cap] cells of a block; overflowed queries (rank >= cap within
    their sub-tile) stay out of the bins and resolve via the exact host
    pass. nblocks is padded up to ``pad_blocks_to`` (repeating super-tile
    0) so distinct batches share compiled executables. Empty cells pack
    qfp=0 / rr=127 / off=127 — whatever they compute, the host only ever
    reads cells whose rank_of maps to a real query.

    ``n_bands`` > 1 (the banded kernel form "gather2b"): a tile's cap
    cells are partitioned by home-offset band (band_geometry) — band b
    owns the cap/n_bands cells starting at b*cap/n_bands, and a query
    overflows when its rank WITHIN ITS BAND reaches the band capacity
    (still resolved by the exact host pass)."""
    assert cap % 128 == 0
    n = len(homes)
    r = (homes // stride).astype(np.int64)
    t = r >> 7                      # tile of TILE_ROWS=128 rows
    sup = t // tpg                  # super-tile (DMA unit)
    sub = (t - sup * tpg).astype(np.int64)
    rr = (r & 127).astype(np.int32)
    off = (homes - r * stride).astype(np.int32)
    if n_bands > 1:
        nb_, _, bw = band_geometry(LANES - stride, cap // 128)
        assert nb_ == n_bands           # caller and geometry must agree
        bcap = cap // n_bands           # per-band cell capacity
        band = (off // bw).astype(np.int64)
        base = band * bcap              # band cell base within the tile
        key = t * n_bands + band
    else:
        bcap = cap
        base = np.int64(0)
        key = t
    order = np.argsort(key, kind="stable")  # rank within (tile[, band])
    k_s = key[order]
    _, starts, counts = np.unique(k_s, return_index=True,
                                  return_counts=True)
    key_block = np.repeat(np.arange(len(starts), dtype=np.int64), counts)
    rank_sorted = np.arange(n, dtype=np.int64) - starts[key_block]
    base_s = base[order] if n_bands > 1 else base
    sup_s = sup[order]
    super_ids = np.unique(sup_s)
    nuse = len(super_ids)
    block_of_sorted = np.searchsorted(super_ids, sup_s)
    nblocks = max(nuse, 1)
    if pad_blocks_to > 1:
        nblocks = -(-nblocks // pad_blocks_to) * pad_blocks_to
    packed_b = np.full((nblocks, tpg * cap), 0x3F80 | 127, np.int32)
    ok = rank_sorted < bcap
    bo = block_of_sorted[ok]
    cell = sub[order][ok] * cap + (base_s[ok] if n_bands > 1 else 0) \
        + rank_sorted[ok]
    sel = order[ok]
    packed_b[bo, cell] = pack_query(q_fp[sel], rr[sel], off[sel])
    ids = np.zeros(nblocks, np.int32)
    ids[:nuse] = super_ids.astype(np.int32)  # pad blocks re-read super 0
    block_of = np.empty(n, np.int64)
    rank_of = np.empty(n, np.int64)
    block_of[order] = block_of_sorted
    # overflowed queries get the out-of-range sentinel tpg*cap, so the
    # resolver's single `rank_of < tpg*cap` test routes them to the
    # exact host pass (a non-overflowed rank in a later sub-tile is
    # legitimately >= cap, so the per-sub-tile test can't be used there)
    rank_of[order] = np.where(rank_sorted < bcap,
                              sub[order] * cap + base_s + rank_sorted,
                              tpg * cap)
    return (ids, packed_b.reshape(nblocks, tpg, cap // 128, 128), block_of,
            rank_of)


def bin_queries_tiles_dense(q_fp: np.ndarray, homes: np.ndarray,
                            stride: int, cap: int, n_tiles: int,
                            tpg: int = TPG, n_bands: int = 1):
    """Dense-block binning: every super-tile gets a block, so ids are
    simply arange(n_tiles/tpg) and the bins shard evenly over a table
    mesh (parallel/tilejoin_shards.py). Prefers the threaded native
    binner; the numpy fallback expands the compressed binner's blocks
    into the dense layout (same packed cells, same ranks). ``n_bands``
    partitions each tile's cells by home-offset band for the banded
    kernel form (band_geometry semantics in both implementations)."""
    from ..utils.native import bin_tiles_dense_native

    res = bin_tiles_dense_native(homes.astype(np.int32, copy=False), q_fp,
                                 stride, tpg, n_tiles, cap,
                                 n_bands=n_bands)
    if res is not None:
        return res
    ids_u, pb, bo, rk = bin_queries_tiles(q_fp, homes, stride, cap,
                                          tpg=tpg, n_bands=n_bands)
    nsup = n_tiles // tpg
    dense = np.full((nsup,) + pb.shape[1:], 0x3F80 | 127, np.int32)
    dense[ids_u] = pb
    return (np.arange(nsup, dtype=np.int32), dense,
            ids_u[bo].astype(np.int64), rk)


def decode_fst(fst_flat: np.ndarray, w: int):
    """Unpack the kernel's first-event codes into the (off, state) bins
    contract: state 1 = candidate at off, 2 = empty-first miss, 0 =
    unresolved (exact host pass)."""
    hit = fst_flat < 2 * w
    is_cand = hit & ((fst_flat & 1) == 0)
    off = np.where(is_cand, fst_flat >> 1, 0).astype(np.uint8)
    state = (is_cand.astype(np.uint8)
             + 2 * (hit & ~is_cand).astype(np.uint8))
    return off, state


_FORM: Optional[str] = None  # "" = unsupported (cached)


def tilejoin_form(force: Optional[str] = None) -> Optional[str]:
    """Pick the best compiling-and-correct kernel form for this
    toolchain, cached per (jax version, device kind) on disk like
    pallas_stream.stream16_supported. Probes "gather" (lane-axis
    take_along_axis — +47% measured where Mosaic accepts it) then "mxu"
    (one-hot matmuls — no gather semantics at all); each must compile
    AND return the planted candidates right to arm. Returns the form
    name, or None when neither passes (callers fall back to the XLA
    gather ladder). KMER_TILEJOIN=0 never arms; =1 re-probes ignoring
    the disk cache; =gather/=mxu force that form unconditionally.
    Non-TPU backends return None (the XLA gather is the right tool
    there; both kernel forms stay differentially tested in interpret
    mode by tests/test_tilejoin.py)."""
    global _FORM
    env = force if force is not None else os.environ.get("KMER_TILEJOIN")
    if env == "0":
        return None
    if env in ("gather", "gather2", "gather2u", "gather2b", "mxu",
               "force"):
        return "gather" if env == "force" else env
    if _FORM is not None:
        return _FORM or None
    if jax.default_backend() != "tpu":
        _FORM = ""
        return None
    import json

    cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                             "kmergutsjava_tpu")
    key = f"tilejoin6/{jax.__version__}/{jax.devices()[0].device_kind}"
    cache_path = os.path.join(cache_dir, "kernel_probes.json")
    import time

    timeout_ttl = float(os.environ.get("KMER_TILEJOIN_TIMEOUT_TTL", 3600))
    try:
        with open(cache_path) as fh:
            cached = json.load(fh)
        if key in cached and env != "1":
            val = cached[key]
            if isinstance(val, str) and val.startswith("timeout@"):
                # a recent probe timed out: skip re-probing (each probe
                # costs up to KMER_TILEJOIN_PROBE_TIMEOUT and leaves a
                # compile thread running); stale markers re-probe
                if time.time() - float(val.split("@", 1)[1]) < timeout_ttl:
                    _FORM = ""
                    return None
            else:
                _FORM = val
                return _FORM or None
    except Exception:  # noqa: BLE001 — cache is best-effort
        cached = {}
    import threading

    result: dict = {}

    def probe() -> None:
        # preference order = measured speed on the toolchains that compile
        # each form at the production point (512MB plane, TPG=8; round-5
        # confirm sweeps, docs/performance.md): gather2b 9.6B cells/s at
        # its cap=1024 operating point (5.9B at cap=512) / gather2u 3.42B
        # / gather2 3.38B / gather 3.03B at cap=512; mxu is the
        # guaranteed-compile fallback
        for form in ("gather2b", "gather2u", "gather2", "gather", "mxu"):
            try:
                if _probe_correct(interpret=False, form=form):
                    result["form"] = form
                    return
            except Exception:  # noqa: BLE001 — compile crash: next form
                continue
        result["form"] = ""

    # a broken toolchain may hang the compile; never disk-cache a timeout
    deadline = float(os.environ.get("KMER_TILEJOIN_PROBE_TIMEOUT", 420))
    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(deadline)
    form = result.get("form")
    _FORM = form if form is not None else ""
    if form is None:
        # timed out: the daemon thread may still be running a TPU compile
        # on this backend — warn, and disk-cache a short-TTL marker so
        # subsequent processes don't re-pay the probe timeout
        import sys
        import time

        print(f"WARNING: tile-join kernel probe timed out after "
              f"{deadline:.0f}s; its compile thread may still be running "
              f"— falling back to the XLA gather ladder (cached "
              f"{timeout_ttl:.0f}s)", file=sys.stderr)
        form_to_cache = f"timeout@{time.time()}"
    else:
        form_to_cache = form
    try:
        os.makedirs(cache_dir, exist_ok=True)
        cached[key] = form_to_cache
        tmp = cache_path + f".tmp{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(cached, fh)
        os.replace(tmp, cache_path)
    except Exception:  # noqa: BLE001
        pass
    return _FORM or None


def tilejoin_supported(force: Optional[str] = None) -> bool:
    """True when some tile-join kernel form arms (see tilejoin_form)."""
    return tilejoin_form(force) is not None


def _probe_correct(interpret: bool, form: str = "gather") -> bool:
    """Plant known candidates/empties across a 3-tile plane and check the
    kernel's decoded (off, state) against the reference contract."""
    from .xla import FP_EMPTY

    w = 16
    stride = LANES - w
    rng = np.random.default_rng(7)
    plane = rng.integers(0, 60000, (3 * TILE_ROWS, LANES)).astype(np.uint16)
    plane[5, 20:] = FP_EMPTY          # empty run inside tile 0, row 5
    plane[2 * TILE_ROWS + 20, 105:] = FP_EMPTY  # empty run, band-3 range
    cap = 128
    # queries: (tile, rr, off) with planted outcomes. Offsets span EVERY
    # band of the banded form's cap=512 probe (bw=28: 10/15 band 0, 50
    # band 1, 70 band 2, 100 band 3) so the gate exercises all four
    # static sublane slices — including the non-8-aligned upper ones
    # (s_lo 28/42) a miscompiling Mosaic could get wrong while bands
    # 0-1 still pass.
    qs = [
        (0, 5, 10, plane[5, 13], 3, 1),     # candidate at off 3 (< empty)
        (0, 5, 15, 1, 5, 2),                # empty first at rel 5 -> miss
        (2, 100, 50, plane[2 * TILE_ROWS + 100, 57], 7, 1),  # cand off 7
        (1, 64, 0, 1, 0, 0),                # occupied, no match: unresolved
        (1, 10, 70, plane[TILE_ROWS + 10, 74], 4, 1),        # cand, band 2
        (2, 20, 100, 1, 5, 2),              # empty first at rel 5, band 3
    ]
    homes = np.array([((t * TILE_ROWS + rr_) * stride + o)
                      for t, rr_, o, _, _, _ in qs], np.int64)
    qfp = np.array([f for *_, f, _, _ in qs], np.uint16)
    # avoid accidental matches/empties for the unresolved case
    t3, rr3, o3 = qs[3][:3]
    row3 = plane[t3 * TILE_ROWS + rr3]
    row3[o3: o3 + w] = np.arange(100, 100 + w, dtype=np.uint16)
    # ... and accidental matches BEFORE the planted events of q4/q5
    plane[TILE_ROWS + 10, 70:74] = np.arange(200, 204, dtype=np.uint16)
    plane[2 * TILE_ROWS + 20, 100:105] = np.arange(300, 305,
                                                   dtype=np.uint16)
    if form == "gather2b":
        cap = 512            # cap128=4 -> 4 real bands to exercise
    nbands = band_geometry(w, cap // 128)[0] if form == "gather2b" else 1
    ids, packed_b, bo, rk = bin_queries_tiles(qfp, homes, stride, cap,
                                              n_bands=nbands)
    fst = tilejoin_probe(
        plane_tiles(plane, form=form), jnp.asarray(ids),
        jnp.asarray(packed_b), w, cap // 128, form=form,
        interpret=interpret)
    fst_h = unpack_fst(np.asarray(jax.device_get(fst)), cap)[bo, rk]
    off_h, st_h = decode_fst(fst_h, w)
    want_st = np.array([s for *_, s in qs])
    want_off = np.array([o if s == 1 else 0 for *_, o, s in qs])
    return (np.array_equal(st_h, want_st)
            and np.array_equal(off_h, want_off))
