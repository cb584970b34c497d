"""Pallas TPU kernel: block-streamed fingerprint probe (merge-join regime).

The XLA gather backend (lookup/xla.py) reads ~W*2 bytes per query from the
fingerprint plane at random. When the query stream is DENSE relative to the
table (N within an order of magnitude of numSigs — e.g. metagenome read
sweeps against a mid-size table), it is cheaper to stream the table exactly
once — the TPU analog of the reference's sequential table scan
(/root/reference/lib/src/kmergutsjava/KmerGutsJava.java:964-1026, which
streams the file forward and merges a sorted query stream into it):

- queries are sorted by home slot (the reference's spill-sort order,
  ref :1082-1094) and scattered into one fixed-capacity tile per table
  block of BLOCK slots;
- the grid walks table blocks; each step DMAs the block's fingerprint
  slice (plus a probe-window halo) into VMEM — sequential HBM traffic,
  double-buffered by the Pallas pipeline;
- the in-VMEM window gather is expressed with Mosaic's equal-shape gather:
  the fp slice is broadcast to [QCAP, 128] lanes and gathered with
  idx[q, lane] = local_home[q] + lane, so lane l holds window offset l of
  query q's probe (lanes >= W are masked);
- per query the kernel emits the offset of the first fingerprint candidate
  before the first empty slot, plus has-candidate/empty-seen state bits;
  full-value verification happens host-side (fingerprint collisions and
  fully-occupied windows fall back to the exact full-window path).

HBM traffic: numSigs*2 bytes for the whole table pass + ~8 bytes per padded
query slot — independent of the probe window.

STATUS: correct and differentially tested in interpret mode; the current
Mosaic release cannot compile the in-VMEM window gather ("Multiple source
vregs along gather dimension" — dynamic gathers are capped at one vreg of 8
sublanes along the gather dim), so on such TPUs the class transparently
delegates to the XLA backend, whose native gather we measured at HBM
roofline (~14-28B probes/s on multi-hundred-MB planes, >100B/s when the
fingerprint plane fits in VMEM). Revisit when Mosaic grows a wider gather.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.kmer_table import KmerTable
from .parity import LookupHits
from .xla import FP_EMPTY, FP_MOD, XlaLookup, _round_up_pow2

BLOCK = 2048
HALO = 128  # >= probe window; keeps fp slices 128-lane aligned
QCAP = BLOCK + HALO  # query tile rows (equal-shape gather requirement)
LANES = 128


def _probe_block_kernel(w: int, fp_ref, qfp_ref, lh_ref, off_ref, state_ref):
    # upcast to int32 in-VMEM: Mosaic's minor-dim insertion and gather are
    # 32-bit-lane ops (HBM traffic stays uint16 via the block spec)
    fpblock = fp_ref[0, 0, :].astype(jnp.int32)  # [BLOCK + HALO]
    # equal-shape gather: rows = query tile, columns = 128 lanes of which
    # the first `w` are the probe window offsets
    op = jnp.broadcast_to(fpblock[:, None], (QCAP, LANES))
    lane = jax.lax.broadcasted_iota(jnp.int32, (QCAP, LANES), 1)
    lh = lh_ref[0, 0, :]  # [QCAP] int32
    idx = jnp.minimum(lh[:, None] + lane, BLOCK + HALO - 1)
    win = jnp.take_along_axis(op, idx, axis=0)  # win[q, l] = fp[lh_q + l]
    in_window = lane < w
    qfp = qfp_ref[0, 0, :].astype(jnp.int32)[:, None]
    cand = (win == qfp) & in_window
    empty = (win == jnp.int32(FP_EMPTY)) & in_window
    # first-index reductions in pure int32 (Mosaic has no 64-bit lanes and
    # argmax would produce i64 under jax_enable_x64)
    big = jnp.int32(LANES)
    first_cand = jnp.min(jnp.where(cand, lane, big), axis=1)
    first_empty = jnp.min(jnp.where(empty, lane, big), axis=1)
    cand_any = first_cand < big
    empty_any = first_empty < big
    has_cand = cand_any & (~empty_any | (first_cand < first_empty))
    off_ref[0, 0, :] = jnp.where(cand_any, first_cand, 0)
    state_ref[0, 0, :] = (has_cand.astype(jnp.int32)
                          + 2 * empty_any.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("nblocks", "w", "interpret"))
def probe_blocks(fp_blocks, qfp_tiles, lh_tiles, nblocks, w, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = lambda width: pl.BlockSpec((1, 1, width), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    # the kernel is pure int32/uint16; disable_x64 keeps jnp helpers
    # (take_along_axis index promotion) from minting i64, which Mosaic
    # cannot lower
    with jax.enable_x64(False):
        return _probe_blocks_call(pl, pltpu, spec, fp_blocks, qfp_tiles,
                                  lh_tiles, nblocks, w, interpret)


def _probe_blocks_call(pl, pltpu, spec, fp_blocks, qfp_tiles, lh_tiles,
                       nblocks, w, interpret):
    return pl.pallas_call(
        functools.partial(_probe_block_kernel, w),
        grid=(nblocks,),
        in_specs=[spec(BLOCK + HALO), spec(QCAP), spec(QCAP)],
        out_specs=[spec(QCAP), spec(QCAP)],
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, 1, QCAP), jnp.int32),
            jax.ShapeDtypeStruct((nblocks, 1, QCAP), jnp.int32),
        ],
        interpret=interpret,
    )(fp_blocks, qfp_tiles, lh_tiles)


class PallasLookup:
    """Merge-join lookup: sorted query stream vs block-streamed table."""

    def __init__(self, table: KmerTable, probe_window: Optional[int] = None,
                 chunk: Optional[int] = None, device=None, interpret: Optional[bool] = None):
        if table.max_probe is None:
            table.compute_max_probe()
        self.table = table
        self.num_sigs = table.num_sigs
        self.w = min(max(8, _round_up_pow2(table.max_probe)), HALO)
        if table.max_probe > HALO:
            raise ValueError("max_probe exceeds kernel halo; rebuild table at "
                             "lower load factor or use the xla backend")
        # fallback path for fingerprint collisions / fully-occupied windows
        self._exact = XlaLookup(table, probe_window=probe_window, chunk=chunk,
                                device=device)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        # Current Mosaic releases cap dynamic gathers at one vreg (8
        # sublanes) along the gather dim ("Multiple source vregs along
        # gather dimension"), so the kernel cannot compile on TPU yet; the
        # XLA backend (whose native gather is roofline-class anyway) serves
        # compiled-TPU requests. Set KMER_PALLAS_FORCE=1 to attempt the
        # kernel anyway (e.g. on a newer Mosaic).
        import os

        self._delegate = (not interpret
                          and os.environ.get("KMER_PALLAS_FORCE") != "1")

        s = table.num_sigs
        self.nblocks = -(-s // BLOCK)
        fp = np.full(self.nblocks * BLOCK + HALO, FP_EMPTY, dtype=np.uint16)
        occ = table.occupied
        fp[:s][occ] = (table.slots["kmer"][occ] % FP_MOD).astype(np.uint16)
        strides = np.lib.stride_tricks.as_strided(
            fp, shape=(self.nblocks, BLOCK + HALO), strides=(BLOCK * 2, 2))
        self.fp_blocks = jax.device_put(
            jnp.asarray(np.ascontiguousarray(strides)[:, None, :]))

    def lookup(self, values: np.ndarray, cnt_id: np.ndarray, pos: np.ndarray,
               progress=None, compute_kmers_found: bool = True) -> LookupHits:
        if self._delegate:
            return self._exact.lookup(values, cnt_id, pos, progress=progress,
                                      compute_kmers_found=compute_kmers_found)
        values = np.asarray(values, dtype=np.int64)
        n = len(values)
        if n == 0:
            z = np.zeros(0)
            return LookupHits.from_lists(z, z, z, z, z, z, 0)
        homes = (values % np.int64(self.num_sigs)).astype(np.int64)
        order = np.argsort(homes, kind="stable")
        h_sorted = homes[order]
        blk = (h_sorted // BLOCK).astype(np.int64)
        rank = np.arange(n) - np.searchsorted(blk, blk)  # rank within block
        ok = rank < QCAP
        overflow_idx = order[~ok]

        qfp_tiles = np.full((self.nblocks, QCAP), FP_EMPTY, dtype=np.uint16)
        lh_tiles = np.zeros((self.nblocks, QCAP), dtype=np.int32)
        qfp_tiles[blk[ok], rank[ok]] = (values[order[ok]] % FP_MOD).astype(np.uint16)
        lh_tiles[blk[ok], rank[ok]] = (h_sorted[ok] - blk[ok] * BLOCK).astype(np.int32)

        off_t, state_t = jax.device_get(probe_blocks(
            self.fp_blocks, jnp.asarray(qfp_tiles[:, None, :]),
            jnp.asarray(lh_tiles[:, None, :]), self.nblocks, self.w,
            self.interpret))
        off_t = off_t[:, 0, :]
        state_t = state_t[:, 0, :]

        found = np.zeros(n, dtype=bool)
        slot_off = np.zeros(n, dtype=np.int64)
        sel = order[ok]
        st = state_t[blk[ok], rank[ok]]
        off = off_t[blk[ok], rank[ok]]
        has_cand = (st & 1) != 0
        empty_any = (st & 2) != 0
        # host-side verification of fingerprint candidates
        cand_slot = h_sorted[ok] + off
        verified = has_cand & (self.table.slots["kmer"][
            np.minimum(cand_slot, self.num_sigs - 1)] == values[sel])
        found[sel] = verified
        slot_off[sel] = off
        unresolved_sel = sel[(~verified & has_cand) | (~has_cand & ~empty_any)]
        todo = np.concatenate([unresolved_sel, overflow_idx]).astype(np.int64)

        hit_idx = np.zeros(0, dtype=np.int64)
        sub = None
        if len(todo):
            sub = self._exact.lookup(values[todo], np.arange(len(todo)),
                                     np.zeros(len(todo)),
                                     compute_kmers_found=False)
            hit_idx = todo[sub.cnt_id]
            found[hit_idx] = True

        mask = found
        slots = np.minimum(homes[mask] + slot_off[mask], self.num_sigs - 1)
        t = self.table.slots
        otu = t["otu"][slots].copy()
        avg = t["avg_from_end"][slots].copy()
        fi = t["fi"][slots].copy()
        wt = t["wt"][slots].copy()
        if len(hit_idx):
            # overwrite fallback hits (whose slot_off is unknown) with the
            # exact backend's metadata
            pos_in_mask = np.cumsum(mask) - 1
            otu[pos_in_mask[hit_idx]] = sub.otu
            avg[pos_in_mask[hit_idx]] = sub.avg_from_end
            fi[pos_in_mask[hit_idx]] = sub.fi
            wt[pos_in_mask[hit_idx]] = sub.wt
        if progress is not None:
            progress.update(n, int(mask.sum()))
        return LookupHits(
            cnt_id=np.asarray(cnt_id)[mask].astype(np.int64),
            pos=np.asarray(pos)[mask].astype(np.int64),
            otu=otu, avg_from_end=avg, fi=fi, wt=wt,
            kmers_found=(int(np.unique(values[mask]).size)
                         if compute_kmers_found else -1),
        )
