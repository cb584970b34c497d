"""Vectorized probe-window lookup (jitted XLA; runs on TPU and CPU).

TPU-native reformulation of the reference's streaming merge-join (lookup,
/root/reference/lib/src/kmergutsjava/KmerGutsJava.java:944-1034). Instead of
a sequential scan with an in-flight probe set, every query probes a window of
consecutive slots in parallel, two-pass:

- pass 1 (all queries, short window W1) against a 2-byte **fingerprint
  plane** (4x less bandwidth than the int64 k-mer plane): a fingerprint
  match before the first empty slot nominates a candidate slot, verified by
  a single full-value gather; an empty slot before any candidate is a
  definitive miss (a true match implies a fingerprint match). Empty slots
  own a reserved fingerprint, so the empty rule is exact (ref :1000-1001).
- pass 2 (unresolved only: fully-occupied windows or the ~W/2^16
  fingerprint collisions): full window P2 >= table max_probe; presence
  implies the value lies within max_probe slots of its home (first-free-slot
  insertion keeps every slot between home and placement occupied forever),
  so "any match in the window" is exact — no empty-slot logic needed.

The device returns only (found, resolved, window_offset:uint8) — hit
metadata (otu/avgFromEnd/fI/wt) is gathered host-side from the table's
host arrays, minimizing device->host transfer and HBM footprint (only the
fingerprint and k-mer planes live on device).

Equivalence to the reference for linear-probe-built tables follows from the
same occupancy invariant; differential tests against lookup/parity.py pin
it down.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EMPTY_KMER, MAX_ENCODED
from ..formats.kmer_table import KmerTable
from .parity import LookupHits

FIRST_PASS_WINDOW = 16

# uint16 fingerprint plane: fp(value) = value % FP_MOD in [0, FP_MOD);
# FP_EMPTY is reserved for empty slots.
FP_MOD = 65535
FP_EMPTY = 65535


def _round_up_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


@partial(jax.jit, static_argnames=("probe_window",))
def probe_fingerprint_pass(
    tbl_fp: jax.Array,  # [S + P] uint16 fingerprint plane
    tbl_kmer: jax.Array,  # [S + P] int64 (single-slot verification gather)
    values: jax.Array,  # [N] int64
    homes: jax.Array,  # [N] int32
    probe_window: int,
):
    """Returns (found, resolved, off_u8). off is the window offset of the
    verified hit slot (0 where not found)."""
    q_fp = (values % FP_MOD).astype(jnp.uint16)
    idx = homes[:, None].astype(jnp.int32) + jnp.arange(probe_window, dtype=jnp.int32)
    fp = tbl_fp[idx]  # [N, W] uint16 gather — the only wide memory touch
    cand = fp == q_fp[:, None]
    empty = fp == jnp.uint16(FP_EMPTY)
    cand_any = jnp.any(cand, axis=-1)
    empty_any = jnp.any(empty, axis=-1)
    first_cand = jnp.argmax(cand, axis=-1).astype(jnp.int32)
    first_empty = jnp.argmax(empty, axis=-1).astype(jnp.int32)
    has_cand = cand_any & (~empty_any | (first_cand < first_empty))
    slot = jnp.where(has_cand, homes + first_cand, 0)
    verified = has_cand & (tbl_kmer[slot] == values)
    resolved = verified | (~has_cand & empty_any)
    off = jnp.where(verified, first_cand, 0).astype(jnp.uint8)
    return verified, resolved, off


@partial(jax.jit, static_argnames=("probe_window",))
def probe_first_pass(
    tbl_kmer: jax.Array,  # [S + P] int64, padded with EMPTY_KMER
    values: jax.Array,
    homes: jax.Array,
    probe_window: int,
):
    """Exact short-window probe on the int64 plane with empty-slot
    resolution. Returns (found, resolved, off_u8)."""
    idx = homes[:, None].astype(jnp.int32) + jnp.arange(probe_window, dtype=jnp.int32)
    tk = tbl_kmer[idx]
    match = tk == values[:, None]
    empty = tk > MAX_ENCODED
    match_any = jnp.any(match, axis=-1)
    empty_any = jnp.any(empty, axis=-1)
    first_match = jnp.argmax(match, axis=-1).astype(jnp.int32)
    first_empty = jnp.argmax(empty, axis=-1).astype(jnp.int32)
    found = match_any & (~empty_any | (first_match < first_empty))
    resolved = found | empty_any
    off = jnp.where(found, first_match, 0).astype(jnp.uint8)
    return found, resolved, off


@partial(jax.jit, static_argnames=("probe_window",))
def probe_full_window(
    tbl_kmer: jax.Array,
    values: jax.Array,
    homes: jax.Array,
    probe_window: int,
):
    """Full-window exact probe: any match within probe_window >= max_probe.
    Returns (found, off_u8)."""
    idx = homes[:, None].astype(jnp.int32) + jnp.arange(probe_window, dtype=jnp.int32)
    match = tbl_kmer[idx] == values[:, None]
    found = jnp.any(match, axis=-1)
    off = jnp.where(found, jnp.argmax(match, axis=-1), 0).astype(jnp.uint8)
    return found, off


class XlaLookup:
    """Stateful wrapper owning the device-resident probe planes."""

    def __init__(self, table: KmerTable, probe_window: Optional[int] = None,
                 chunk: int = 1 << 19, device=None,
                 first_pass_window: int = FIRST_PASS_WINDOW,
                 use_fingerprint: bool = True):
        if table.max_probe is None:
            table.compute_max_probe()
        self.table = table
        self.num_sigs = table.num_sigs
        self.full_window = probe_window or max(8, _round_up_pow2(table.max_probe))
        if self.full_window > 256:
            raise ValueError("probe window > 256 unsupported (uint8 offsets); "
                             "rebuild the table at a lower load factor")
        self.w1 = min(first_pass_window, self.full_window)
        self.use_fingerprint = use_fingerprint
        p = max(self.full_window, self.w1)
        s = table.num_sigs
        kmer = np.full(s + p, EMPTY_KMER, dtype=np.int64)
        kmer[:s] = table.slots["kmer"]
        put = partial(jax.device_put, device=device)
        self.tbl_kmer = put(kmer)
        fp = np.full(s + p, FP_EMPTY, dtype=np.uint16)
        occ = table.occupied
        fp[:s][occ] = (table.slots["kmer"][occ] % FP_MOD).astype(np.uint16)
        self.tbl_fp = put(fp)
        self.chunk = chunk

    def probe_chunk(self, values: jax.Array, homes: jax.Array):
        """One device dispatch of the first pass (jit-compiled)."""
        if self.use_fingerprint:
            return probe_fingerprint_pass(self.tbl_fp, self.tbl_kmer,
                                          values, homes, self.w1)
        return probe_first_pass(self.tbl_kmer, values, homes, self.w1)

    def lookup(self, values: np.ndarray, cnt_id: np.ndarray, pos: np.ndarray,
               progress=None, compute_kmers_found: bool = True) -> LookupHits:
        """Full host-level lookup: two-pass probe, then host-side metadata
        gather and hit compaction."""
        values = np.asarray(values, dtype=np.int64)
        n = len(values)
        if n == 0:
            z = np.zeros(0)
            return LookupHits.from_lists(z, z, z, z, z, z, 0)
        homes = (values % np.int64(self.num_sigs)).astype(np.int32)

        found = np.empty(n, dtype=bool)
        resolved = np.empty(n, dtype=bool)
        off = np.empty(n, dtype=np.uint8)
        for start in range(0, n, self.chunk):
            end = min(start + self.chunk, n)
            v, h = values[start:end], homes[start:end]
            pad = self.chunk - (end - start) if n > self.chunk else 0
            if pad:
                v = np.pad(v, (0, pad))
                h = np.pad(h, (0, pad))
            f, r, o = jax.device_get(
                self.probe_chunk(jnp.asarray(v), jnp.asarray(h)))
            sl = slice(0, end - start)
            found[start:end] = f[sl]
            resolved[start:end] = r[sl]
            off[start:end] = o[sl]
            if progress is not None:
                progress.update(end, int(f[sl].sum()))

        # exact full-window second pass for the (rare) unresolved queries
        todo = np.nonzero(~resolved)[0]
        if len(todo):
            m = _round_up_pow2(len(todo))
            v2 = np.zeros(m, dtype=np.int64)
            h2 = np.zeros(m, dtype=np.int32)
            v2[: len(todo)] = values[todo]
            h2[: len(todo)] = homes[todo]
            f2, o2 = jax.device_get(probe_full_window(
                self.tbl_kmer, jnp.asarray(v2), jnp.asarray(h2),
                self.full_window))
            found[todo] = f2[: len(todo)]
            off[todo] = o2[: len(todo)]

        mask = found
        slots = homes[mask].astype(np.int64) + off[mask]
        t = self.table.slots
        return LookupHits(
            cnt_id=np.asarray(cnt_id)[mask].astype(np.int64),
            pos=np.asarray(pos)[mask].astype(np.int64),
            otu=t["otu"][slots],
            avg_from_end=t["avg_from_end"][slots],
            fi=t["fi"][slots],
            wt=t["wt"][slots],
            kmers_found=(int(np.unique(values[mask]).size)
                         if compute_kmers_found else -1),
        )
