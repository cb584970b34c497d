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
    q_fp: jax.Array,  # [N] uint16 query fingerprints
    homes: jax.Array,  # [N] int32
    probe_window: int,
):
    """Fingerprint-only probe: nothing 64-bit touches the device. Returns
    (off_u8, state_u8) with state bit0 = has-candidate-before-empty and
    bit1 = empty-seen; the caller verifies candidates against the host-side
    k-mer array. Per query: 6 bytes up, 2 bytes down."""
    idx = homes[:, None].astype(jnp.int32) + jnp.arange(probe_window, dtype=jnp.int32)
    fp = tbl_fp[idx]  # [N, W] uint16 gather — the only wide memory touch
    cand = fp == q_fp[:, None]
    empty = fp == jnp.uint16(FP_EMPTY)
    cand_any = jnp.any(cand, axis=-1)
    empty_any = jnp.any(empty, axis=-1)
    first_cand = jnp.argmax(cand, axis=-1).astype(jnp.int32)
    first_empty = jnp.argmax(empty, axis=-1).astype(jnp.int32)
    has_cand = cand_any & (~empty_any | (first_cand < first_empty))
    off = jnp.where(has_cand, first_cand, 0).astype(jnp.uint8)
    state = (has_cand.astype(jnp.uint8) + 2 * empty_any.astype(jnp.uint8))
    return off, state


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
    """Stateful wrapper owning the device-resident probe planes.

    Fingerprint mode (default): only the uint16 fingerprint plane lives in
    HBM; candidate verification and the exact full-window second pass run
    host-side against the table's host arrays, so device traffic is 6 bytes
    up / 2 bytes down per query and chunks are dispatched asynchronously
    (uploads, probes, and downloads pipeline across chunks).

    int64 mode (use_fingerprint=False): the classic two-pass probe on the
    int64 plane, fully on device.
    """

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
        self.w1 = min(self._adaptive_w1(table, first_pass_window),
                      self.full_window)
        self.use_fingerprint = use_fingerprint
        p = max(self.full_window, self.w1)
        s = table.num_sigs
        # host-side padded k-mer plane (verification + host second pass)
        self.host_kmer = np.full(s + p, EMPTY_KMER, dtype=np.int64)
        self.host_kmer[:s] = table.slots["kmer"]
        put = partial(jax.device_put, device=device)
        # Pad the device fp plane up to a canonical size bucket so tables of
        # similar size share one compiled probe executable (XLA specializes
        # on operand shapes; every fresh plane length would otherwise
        # trigger a full recompile). Padding probes read FP_EMPTY = miss.
        plane_len = max(_round_up_pow2(s + p), 1 << 20)
        fp = np.full(plane_len, FP_EMPTY, dtype=np.uint16)
        occ = table.occupied
        fp[:s][occ] = (table.slots["kmer"][occ] % FP_MOD).astype(np.uint16)
        self.tbl_fp = put(fp)
        self.tbl_kmer = put(self.host_kmer) if not use_fingerprint else None
        self.chunk = chunk

    @staticmethod
    def _adaptive_w1(table: KmerTable, floor: int) -> int:
        """Pick the pass-1 window so that fully-occupied windows (which
        force the exact second pass) stay rare. Linear-probe clusters are
        heavy-tailed at high load factors: at 0.7 load ~20%+ of homes sit
        in runs of 16+ occupied slots, which would push a fifth of all
        queries to pass 2. Measured on (a sample of) the actual occupancy."""
        occ = table.occupied
        if len(occ) > 2_000_000:
            start = len(occ) // 3
            occ = occ[start: start + 1_000_000]
        occ = occ.astype(np.int32)
        c = np.concatenate([[0], np.cumsum(occ)])
        w = floor
        while w < 256:
            if len(c) <= w:
                break
            run = c[w:] - c[:-w]
            frac_full = float((run == w).mean())
            if frac_full <= 0.02:
                break
            w *= 2
        return w

    def probe_chunk(self, q_fp: jax.Array, homes: jax.Array):
        """One device dispatch of the fingerprint pass (jit-compiled)."""
        return probe_fingerprint_pass(self.tbl_fp, q_fp, homes, self.w1)

    def _host_full_window(self, values, homes, todo):
        """Exact full-window probe on the host k-mer array (for unresolved
        queries — a vanishing fraction)."""
        idx = homes[todo].astype(np.int64)[:, None] + np.arange(self.full_window)
        match = self.host_kmer[idx] == values[todo, None]
        found = match.any(axis=1)
        off = np.argmax(match, axis=1).astype(np.uint8)
        return found, np.where(found, off, 0)

    def lookup(self, values: np.ndarray, cnt_id: np.ndarray, pos: np.ndarray,
               progress=None, compute_kmers_found: bool = True) -> LookupHits:
        """Full host-level lookup: fingerprint probe on device (async across
        chunks), host verification, host second pass, hit compaction."""
        values = np.asarray(values, dtype=np.int64)
        n = len(values)
        if n == 0:
            z = np.zeros(0)
            return LookupHits.from_lists(z, z, z, z, z, z, 0)
        homes = (values % np.int64(self.num_sigs)).astype(np.int32)

        if self.use_fingerprint:
            q_fp = (values % FP_MOD).astype(np.uint16)
            # dispatch every chunk before reading any result: uploads,
            # probes, and D2H transfers overlap
            pending = []
            for start in range(0, n, self.chunk):
                end = min(start + self.chunk, n)
                f, h = q_fp[start:end], homes[start:end]
                # pad every dispatch to a power-of-two bucket so distinct
                # input sizes reuse compiled executables
                target = (self.chunk if n > self.chunk
                          else max(_round_up_pow2(end - start), 4096))
                pad = target - (end - start)
                if pad:
                    f = np.pad(f, (0, pad))
                    h = np.pad(h, (0, pad))
                pending.append((start, end,
                                self.probe_chunk(jnp.asarray(f), jnp.asarray(h))))
            off = np.empty(n, dtype=np.uint8)
            state = np.empty(n, dtype=np.uint8)
            for start, end, out in pending:
                o, st = jax.device_get(out)
                off[start:end] = o[: end - start]
                state[start:end] = st[: end - start]
                if progress is not None:
                    progress.update(end, int((st[: end - start] & 1).sum()))
            has_cand = (state & 1) != 0
            empty_any = (state & 2) != 0
            # host-side candidate verification
            found = np.zeros(n, dtype=bool)
            ci = np.nonzero(has_cand)[0]
            slots_c = homes[ci].astype(np.int64) + off[ci]
            verified = self.host_kmer[slots_c] == values[ci]
            found[ci] = verified
            unresolved = np.zeros(n, dtype=bool)
            unresolved[ci] = ~verified  # fingerprint collision
            unresolved[~has_cand & ~empty_any] = True  # window fully occupied
        else:
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
                f, r, o = jax.device_get(probe_first_pass(
                    self.tbl_kmer, jnp.asarray(v), jnp.asarray(h), self.w1))
                sl = slice(0, end - start)
                found[start:end] = f[sl]
                resolved[start:end] = r[sl]
                off[start:end] = o[sl]
                if progress is not None:
                    progress.update(end, int(f[sl].sum()))
            unresolved = ~resolved

        # exact full-window second pass (host) for the rare unresolved
        todo = np.nonzero(unresolved)[0]
        if len(todo):
            f2, o2 = self._host_full_window(values, homes, todo)
            found[todo] = f2
            off[todo] = o2

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
