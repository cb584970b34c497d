"""Vectorized probe-window lookup (jitted XLA; runs on TPU and CPU).

TPU-native reformulation of the reference's streaming merge-join (lookup,
/root/reference/lib/src/kmergutsjava/KmerGutsJava.java:944-1034). Instead of
a sequential scan with an in-flight probe set, every query probes a window of
consecutive slots in parallel, two-pass:

- pass 1 (all queries, short window W1): gather slots [home, home+W1);
  a value match before the first empty slot is a hit (ref :1004-1016); an
  empty slot (whichKmer > MAX_ENCODED, ref :1000) before any match is a
  definitive miss. Queries whose window is fully occupied with no match are
  rare (P(cluster >= W1) decays geometrically) and go to pass 2.
- pass 2 (unresolved only, window P2 >= table max_probe): presence implies
  the value lies within max_probe slots of its home (first-free-slot
  insertion keeps every slot between home and placement occupied forever),
  so "any match in the window" is exact — no empty-slot logic needed.

Equivalence to the reference for linear-probe-built tables follows from the
same invariant; differential tests against lookup/parity.py pin it down.
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


def _round_up_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


@partial(jax.jit, static_argnames=("probe_window",))
def probe_first_pass(
    tbl_kmer: jax.Array,  # [S + P] int64, padded with EMPTY_KMER
    tbl_otu: jax.Array,  # [S + P] int32
    tbl_avg: jax.Array,  # [S + P] int32
    tbl_fi: jax.Array,  # [S + P] int32
    tbl_wt: jax.Array,  # [S + P] float32
    values: jax.Array,  # [N] int64
    homes: jax.Array,  # [N] int32
    probe_window: int,
):
    """Short-window probe with empty-slot resolution. Returns
    (found, resolved, otu, avg, fi, wt)."""
    idx = homes[:, None].astype(jnp.int32) + jnp.arange(probe_window, dtype=jnp.int32)
    tk = tbl_kmer[idx]  # [N, W1] gather
    match = tk == values[:, None]
    empty = tk > MAX_ENCODED
    match_any = jnp.any(match, axis=-1)
    empty_any = jnp.any(empty, axis=-1)
    first_match = jnp.argmax(match, axis=-1).astype(jnp.int32)
    first_empty = jnp.argmax(empty, axis=-1).astype(jnp.int32)
    found = match_any & (~empty_any | (first_match < first_empty))
    resolved = found | empty_any
    slot = jnp.where(found, homes + first_match, 0)
    return (found, resolved, tbl_otu[slot], tbl_avg[slot], tbl_fi[slot],
            tbl_wt[slot])


@partial(jax.jit, static_argnames=("probe_window",))
def probe_window_lookup(
    tbl_kmer: jax.Array,
    tbl_otu: jax.Array,
    tbl_avg: jax.Array,
    tbl_fi: jax.Array,
    tbl_wt: jax.Array,
    values: jax.Array,
    homes: jax.Array,
    probe_window: int,
):
    """Full-window exact probe: any match within probe_window >= max_probe."""
    idx = homes[:, None].astype(jnp.int32) + jnp.arange(probe_window, dtype=jnp.int32)
    tk = tbl_kmer[idx]
    match = tk == values[:, None]
    found = jnp.any(match, axis=-1)
    off = jnp.argmax(match, axis=-1).astype(jnp.int32)
    slot = jnp.where(found, homes + off, 0)
    return found, tbl_otu[slot], tbl_avg[slot], tbl_fi[slot], tbl_wt[slot]


class XlaLookup:
    """Stateful wrapper owning device-resident table planes."""

    def __init__(self, table: KmerTable, probe_window: Optional[int] = None,
                 chunk: int = 1 << 19, device=None,
                 first_pass_window: int = FIRST_PASS_WINDOW):
        if table.max_probe is None:
            table.compute_max_probe()
        self.num_sigs = table.num_sigs
        self.full_window = probe_window or max(8, _round_up_pow2(table.max_probe))
        self.w1 = min(first_pass_window, self.full_window)
        p = max(self.full_window, self.w1)
        s = table.num_sigs
        kmer = np.full(s + p, EMPTY_KMER, dtype=np.int64)
        kmer[:s] = table.slots["kmer"]
        put = partial(jax.device_put, device=device)
        self.tbl_kmer = put(kmer)
        self.tbl_otu = put(np.pad(table.slots["otu"], (0, p)))
        self.tbl_avg = put(np.pad(table.slots["avg_from_end"], (0, p)))
        self.tbl_fi = put(np.pad(table.slots["fi"], (0, p)))
        self.tbl_wt = put(np.pad(table.slots["wt"], (0, p)))
        self.chunk = chunk

    @property
    def _planes(self):
        return (self.tbl_kmer, self.tbl_otu, self.tbl_avg, self.tbl_fi,
                self.tbl_wt)

    def probe(self, values: jax.Array, homes: jax.Array):
        """Single-dispatch exact probe of one chunk (full window)."""
        return probe_window_lookup(*self._planes, values, homes,
                                   self.full_window)

    def lookup(self, values: np.ndarray, cnt_id: np.ndarray, pos: np.ndarray) -> LookupHits:
        """Full host-level lookup: two-pass probe, then compact hits."""
        values = np.asarray(values, dtype=np.int64)
        n = len(values)
        if n == 0:
            z = np.zeros(0)
            return LookupHits.from_lists(z, z, z, z, z, z, 0)
        homes = (values % np.int64(self.num_sigs)).astype(np.int32)

        found = np.empty(n, dtype=bool)
        resolved = np.empty(n, dtype=bool)
        otu = np.empty(n, dtype=np.int32)
        avg = np.empty(n, dtype=np.int32)
        fi = np.empty(n, dtype=np.int32)
        wt = np.empty(n, dtype=np.float32)
        for start in range(0, n, self.chunk):
            end = min(start + self.chunk, n)
            v, h = values[start:end], homes[start:end]
            pad = self.chunk - (end - start) if n > self.chunk else 0
            if pad:
                v = np.pad(v, (0, pad))
                h = np.pad(h, (0, pad))
            out = jax.device_get(probe_first_pass(
                *self._planes, jnp.asarray(v), jnp.asarray(h), self.w1))
            sl = slice(0, end - start)
            found[start:end] = out[0][sl]
            resolved[start:end] = out[1][sl]
            otu[start:end] = out[2][sl]
            avg[start:end] = out[3][sl]
            fi[start:end] = out[4][sl]
            wt[start:end] = out[5][sl]

        if self.full_window > self.w1:
            todo = np.nonzero(~resolved)[0]
            if len(todo):
                m = _round_up_pow2(len(todo))
                v2 = np.zeros(m, dtype=np.int64)
                h2 = np.zeros(m, dtype=np.int32)
                v2[: len(todo)] = values[todo]
                h2[: len(todo)] = homes[todo]
                f2, o2, a2, fi2, w2 = jax.device_get(self.probe(
                    jnp.asarray(v2), jnp.asarray(h2)))
                k = len(todo)
                found[todo] = f2[:k]
                otu[todo] = o2[:k]
                avg[todo] = a2[:k]
                fi[todo] = fi2[:k]
                wt[todo] = w2[:k]

        mask = found
        return LookupHits(
            cnt_id=np.asarray(cnt_id)[mask].astype(np.int64),
            pos=np.asarray(pos)[mask].astype(np.int64),
            otu=otu[mask],
            avg_from_end=avg[mask],
            fi=fi[mask],
            wt=wt[mask],
            kmers_found=int(np.unique(values[mask]).size),
        )
