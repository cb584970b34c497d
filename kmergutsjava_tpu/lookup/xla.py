"""Vectorized probe-window lookup (jitted XLA; runs on TPU and CPU).

TPU-native reformulation of the reference's streaming merge-join (lookup,
/root/reference/lib/src/kmergutsjava/KmerGutsJava.java:944-1034). Instead of
a sequential scan with an in-flight probe set, every query probes its window
of P consecutive slots in parallel:

    idx[n, p] = home[n] + p          (home = value % numSigs, ref :969)
    found[n]  = any(table.kmer[idx[n, :]] == value[n])

Equivalence to the reference for tables produced by our builder (and any
table built by first-free-slot linear probing without wraparound):

- if a value is present, it sits within max_probe slots of its home, and
  every slot between home and it was occupied at insertion time and stays
  occupied — so the reference's scan reaches it before any empty slot, and
  our window (P >= max_probe) contains it;
- if a value is absent, no slot in [home, home+max_probe) holds it, so both
  report a miss. The empty-slot early-exit is an *algorithmic* device of the
  sequential scan, not part of the answer.

The table's kmer plane is padded with P empty slots so windows never go out
of bounds (the builder additionally guarantees no chain touches the last
real slot). Differential tests against lookup/parity.py pin this down.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EMPTY_KMER
from ..formats.kmer_table import KmerTable
from .parity import LookupHits


def _round_up_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


@partial(jax.jit, static_argnames=("probe_window",))
def probe_window_lookup(
    tbl_kmer: jax.Array,  # [S + P] int64, padded with EMPTY_KMER
    tbl_otu: jax.Array,  # [S + P] int32
    tbl_avg: jax.Array,  # [S + P] int32
    tbl_fi: jax.Array,  # [S + P] int32
    tbl_wt: jax.Array,  # [S + P] float32
    values: jax.Array,  # [N] int64
    homes: jax.Array,  # [N] int32
    probe_window: int,
):
    idx = homes[:, None].astype(jnp.int32) + jnp.arange(probe_window, dtype=jnp.int32)
    tk = tbl_kmer[idx]  # [N, P] gather
    match = tk == values[:, None]
    found = jnp.any(match, axis=-1)
    off = jnp.argmax(match, axis=-1).astype(jnp.int32)
    slot = jnp.where(found, homes + off, 0)
    return found, tbl_otu[slot], tbl_avg[slot], tbl_fi[slot], tbl_wt[slot]


class XlaLookup:
    """Stateful wrapper owning device-resident table planes."""

    def __init__(self, table: KmerTable, probe_window: Optional[int] = None,
                 chunk: int = 1 << 19, device=None):
        if table.max_probe is None:
            table.compute_max_probe()
        self.num_sigs = table.num_sigs
        self.probe_window = probe_window or max(8, _round_up_pow2(table.max_probe))
        p = self.probe_window
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

    def probe(self, values: jax.Array, homes: jax.Array):
        """Device-level probe of one padded chunk (jit-compiled)."""
        return probe_window_lookup(
            self.tbl_kmer, self.tbl_otu, self.tbl_avg, self.tbl_fi, self.tbl_wt,
            values, homes, self.probe_window,
        )

    def lookup(self, values: np.ndarray, cnt_id: np.ndarray, pos: np.ndarray) -> LookupHits:
        """Full host-level lookup: chunk, probe on device, compact hits."""
        values = np.asarray(values, dtype=np.int64)
        n = len(values)
        homes = (values % np.int64(self.num_sigs)).astype(np.int32)
        outs = {"found": [], "otu": [], "avg": [], "fi": [], "wt": []}
        for start in range(0, max(n, 1), self.chunk):
            v = values[start: start + self.chunk]
            h = homes[start: start + self.chunk]
            if len(v) == 0:
                break
            pad = 0
            if len(v) < self.chunk and n > self.chunk:
                pad = self.chunk - len(v)
                v = np.pad(v, (0, pad), constant_values=0)
                h = np.pad(h, (0, pad), constant_values=0)
            found, otu, avg, fi, wt = jax.device_get(self.probe(jnp.asarray(v), jnp.asarray(h)))
            if pad:
                found, otu, avg, fi, wt = (a[:-pad] for a in (found, otu, avg, fi, wt))
            outs["found"].append(found)
            outs["otu"].append(otu)
            outs["avg"].append(avg)
            outs["fi"].append(fi)
            outs["wt"].append(wt)
        found = np.concatenate(outs["found"]) if outs["found"] else np.zeros(0, bool)
        mask = found
        matched_values = values[mask]
        return LookupHits(
            cnt_id=np.asarray(cnt_id)[mask].astype(np.int64),
            pos=np.asarray(pos)[mask].astype(np.int64),
            otu=np.concatenate(outs["otu"])[mask] if len(mask) else np.zeros(0, np.int32),
            avg_from_end=np.concatenate(outs["avg"])[mask] if len(mask) else np.zeros(0, np.int32),
            fi=np.concatenate(outs["fi"])[mask] if len(mask) else np.zeros(0, np.int32),
            wt=np.concatenate(outs["wt"])[mask] if len(mask) else np.zeros(0, np.float32),
            kmers_found=int(np.unique(matched_values).size),
        )
