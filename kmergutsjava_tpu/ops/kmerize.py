"""Amino-acid 8-mer packing as a vectorized polynomial evaluation (jitted JAX).

Replaces the reference's per-window scalar loop (encodedKmer,
/root/reference/lib/src/kmergutsjava/KmerGutsJava.java:274-292, driven by
addKmers :900-922) with shifted-slice arithmetic: value(start i) =
sum_k a[i+k] * 20^(7-k), validity = all 8 offsets < 20 AND i < num_starts.

``num_starts`` encodes the reference's window bound exactly:
- aa mode: the loop is ``i < len - K`` (ref :912), so num_starts = len - K —
  NOTE this skips the final full window of the protein, a reference quirk we
  reproduce;
- DNA mode: the translated buffer has len/3+1 entries, windows ``i < L - K``,
  which over our length-(len//3) frame rows is num_starts = len//3 - K + 1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import K, POW20

# numpy (not jnp) at module scope: a device constant minted under one trace
# (lazy first import) would leak into every later trace (see ops/encode.py)
_POW20 = np.asarray(POW20)


@jax.jit
def kmer_windows(aa_off: jax.Array, num_starts: jax.Array):
    """Pack every window of K amino-acid offsets into base-20 values.

    Args:
      aa_off: [..., N] uint8 offsets (0..19 valid; >=20 invalid/terminator).
      num_starts: [...] int — number of window start positions per row.

    Returns:
      values: [..., N-K+1] int64 — packed value per window start (garbage
        where invalid).
      valid:  [..., N-K+1] bool — window is in range and fully valid.
    """
    n = aa_off.shape[-1]
    w = n - K + 1
    a32 = aa_off.astype(jnp.int64)
    values = jnp.zeros(aa_off.shape[:-1] + (w,), dtype=jnp.int64)
    ok = jnp.ones(aa_off.shape[:-1] + (w,), dtype=bool)
    for k in range(K):
        seg = a32[..., k: k + w]
        values = values + seg * int(_POW20[k])
        ok = ok & (seg < 20)
    starts = jnp.arange(w)
    in_range = starts < jnp.expand_dims(num_starts, -1)
    return values, ok & in_range
