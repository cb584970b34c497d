#!/usr/bin/env python
"""Round-3 sweep 5: honest chunked-probe rate at a 512MB plane.

The honest (per-iteration home variation) u16 ladder from
scripts/sweep_fuse3.py: 270M/s at 13MB, 128.8M/s at 512MB with 128
lanes. The round-2 chunked figure (210-227M at 512MB) came from the
fixed-bin xor-perturbation harness, so this re-measures the production
chunked scan (probe_fingerprint_chunk_bins) with NB precomputed bin
variants, against the wide rows1 gather on the same 512MB of plane —
this decides whether chunked stays the auto default for HBM-large
planes.

Usage: nohup python scripts/sweep_fuse4.py > /tmp/sweep_fuse4.log 2>&1 &
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import kmergutsjava_tpu  # noqa: F401
import jax
import jax.numpy as jnp

W = 16
NB = 4
PLANE_MB = float(os.environ.get("SWEEP_PLANE_MB", 512))
N_Q = int(os.environ.get("SWEEP_QUERIES", 2_000_000))


def sync(x):
    jax.device_get(jnp.ravel(x)[:1])


def timed(fn, r1, r2):
    def t(r):
        sync(fn(r))
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            sync(fn(r))
            best = min(best, time.time() - t0)
        return best

    t1, t2 = t(r1), t(r2)
    return (r2 - r1) / max(t2 - t1, 1e-9)


def main():
    from kmergutsjava_tpu.lookup.xla import (probe_fingerprint_chunk_bins,
                                             probe_fingerprint_rows1)

    out = {}
    reps = int(os.environ.get("SWEEP_REPS", 12))
    with jax.enable_x64(False):
        def rep(body):
            @partial(jax.jit, static_argnames=("r",))
            def loop(r, *args):
                def f(i, c):
                    return c + body(i, *args).astype(jnp.int32)
                return jax.lax.fori_loop(0, r, f, jnp.int32(0))
            return loop

        def pick(i, a):
            return jax.lax.dynamic_index_in_dim(a, i % NB, 0,
                                                keepdims=False)

        # chunked: [C, 16384, 128] 4MB chunks; bins [C, cap] full
        chunk_rows = 16384
        nchunks = max(1, int(PLANE_MB * 2**20) // (chunk_rows * 256))
        cap = -(-(N_Q // nchunks) // 8) * 8
        n_cells = nchunks * cap
        k1, k2, k3, k4 = jax.random.split(jax.random.key(17), 4)
        tbl3 = jax.random.bits(k1, (nchunks, chunk_rows, 128),
                               dtype=jnp.uint16)
        qfp_nb = jax.random.bits(k2, (NB, nchunks, cap), dtype=jnp.uint16)
        row_nb = (jax.random.bits(k3, (NB, nchunks, cap), dtype=jnp.uint16)
                  % jnp.uint16(chunk_rows))
        off_nb = (jax.random.bits(k4, (NB, nchunks, cap), dtype=jnp.uint8)
                  % jnp.uint8(128 - W))

        def chunked_body(i, tbl3, qfp_nb, row_nb, off_nb):
            off, st = probe_fingerprint_chunk_bins(
                tbl3, pick(i, qfp_nb), pick(i, row_nb), pick(i, off_nb), W)
            return jnp.sum(st.astype(jnp.int32)) + jnp.sum(
                off.astype(jnp.int32))

        loop_c = rep(chunked_body)
        execs = timed(lambda r: loop_c(r, tbl3, qfp_nb, row_nb, off_nb),
                      reps, 4 * reps)
        out["chunked_honest"] = round(execs * n_cells, 1)
        print(f"chunked_honest: {out['chunked_honest'] / 1e6:.1f}M/s",
              flush=True)

        # wide rows1 on the same bytes
        stride = 128 - W
        nrows = int(PLANE_MB * 2**20) // 256
        k5, k6, k7 = jax.random.split(jax.random.key(23), 3)
        t128 = jax.random.bits(k5, (nrows, 128), dtype=jnp.uint16)
        q_nb = jax.random.bits(k6, (NB, N_Q), dtype=jnp.uint16)
        h_nb = jax.random.randint(k7, (NB, N_Q), 0, (nrows - 2) * stride,
                                  dtype=jnp.int32)

        def rows1_body(i, t128, q_nb, h_nb):
            off, st = probe_fingerprint_rows1(
                t128, pick(i, q_nb), pick(i, h_nb), W, stride)
            return jnp.sum(st.astype(jnp.int32)) + jnp.sum(
                off.astype(jnp.int32))

        loop_r = rep(rows1_body)
        execs = timed(lambda r: loop_r(r, t128, q_nb, h_nb), reps, 4 * reps)
        out["rows1_128_honest"] = round(execs * N_Q, 1)
        print(f"rows1_128_honest: {out['rows1_128_honest'] / 1e6:.1f}M/s",
              flush=True)
    out["plane_mb"] = PLANE_MB
    out["chunked_cells"] = n_cells
    print(json.dumps(out))


if __name__ == "__main__":
    main()
