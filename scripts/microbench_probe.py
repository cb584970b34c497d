#!/usr/bin/env python
"""Honest on-chip probe microbenchmarks (one device program per config).

Through this harness's TPU relay every dispatch costs high and variable
latency, and block_until_ready does not synchronize — so the only honest
way to measure ON-CHIP throughput is to run the whole rep loop inside a
single jitted program (lax.fori_loop for the XLA gather path; a leading
rep grid dimension for the Pallas kernel) and end with jax.device_get of
a scalar that data-depends on every iteration.

All benchmark operands are generated ON device (the relay host link is
~MB/s); probe throughput does not depend on operand contents.  A small
real-table correctness check runs first so the numbers belong to a kernel
that is actually right on TPU.

Usage: nohup python scripts/microbench_probe.py > /tmp/microbench.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import kmergutsjava_tpu  # noqa: F401  (x64 + cache setup)
from kmergutsjava_tpu.lookup.xla import FP_EMPTY

W = 16


def sync(x):
    jax.device_get(jnp.ravel(x)[:1])


def null_roundtrip():
    """One trivial dispatch+sync: the relay latency floor."""
    f = jax.jit(lambda x: x + 1)
    y = f(jnp.zeros((8,), jnp.int32))
    sync(y)
    t0 = time.time()
    y = f(y)
    sync(y)
    return time.time() - t0


@partial(jax.jit, static_argnames=("w", "reps"))
def gather_loop(fp, qfp, homes, w, reps):
    limit = jnp.int32(fp.shape[0] - w)

    def body(i, carry):
        h = (homes + i) % limit  # vary per rep: defeats CSE, keeps traffic
        idx = h[:, None] + jnp.arange(w, dtype=jnp.int32)
        win = fp[idx]
        cand = win == qfp[:, None]
        empty = win == jnp.uint16(FP_EMPTY)
        first_cand = jnp.argmax(cand, axis=-1).astype(jnp.int32)
        first_empty = jnp.argmax(empty, axis=-1).astype(jnp.int32)
        has = (jnp.any(cand, -1)
               & (~jnp.any(empty, -1) | (first_cand < first_empty)))
        state = has.astype(jnp.int32) + 2 * jnp.any(empty, -1).astype(jnp.int32)
        return carry + jnp.sum(state) + jnp.sum(first_cand)

    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))


def bench_gather(n_slots: int, n_queries: int, reps: int, floor: float):
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    with jax.enable_x64(False):
        fp = jax.random.bits(k1, (n_slots + W,), dtype=jnp.uint16)
        qfp = jax.random.bits(k2, (n_queries,), dtype=jnp.uint16)
        homes = jax.random.randint(k3, (n_queries,), 0, n_slots - W,
                                   dtype=jnp.int32)
        out = gather_loop(fp, qfp, homes, W, reps)  # compile + warm (same executable)
        sync(out)
        t0 = time.time()
        out = gather_loop(fp, qfp, homes, W, reps)
        sync(out)
        dt = max(time.time() - t0 - floor, 1e-9)
    return {"kind": "xla_gather", "plane_mb": n_slots * 2 / 2**20,
            "queries": n_queries, "reps": reps, "secs": round(dt, 4),
            "lookups_per_sec": round(n_queries * reps / dt, 1)}


@partial(jax.jit, static_argnames=("w", "reps"))
def rows_loop(fp2d, qfp, homes, w, reps):
    from kmergutsjava_tpu.lookup.xla import probe_fingerprint_rows

    def body(i, carry):
        # query-xor perturbation (see rows1_loop: the old per-rep modulo
        # over homes cost more than a narrow probe itself)
        off, state = probe_fingerprint_rows(
            fp2d, qfp ^ i.astype(jnp.uint16), homes, w)
        return (carry + jnp.sum(state.astype(jnp.int32))
                + jnp.sum(off.astype(jnp.int32)))

    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))


def bench_rows(n_slots: int, n_queries: int, reps: int, floor: float):
    k1, k2, k3 = jax.random.split(jax.random.key(2), 3)
    nrows = n_slots // 128 + 2
    with jax.enable_x64(False):
        fp2d = jax.random.bits(k1, (nrows, 128), dtype=jnp.uint16)
        qfp = jax.random.bits(k2, (n_queries,), dtype=jnp.uint16)
        homes = jax.random.randint(k3, (n_queries,), 0, n_slots - W,
                                   dtype=jnp.int32)
        out = rows_loop(fp2d, qfp, homes, W, reps)
        sync(out)
        t0 = time.time()
        out = rows_loop(fp2d, qfp, homes, W, reps)
        sync(out)
        dt = max(time.time() - t0 - floor, 1e-9)
    return {"kind": "xla_rows_gather", "plane_mb": n_slots * 2 / 2**20,
            "queries": n_queries, "reps": reps, "secs": round(dt, 4),
            "lookups_per_sec": round(n_queries * reps / dt, 1)}


@partial(jax.jit, static_argnames=("w", "stride", "reps"))
def rows1_loop(fp2d, qfp, homes, w, stride, reps):
    from kmergutsjava_tpu.lookup.xla import probe_fingerprint_rows1

    def body(i, carry):
        # ROUND-3 WARNING: perturbing only the QUERY fingerprint does
        # NOT defeat loop hoisting of the gather itself — homes are
        # loop-invariant, so XLA materializes the gathered rows once
        # whenever they fit, and only the compare is timed (inflated
        # narrow-lane rates up to ~7x). Honest harnesses cycle NB
        # precomputed (query, home) variants per iteration
        # (scripts/sweep_fuse3.py, bench.bench_tpu_sparse_big).
        off, state = probe_fingerprint_rows1(
            fp2d, qfp ^ i.astype(jnp.uint16), homes, w, stride)
        return (carry + jnp.sum(state.astype(jnp.int32))
                + jnp.sum(off.astype(jnp.int32)))

    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))


def bench_rows1(n_slots: int, n_queries: int, reps: int, floor: float):
    stride = 128 - W
    k1, k2, k3 = jax.random.split(jax.random.key(3), 3)
    nrows = n_slots // stride + 2
    with jax.enable_x64(False):
        fp2d = jax.random.bits(k1, (nrows, 128), dtype=jnp.uint16)
        qfp = jax.random.bits(k2, (n_queries,), dtype=jnp.uint16)
        homes = jax.random.randint(k3, (n_queries,), 0, n_slots - W,
                                   dtype=jnp.int32)
        out = rows1_loop(fp2d, qfp, homes, W, stride, reps)
        sync(out)
        t0 = time.time()
        out = rows1_loop(fp2d, qfp, homes, W, stride, reps)
        sync(out)
        dt = max(time.time() - t0 - floor, 1e-9)
    return {"kind": "xla_rows1_gather", "plane_mb": n_slots * 2 / 2**20,
            "queries": n_queries, "reps": reps, "secs": round(dt, 4),
            "lookups_per_sec": round(n_queries * reps / dt, 1)}


def stream_reps(fp_blocks, qfp_tiles, nsuper, w, reps, channels=None,
                interpret=None, form="i32"):
    """stream_probe_blocks with a leading rep grid dim (one dispatch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kmergutsjava_tpu.lookup.pallas_stream import (BLOCK, CHANNELS, HALO,
                                                       ROWS,
                                                       _stream_block_kernel)

    if channels is None:
        channels = CHANNELS
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(_stream_block_kernel, w, channels=channels, form=form),
            grid=(reps, nsuper),
            interpret=interpret,
            in_specs=[
                pl.BlockSpec((1, ROWS, BLOCK + HALO),
                             lambda r, i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, channels, ROWS, BLOCK),
                             lambda r, i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, channels // 4, ROWS, BLOCK),
                                   lambda r, i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (nsuper, channels // 4, ROWS, BLOCK), jnp.int32),
        )(fp_blocks, qfp_tiles)


def bench_stream(n_slots: int, reps: int, floor: float, w: int = W):
    from kmergutsjava_tpu.lookup.pallas_stream import (BLOCK, CHANNELS, HALO,
                                                       ROWS)

    nsuper = -(-n_slots // (ROWS * BLOCK))
    k1, k2 = jax.random.split(jax.random.key(1))
    with jax.enable_x64(False):
        fp_blocks = jax.random.bits(k1, (nsuper, ROWS, BLOCK + HALO),
                                    dtype=jnp.uint16)
        qfp_tiles = jax.random.bits(k2, (nsuper, CHANNELS, ROWS, BLOCK),
                                    dtype=jnp.uint16)
        # warm with the SAME static reps (a different grid = a different
        # executable whose first call would time its remote compile)
        out = stream_reps(fp_blocks, qfp_tiles, nsuper, w, reps)
        sync(out)
        t0 = time.time()
        out = stream_reps(fp_blocks, qfp_tiles, nsuper, w, reps)
        sync(out)
        dt = max(time.time() - t0 - floor, 1e-9)
    slots = nsuper * ROWS * BLOCK
    return {"kind": "pallas_stream", "plane_mb": slots * 2 / 2**20, "w": w,
            "slot_channels": slots * CHANNELS, "reps": reps,
            "secs": round(dt, 4),
            "slot_channels_per_sec": round(slots * CHANNELS * reps / dt, 1)}


def correctness_on_tpu():
    """Small real table + real queries: stream kernel (compiled) vs oracle."""
    from kmergutsjava_tpu.formats.kmer_table import build_table
    from kmergutsjava_tpu.lookup.pallas_stream import PallasStreamLookup
    from kmergutsjava_tpu.lookup.parity import lookup_stream

    rng = np.random.default_rng(5)
    kmers = np.unique(rng.integers(0, 20**8, 300_000, dtype=np.int64))
    table = build_table(kmers,
                        rng.integers(0, 100, len(kmers)).astype(np.int32),
                        rng.integers(0, 500, len(kmers)).astype(np.int32),
                        rng.integers(0, 999, len(kmers)).astype(np.int32),
                        rng.random(len(kmers)).astype(np.float32))
    n = 200_000
    values = np.concatenate([rng.choice(kmers, n // 2),
                             rng.integers(0, 20**8, n - n // 2, dtype=np.int64)])
    cnt = np.arange(n, dtype=np.int64) % 7
    pos = np.arange(n, dtype=np.int64)
    a = lookup_stream(table, values, cnt, pos)
    b = PallasStreamLookup(table, interpret=False).lookup(values, cnt, pos)
    rec = lambda h: sorted(zip(h.cnt_id, h.pos, h.fi, h.otu, h.avg_from_end,
                               h.wt))
    ok = rec(a) == rec(b) and a.kmers_found == b.kmers_found
    return {"kind": "stream_correctness_tpu", "hits": len(b), "ok": bool(ok)}


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "devices": len(jax.devices())}), flush=True)
    try:
        print(json.dumps(correctness_on_tpu()), flush=True)
    except Exception as ex:
        print(json.dumps({"kind": "stream_correctness_tpu",
                          "error": repr(ex)[:2000]}), flush=True)
    floor = min(null_roundtrip() for _ in range(3))
    print(json.dumps({"kind": "sync_floor", "secs": round(floor, 4)}),
          flush=True)
    import gc

    which = os.environ.get("MICROBENCH", "rows,stream")
    benches = {
        "gather": (
            lambda: bench_gather(4_000_000, 4_000_000, 64, floor),
            lambda: bench_gather(64_000_000, 4_000_000, 8, floor),
            lambda: bench_gather(256_000_000, 4_000_000, 4, floor),
        ),
        "rows": (
            lambda: bench_rows(4_000_000, 4_000_000, 64, floor),
            lambda: bench_rows(64_000_000, 4_000_000, 16, floor),
            lambda: bench_rows(256_000_000, 4_000_000, 8, floor),
        ),
        "rows1": (
            lambda: bench_rows1(4_000_000, 4_000_000, 64, floor),
            lambda: bench_rows1(64_000_000, 4_000_000, 16, floor),
            lambda: bench_rows1(256_000_000, 4_000_000, 8, floor),
        ),
        "stream": (
            lambda: bench_stream(4_000_000, 64, floor),
            lambda: bench_stream(64_000_000, 16, floor),
            lambda: bench_stream(128_000_000, 8, floor),
        ),
    }
    for fn in (f for k in which.split(",") for f in benches[k]):
        try:
            print(json.dumps(fn()), flush=True)
        except Exception as ex:
            print(json.dumps({"error": repr(ex)[:2000]}), flush=True)
        gc.collect()  # drop device buffers before the next config


if __name__ == "__main__":
    main()
