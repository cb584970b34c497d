#!/usr/bin/env python
"""Register-blocking / narrow-lane sweep for the stream kernel (TPU).

Round-3 roofline accounting (docs/performance.md) puts the stream kernel
at <10% of both published ceilings, with the wall diagnosed as VMEM
load/store traffic: at BLOCK=2048 the per-channel accumulators + query
tiles are ~1MB of live state, far beyond the vector register file, so
every cmp+select streams its operands through VMEM. Variants tested:

- i32       current production form (baseline, [rows, BLOCK] ops)
- strip     register-blocked: iterate 128-lane strips; every op is a
            single-vreg [8, 128] op and the per-strip accumulator chain
            is register-residable if Mosaic's allocator cooperates
- strip4    strip form, channel groups of 4 processed strip-major
            (halves peak live registers; re-reads the window per group)
- u8        int8-lane compare (4x lanes/op) — probes whether Mosaic
            handles 8-bit vector compares even though 16-bit crashes
- u16       uint16-lane compare (the sweep16 harness only tried i16 and
            bf16; unsigned may take a different lowering path)

Rates are honest (rep grid dimension, one dispatch, device_get sync).
Usage:  nohup python scripts/sweep_stream_strip.py > /tmp/sweep_strip.log 2>&1 &
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import kmergutsjava_tpu  # noqa: F401

W = int(os.environ.get("SWEEP_W", 16))
N_SLOTS = int(os.environ.get("SWEEP_SLOTS", 64_000_000))  # 122 MB plane
REPS = int(os.environ.get("SWEEP_REPS", 16))
HALO = 128


def sync(x):
    jax.device_get(jnp.ravel(x)[:1])


def _kernel_block(w, dtype, fp_ref, qfp_ref, out_ref, block, rows, channels):
    from jax.experimental.pallas import tpu as pltpu

    if dtype == "i32":
        fp = fp_ref[0].astype(jnp.int32)
        qfp = [qfp_ref[0, c].astype(jnp.int32) for c in range(channels)]
        acc_t = jnp.int32
    elif dtype == "u16":
        fp = fp_ref[0]
        qfp = [qfp_ref[0, c] for c in range(channels)]
        acc_t = jnp.uint16
    elif dtype == "u8":
        # compare the low byte only (4x lanes per op); false candidates
        # (1/256 per occupied slot) are absorbed by host verification
        fp = fp_ref[0].astype(jnp.uint8)
        qfp = [qfp_ref[0, c].astype(jnp.uint8) for c in range(channels)]
        acc_t = jnp.uint8
    else:
        raise ValueError(dtype)
    first_cand = [jnp.full((rows, block), w, acc_t) for _ in range(channels)]
    for l in reversed(range(w)):
        win = fp[:, l:l + block]
        lane = acc_t(l)
        for c in range(channels):
            first_cand[c] = jnp.where(win == qfp[c], lane, first_cand[c])
    for p in range(channels // 4):
        acc = first_cand[4 * p].astype(jnp.int32)
        for c4 in range(1, 4):
            acc = acc | (first_cand[4 * p + c4].astype(jnp.int32) << (8 * c4))
        out_ref[0, p] = acc


def _kernel_strip(w, group, fp_ref, qfp_ref, out_ref, block, rows, channels):
    nstrips = block // 128
    groups = [list(range(g, min(g + group, channels)))
              for g in range(0, channels, group)]
    for s in range(nstrips):
        base = s * 128
        accs = [None] * channels
        for grp in groups:
            fp_strip = fp_ref[0, :, base:base + 128 + w].astype(jnp.int32)
            qs = {c: qfp_ref[0, c, :, base:base + 128].astype(jnp.int32)
                  for c in grp}
            acc = {c: jnp.full((rows, 128), w, jnp.int32) for c in grp}
            for l in reversed(range(w)):
                win = fp_strip[:, l:l + 128]
                for c in grp:
                    acc[c] = jnp.where(win == qs[c], jnp.int32(l), acc[c])
            for c in grp:
                accs[c] = acc[c]
        for p in range(channels // 4):
            a = accs[4 * p]
            for c4 in range(1, 4):
                a = a | (accs[4 * p + c4] << (8 * c4))
            out_ref[0, p, :, base:base + 128] = a


def run(variant, block, rows, channels, vmem_mb):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nsuper = -(-N_SLOTS // (rows * block))
    k1, k2 = jax.random.split(jax.random.key(1))
    params = {}
    if vmem_mb:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)
    if variant == "strip":
        kern = partial(_kernel_strip, W, channels, block=block, rows=rows,
                       channels=channels)
    elif variant == "strip4":
        kern = partial(_kernel_strip, W, 4, block=block, rows=rows,
                       channels=channels)
    else:
        kern = partial(_kernel_block, W, variant, block=block, rows=rows,
                       channels=channels)

    def call(reps, fp_blocks, qfp_tiles):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kern,
                grid=(reps, nsuper),
                in_specs=[
                    pl.BlockSpec((1, rows, block + HALO),
                                 lambda r, i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, channels, rows, block),
                                 lambda r, i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, channels // 4, rows, block),
                                       lambda r, i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (nsuper, channels // 4, rows, block), jnp.int32),
                **params,
            )(fp_blocks, qfp_tiles)

    with jax.enable_x64(False):
        fp_blocks = jax.random.bits(k1, (nsuper, rows, block + HALO),
                                    dtype=jnp.uint16)
        qfp_tiles = jax.random.bits(k2, (nsuper, channels, rows, block),
                                    dtype=jnp.uint16)
    t_c0 = time.time()
    sync(call(REPS, fp_blocks, qfp_tiles))  # warm the exact executable
    compile_s = time.time() - t_c0

    def timed(r):
        sync(call(r, fp_blocks, qfp_tiles))  # warm this rep count
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            sync(call(r, fp_blocks, qfp_tiles))
            best = min(best, time.time() - t0)
        return best

    # marginal two-point fit (same methodology as bench.py): removes the
    # fixed per-dispatch cost this harness's relay charges
    t1, t2 = timed(REPS), timed(4 * REPS)
    slots = nsuper * rows * block
    return {"variant": variant, "block": block, "rows": rows,
            "channels": channels, "vmem_mb": vmem_mb, "nsuper": nsuper,
            "secs": round(t2, 3), "compile_s": round(compile_s, 1),
            "raw_slot_channels_per_sec": round(
                slots * channels * 4 * REPS / t2, 1),
            "slot_channels_per_sec": round(
                slots * channels * 3 * REPS / max(t2 - t1, 1e-9), 1)}


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "w": W, "reps": REPS}), flush=True)
    default = ("i32,2048,8,8,0 strip,512,8,8,64 strip,1024,8,8,64 "
               "strip4,1024,8,8,64 strip,1024,8,4,64 "
               "u8,2048,8,8,0 u16,2048,8,8,0")
    cfgs = []
    for c in os.environ.get("SWEEP_CFGS", default).split():
        parts = c.split(",")
        cfgs.append((parts[0],) + tuple(int(x) for x in parts[1:]))
    for cfg in cfgs:
        try:
            print(json.dumps(run(*cfg)), flush=True)
        except Exception as ex:
            print(json.dumps({"cfg": cfg, "error": repr(ex)[:300]}),
                  flush=True)
        gc.collect()


if __name__ == "__main__":
    main()
