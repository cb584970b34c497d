#!/usr/bin/env python
"""16-bit-lane experiment for the stream kernel (TPU; one config per line).

The stream kernel is VPU-compute-bound on i32 vregs; a native 16-bit
formulation would double lanes per op, but this Mosaic release crashes on
packed vector<...x2xi16> COMPARES. This sweep tests whether *bfloat16*
compares dodge that: fingerprints capped below 0x7F80 are all finite
non-negative bf16 patterns whose bit-equality coincides with fp-equality
(no NaN patterns, no -0.0; any subnormal flushing only creates extra
false candidates, which host verification already absorbs).

Variants per config: i32 (current production form), bf16 (bitcast compare
+ bf16 select accumulator), i16 (re-confirm the crash). Rates are honest
(rep grid dim, one dispatch, device_get sync). Usage:
  nohup python scripts/sweep_stream16.py > /tmp/sweep16.log 2>&1 &
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
from kmergutsjava_tpu.lookup.pallas_stream import HALO

W = int(os.environ.get("SWEEP_W", 16))
N_SLOTS = int(os.environ.get("SWEEP_SLOTS", 64_000_000))  # 122 MB plane
REPS = int(os.environ.get("SWEEP_REPS", 16))


def sync(x):
    jax.device_get(jnp.ravel(x)[:1])


def _kernel(w, dtype, fp_ref, qfp_ref, out_ref, block, rows, channels):
    from jax.experimental.pallas import tpu as pltpu

    if dtype == "i32":
        fp = fp_ref[0].astype(jnp.int32)
        qfp = [qfp_ref[0, c].astype(jnp.int32) for c in range(channels)]
        acc_t = jnp.int32
        lane_of = lambda l: jnp.int32(l)
    elif dtype == "bf16":
        fp = pltpu.bitcast(fp_ref[0], jnp.bfloat16)
        qfp = [pltpu.bitcast(qfp_ref[0, c], jnp.bfloat16)
               for c in range(channels)]
        acc_t = jnp.bfloat16
        lane_of = lambda l: jnp.bfloat16(l)
    elif dtype == "i16":
        fp = pltpu.bitcast(fp_ref[0], jnp.int16)
        qfp = [pltpu.bitcast(qfp_ref[0, c], jnp.int16)
               for c in range(channels)]
        acc_t = jnp.int16
        lane_of = lambda l: jnp.int16(l)
    elif dtype == "mix":
        # 16-bit compare (2x lanes), 32-bit select accumulator: isolates
        # whether Mosaic crashes on the packed compare or the packed select
        fp = pltpu.bitcast(fp_ref[0], jnp.bfloat16)
        qfp = [pltpu.bitcast(qfp_ref[0, c], jnp.bfloat16)
               for c in range(channels)]
        acc_t = jnp.int32
        lane_of = lambda l: jnp.int32(l)
    elif dtype == "bcast":
        # bitcast round-trip only, compare stays i32: isolates the bitcast
        fp = pltpu.bitcast(fp_ref[0], jnp.int16).astype(jnp.int32) & 0xFFFF
        qfp = [pltpu.bitcast(qfp_ref[0, c], jnp.int16).astype(jnp.int32)
               & 0xFFFF for c in range(channels)]
        acc_t = jnp.int32
        lane_of = lambda l: jnp.int32(l)
    else:
        raise ValueError(dtype)
    first_cand = [jnp.full((rows, block), w, acc_t) for _ in range(channels)]
    for l in reversed(range(w)):
        win = fp[:, l:l + block]
        lane = lane_of(l)
        for c in range(channels):
            first_cand[c] = jnp.where(win == qfp[c], lane, first_cand[c])
    for p in range(channels // 4):
        acc = first_cand[4 * p].astype(jnp.int32)
        for c4 in range(1, 4):
            acc = acc | (first_cand[4 * p + c4].astype(jnp.int32) << (8 * c4))
        out_ref[0, p] = acc


def run(dtype, block, rows, channels, vmem_mb):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nsuper = -(-N_SLOTS // (rows * block))
    k1, k2 = jax.random.split(jax.random.key(1))
    params = {}
    if vmem_mb:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)

    def call(reps, fp_blocks, qfp_tiles):
        with jax.enable_x64(False):
            return pl.pallas_call(
                partial(_kernel, W, dtype, block=block, rows=rows,
                        channels=channels),
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
        # cap below 0x7F80: every pattern a finite non-negative bf16
        fp_blocks = jax.random.bits(k1, (nsuper, rows, block + HALO),
                                    dtype=jnp.uint16) % jnp.uint16(0x7F80)
        qfp_tiles = jax.random.bits(k2, (nsuper, channels, rows, block),
                                    dtype=jnp.uint16) % jnp.uint16(0x7F80)
    sync(call(REPS, fp_blocks, qfp_tiles))  # warm the exact executable
    t0 = time.time()
    out = call(REPS, fp_blocks, qfp_tiles)
    sync(out)
    dt = time.time() - t0
    slots = nsuper * rows * block
    return {"dtype": dtype, "block": block, "rows": rows,
            "channels": channels, "vmem_mb": vmem_mb, "nsuper": nsuper,
            "secs": round(dt, 3),
            "slot_channels_per_sec": round(slots * channels * REPS / dt, 1)}


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    default = ("i32,2048,8,4,0 bf16,2048,8,4,0 bf16,2048,16,4,64 "
               "bf16,2048,8,8,64 i16,2048,8,4,0")
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
