#!/usr/bin/env python
"""Tile-shape sweep for the stream kernel (TPU; one config per line).

Sweeps (BLOCK, ROWS, vmem_limit_bytes) on a fixed-size synthetic plane to
find the fastest superblock geometry; rates are honest (rep grid dim, one
dispatch, device_get sync). Usage:
  nohup python scripts/sweep_stream.py > /tmp/sweep.log 2>&1 &
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
from kmergutsjava_tpu.lookup.pallas_stream import HALO, _stream_block_kernel

W = int(os.environ.get("SWEEP_W", 16))
N_SLOTS = int(os.environ.get("SWEEP_SLOTS", 64_000_000))  # 122 MB plane
REPS = int(os.environ.get("SWEEP_REPS", 16))


def sync(x):
    jax.device_get(jnp.ravel(x)[:1])


def run(block, rows, channels, vmem_mb):
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
                partial(_stream_block_kernel, W, block=block, rows=rows,
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
        fp_blocks = jax.random.bits(k1, (nsuper, rows, block + HALO),
                                    dtype=jnp.uint16)
        qfp_tiles = jax.random.bits(k2, (nsuper, channels, rows, block),
                                    dtype=jnp.uint16)
    # warm with the SAME static reps: a different grid is a different
    # executable, and timing a first call of a fresh executable would
    # include its (remote, slow) compile
    sync(call(REPS, fp_blocks, qfp_tiles))
    t0 = time.time()
    out = call(REPS, fp_blocks, qfp_tiles)
    sync(out)
    dt = time.time() - t0
    slots = nsuper * rows * block
    return {"block": block, "rows": rows, "channels": channels,
            "vmem_mb": vmem_mb, "nsuper": nsuper, "secs": round(dt, 3),
            "slot_channels_per_sec": round(slots * channels * REPS / dt, 1)}


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    default = ("2048,8,4,0 2048,16,4,64 2048,32,4,100 4096,16,4,100 "
               "8192,8,4,64 8192,16,4,100 2048,8,8,64 4096,32,4,100")
    cfgs = [tuple(int(x) for x in c.split(","))
            for c in os.environ.get("SWEEP_CFGS", default).split()]
    for cfg in cfgs:
        try:
            print(json.dumps(run(*cfg)), flush=True)
        except Exception as ex:
            print(json.dumps({"cfg": cfg, "error": repr(ex)[:300]}),
                  flush=True)
        gc.collect()


if __name__ == "__main__":
    main()
