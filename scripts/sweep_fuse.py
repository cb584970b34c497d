#!/usr/bin/env python
"""Round-3 follow-up sweep: WHY does the narrow probe lose its 2.7x when
fused behind kmerize, and what binds kmerize itself?

sweep_spmd.py (honest, loop-variant bodies) measured on TPU:
  kmerize64 alone 124M windows/s; probe64_rows32 alone 472M;
  fused wide = 69.4M == serial(124, 171) exactly; fused narrow = 44M,
  i.e. the narrow probe runs ~7x slower INSIDE the fused graph.
Hypothesis A (fusion duplication): XLA fuses the int64 polynomial into
the broadcast compare `win == values[:, None]`, recomputing the 8-term
kmerize per probe lane; 32-lane narrow triggers it while 128-lane does
not (cost heuristics). Test: jax.lax.optimization_barrier between
kmerize and probe.
Hypothesis B (encode gather): kmerize's 124M ceiling is the AA_OFF_LUT
[256]-entry 1-D gather (TPU XLA runs 1-D-operand gathers scalar). Test:
encode-only vs polynomial-only vs a one-hot matmul encode (MXU).

Usage: nohup python scripts/sweep_fuse.py > /tmp/sweep_fuse.log 2>&1 &
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

from kmergutsjava_tpu.constants import AA_OFF_LUT, K, POW20

B = int(os.environ.get("SWEEP_B", 2048))
L = int(os.environ.get("SWEEP_L", 256))
W = 16
N_SIGS = int(os.environ.get("SWEEP_SLOTS", 3_335_021))
NB = 4


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


def kmerize64(offs, lens):
    w = offs.shape[1] - K + 1
    values = jnp.zeros((offs.shape[0], w), dtype=jnp.int64)
    ok = jnp.ones((offs.shape[0], w), dtype=bool)
    for k in range(K):
        seg = offs[:, k:k + w].astype(jnp.int64)
        values = values + seg * int(POW20[k])
        ok = ok & (seg < 20)
    ok = ok & (jnp.arange(w) < (lens - K)[:, None])
    return values, ok


def probe64(tk, values, homes, stride, lanes):
    r = homes // jnp.int32(stride)
    o = homes - r * jnp.int32(stride)
    win = jnp.take(tk, r, axis=0)
    rel = jnp.arange(lanes, dtype=jnp.int32)[None, :] - o[:, None]
    match = (win == values[:, None]) & (rel >= 0) & (rel < W)
    off = jnp.min(jnp.where(match, rel, jnp.int32(W)), axis=1)
    return jnp.where(off < W, homes + off + 1, 0)


def main():
    out = {}
    with jax.enable_x64(True):
        k1, k2 = jax.random.split(jax.random.key(7))
        sym = jax.random.randint(k1, (NB, B, L), 0, 20, dtype=jnp.int32)
        lut = jnp.asarray(np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8))
        mats = jnp.take(lut, sym, axis=0)
        lens = jnp.full((B,), L, jnp.int32)
        nwin = B * (L - K + 1)

        stride32, lanes32 = 32 - W, 32
        rows32 = (N_SIGS - 1) // stride32 + 1
        stride128, lanes128 = 128 - W, 128
        rows128 = (N_SIGS - 1) // stride128 + 1
        kk = jax.random.key(3)
        flat = jax.random.randint(kk, ((rows128 - 1) * stride128 + 128,),
                                  0, 1 << 40, dtype=jnp.int64)
        idx32 = (jnp.arange(rows32)[:, None] * stride32
                 + jnp.arange(32)[None, :])
        tk32 = flat[jnp.minimum(idx32, flat.shape[0] - 1)]
        idx128 = (jnp.arange(rows128)[:, None] * stride128
                  + jnp.arange(128)[None, :])
        tk128 = flat[idx128]

        def rep(body):
            @partial(jax.jit, static_argnames=("r",))
            def loop(r, *args):
                def f(i, c):
                    return c + body(i, *args).astype(jnp.int32)
                return jax.lax.fori_loop(0, r, f, jnp.int32(0))
            return loop

        def pick(i, mats):
            return jax.lax.dynamic_index_in_dim(mats, i % NB, 0,
                                                keepdims=False)

        # --- B: encode / kmerize stages ---
        def enc_lut(i, mats, lens):
            m = pick(i, mats)
            offs = jnp.asarray(AA_OFF_LUT)[m.astype(jnp.int32)]
            return jnp.sum(offs.astype(jnp.int32)) + i

        def enc_onehot(i, mats, lens):
            m = pick(i, mats)
            a = m.astype(jnp.int32) - 65  # 'A'..'Z' -> 0..25; clamp others
            a = jnp.clip(a, 0, 25)
            oh = jax.nn.one_hot(a, 26, dtype=jnp.bfloat16)
            tbl = jnp.asarray(AA_OFF_LUT[65:91].astype(np.float32),
                              dtype=jnp.bfloat16)
            offs = jnp.dot(oh, tbl).astype(jnp.int32)
            # non-letter bytes (none in this batch) would need the LUT's
            # invalid handling; timing-only here
            return jnp.sum(offs) + i

        def kmer_only(i, offs_nb, lens):
            offs = pick(i, offs_nb)
            v, ok = kmerize64(offs, lens)
            return jnp.sum((v & 0xFF).astype(jnp.int32) * ok) + i

        offs_nb = jnp.asarray(AA_OFF_LUT)[mats.astype(jnp.int32)]

        # --- A: fused step with/without an optimization barrier ---
        def step(i, mats, lens, tk, stride, lanes, barrier):
            m = pick(i, mats)
            offs = jnp.asarray(AA_OFF_LUT)[m.astype(jnp.int32)]
            v, ok = kmerize64(offs, lens)
            flat_v = v.reshape(-1)
            homes = (flat_v % jnp.int64(N_SIGS)).astype(jnp.int32)
            homes = homes % jnp.int32((tk.shape[0] - 1) * stride)
            if barrier:
                flat_v, homes = jax.lax.optimization_barrier(
                    (flat_v, homes))
            s = probe64(tk, flat_v, homes, stride, lanes)
            return jnp.sum(s * ok.reshape(-1)) + i

        cases = {
            "enc_lut": (rep(enc_lut), (mats, lens)),
            "enc_onehot": (rep(enc_onehot), (mats, lens)),
            "kmer_only": (rep(kmer_only), (offs_nb, lens)),
            "step_n32": (rep(partial(step, stride=stride32, lanes=32,
                                     barrier=False)), (mats, lens, tk32)),
            "step_n32_barrier": (rep(partial(step, stride=stride32,
                                             lanes=32, barrier=True)),
                                 (mats, lens, tk32)),
            "step_w128": (rep(partial(step, stride=stride128, lanes=128,
                                      barrier=False)), (mats, lens, tk128)),
            "step_w128_barrier": (rep(partial(step, stride=stride128,
                                              lanes=128, barrier=True)),
                                  (mats, lens, tk128)),
        }
        reps = int(os.environ.get("SWEEP_REPS", 30))
        for name, (loop, args) in cases.items():
            fn = lambda r: loop(r, *args)  # noqa: B023
            execs = timed(fn, reps, 4 * reps)
            out[name] = round(execs * nwin, 1)
            print(f"{name}: {out[name] / 1e6:.1f}M windows/s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
