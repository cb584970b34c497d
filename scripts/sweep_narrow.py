#!/usr/bin/env python
"""Narrow-row gather ladder (follow-up to sweep_spmd.py's discovery).

sweep_spmd.py measured the [rows, 32]-lane int64 overlapped layout at
471M windows/s vs 171M/s for the production 128-lane layout — the gather
is operand-SIZE bound (scripts/sweep_sparse.py), and narrow rows shrink
both the operand and the bytes per query (the W=16 window needs only
2*W-ish lanes). This sweep maps the ladder before any production change:

  1. lane width ladder for the int64 k-mer plane (spmd probe): 32/64/128
  2. lane width ladder for the uint16 fp plane (xla sparse probe)
  3. 512MB-scale planes: narrow rows vs the round-2 chunked scan — if
     narrow rows alone beat 224M/s at HBM scale, the sparse path gets
     faster AND simpler
  4. honest kmerize/step rates (sweep_spmd.py's were loop-hoisted:
     the batch now rotates via dynamic_index_in_dim like bench.py)

Storage cost of lanes L with window W: L/(L-W) bytes per slot unit —
32 lanes @ W=16 = 2x (vs 1.14x at 128). Capacity/speed trade documented
in docs/performance.md once measured.

Usage: python scripts/sweep_narrow.py   (TPU; solo)

ROUND-3 METHODOLOGY WARNING: the rep loops in this script perturb only
the QUERY fingerprints and hold HOMES loop-invariant. XLA hoists the
(loop-invariant) gather out of the fori_loop whenever the gathered
result is small enough to materialize, so narrow-lane rates measured
here are inflated up to ~7x (543M/s vs the honest 74M at 512MB/32
lanes). Honest harnesses index one of NB precomputed (query, home)
variants per iteration — see scripts/sweep_fuse2.py / sweep_fuse3.py /
sweep_fuse4.py and the corrected bench_tpu_sparse_big in bench.py.
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

B, L = 2048, 256
W = 16
N_SIGS = 3_335_021
N_BATCHES = 8


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


def probe(tbl, q, homes, stride, lanes):
    r = homes // jnp.int32(stride)
    o = homes - r * jnp.int32(stride)
    win = jnp.take(tbl, r, axis=0)
    rel = jnp.arange(lanes, dtype=jnp.int32)[None, :] - o[:, None]
    match = (win == q[:, None]) & (rel >= 0) & (rel < W)
    off = jnp.min(jnp.where(match, rel, jnp.int32(W)), axis=1)
    return jnp.where(off < W, homes + off + 1, 0)


def kmerize64(mats, lens):
    offs = jnp.asarray(AA_OFF_LUT)[mats.astype(jnp.int32)]
    w = offs.shape[1] - K + 1
    values = jnp.zeros((offs.shape[0], w), dtype=jnp.int64)
    ok = jnp.ones((offs.shape[0], w), dtype=bool)
    for k in range(K):
        seg = offs[:, k:k + w].astype(jnp.int64)
        values = values + seg * int(POW20[k])
        ok = ok & (seg < 20)
    ok = ok & (jnp.arange(w) < (lens - K)[:, None])
    return values, ok


def main():
    out = {}
    reps = int(os.environ.get("SWEEP_REPS", 30))
    with jax.enable_x64(True):
        keys = jax.random.split(jax.random.key(11), 8)
        nwin = B * (L - K + 1)
        n_q = nwin

        def rep(body):
            @partial(jax.jit, static_argnames=("r",))
            def loop(r, *args):
                def f(i, c):
                    return c + body(i, *args).astype(jnp.int32)
                return jax.lax.fori_loop(0, r, f, jnp.int32(0))
            return loop

        # --- 1+2: lane ladder at the spmd table size (bench fixture) ---
        flat64 = jax.random.randint(keys[0], (N_SIGS + 128,), 0, 1 << 40,
                                    dtype=jnp.int64)
        q64 = jax.random.choice(keys[1], flat64, (n_q,))
        for lanes in (32, 64, 128):
            stride = lanes - W
            rows = (N_SIGS - 1) // stride + 1
            idx = (jnp.arange(rows)[:, None] * stride
                   + jnp.arange(lanes)[None, :])
            homes = (jax.random.bits(keys[2], (n_q,), dtype=jnp.uint32)
                     % jnp.uint32((rows - 1) * stride)).astype(jnp.int32)
            t64 = flat64[idx]
            loop = rep(lambda i, t, q, h, s=stride, ln=lanes: jnp.sum(
                probe(t, q + i.astype(jnp.int64), h, s, ln)))
            rate = timed(lambda r: loop(r, t64, q64, homes),
                         reps, 4 * reps) * n_q
            out[f"i64_lanes{lanes}"] = round(rate, 1)
            tfp = (flat64 % jnp.int64(65535)).astype(jnp.uint16)[idx]
            qfp = (q64 % jnp.int64(65535)).astype(jnp.uint16)
            loopf = rep(lambda i, t, q, h, s=stride, ln=lanes: jnp.sum(
                probe(t, q ^ i.astype(jnp.uint16), h, s, ln)))
            ratef = timed(lambda r: loopf(r, tfp, qfp, homes),
                          reps, 4 * reps) * n_q
            out[f"u16_lanes{lanes}"] = round(ratef, 1)
            print(f"lanes={lanes} (stride {stride}): i64 {rate/1e6:.1f}M/s, "
                  f"u16 {ratef/1e6:.1f}M/s", flush=True)

        # --- 3: HBM-scale u16 plane, narrow vs wide (content-free) ---
        n_q_big = 4_000_000
        for lanes, mb in ((32, 512), (64, 512), (128, 512)):
            stride = lanes - W
            rows = int(mb * 2**20) // (lanes * 2)
            tbig = jax.random.bits(keys[3], (rows, lanes), dtype=jnp.uint16)
            qb = jax.random.bits(keys[4], (n_q_big,), dtype=jnp.uint16)
            hb = (jax.random.bits(keys[5], (n_q_big,), dtype=jnp.uint32)
                  % jnp.uint32((rows - 1) * stride)).astype(jnp.int32)
            loop = rep(lambda i, t, q, h, s=stride, ln=lanes: jnp.sum(
                probe(t, q ^ i.astype(jnp.uint16), h, s, ln)))
            rate = timed(lambda r: loop(r, tbig, qb, hb),
                         reps // 3, reps) * n_q_big
            slots = rows * stride
            out[f"u16_big512_lanes{lanes}"] = round(rate, 1)
            out[f"u16_big512_lanes{lanes}_slots"] = slots
            print(f"512MB u16 lanes={lanes}: {rate/1e6:.1f}M/s "
                  f"({slots/1e6:.0f}M slots)", flush=True)
            del tbig

        # --- 4: honest kmerize + fused step (batch rotates with i) ---
        sym = jax.random.randint(keys[6], (N_BATCHES, B, L), 0, 20,
                                 dtype=jnp.int32)
        lut = jnp.asarray(np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8))
        mats_all = jnp.take(lut, sym, axis=0)
        lens = jnp.full((B,), L, jnp.int32)

        def body_kmerize(i, mats_all, lens):
            m = jax.lax.dynamic_index_in_dim(mats_all, i % N_BATCHES, 0,
                                             keepdims=False)
            v, ok = kmerize64(m, lens)
            return jnp.sum((v & 0xFF).astype(jnp.int32) * ok)

        loop = rep(body_kmerize)
        rate = timed(lambda r: loop(r, mats_all, lens), reps, 4 * reps) * nwin
        out["kmerize64_honest"] = round(rate, 1)
        print(f"kmerize64 honest: {rate/1e6:.1f}M windows/s", flush=True)

        def kmerize_pair(m, lens):
            """hi/lo int32 halves (each < 160000 = 20^4): all-int32 VPU
            work; the int64 value exists only as ONE combine at the end."""
            offs = jnp.asarray(AA_OFF_LUT)[m.astype(jnp.int32)]
            w = offs.shape[1] - K + 1
            lo = jnp.zeros((offs.shape[0], w), dtype=jnp.int32)
            hi = jnp.zeros((offs.shape[0], w), dtype=jnp.int32)
            ok = jnp.ones((offs.shape[0], w), dtype=bool)
            for k in range(K):
                seg = offs[:, k:k + w]
                if k < 4:
                    lo = lo + seg * int(POW20[k])
                else:
                    hi = hi + seg * int(POW20[k - 4])
                ok = ok & (seg < 20)
            ok = ok & (jnp.arange(w) < (lens - K)[:, None])
            return hi, lo, ok

        def body_kmerize_pair(i, mats_all, lens):
            m = jax.lax.dynamic_index_in_dim(mats_all, i % N_BATCHES, 0,
                                             keepdims=False)
            hi, lo, ok = kmerize_pair(m, lens)
            v = hi.astype(jnp.int64) * jnp.int64(160000) + lo
            return jnp.sum((v & 0xFF).astype(jnp.int32) * ok)

        loop = rep(body_kmerize_pair)
        rate = timed(lambda r: loop(r, mats_all, lens), reps, 4 * reps) * nwin
        out["kmerize_pair_honest"] = round(rate, 1)
        print(f"kmerize pair honest: {rate/1e6:.1f}M windows/s", flush=True)

        for variant in ("k64", "pair"):
            for lanes in (32, 128):
                stride = lanes - W
                rows = (N_SIGS - 1) // stride + 1
                idx = (jnp.arange(rows)[:, None] * stride
                       + jnp.arange(lanes)[None, :])
                t64 = flat64[idx]

                def body_step(i, mats_all, lens, t64, s=stride, ln=lanes,
                              nrows=rows, var=variant):
                    m = jax.lax.dynamic_index_in_dim(mats_all,
                                                     i % N_BATCHES, 0,
                                                     keepdims=False)
                    if var == "k64":
                        v, ok = kmerize64(m, lens)
                        fv = v.reshape(-1)
                    else:
                        hi, lo, ok = kmerize_pair(m, lens)
                        fv = (hi.astype(jnp.int64) * jnp.int64(160000)
                              + lo).reshape(-1)
                    homes = jnp.minimum(
                        (fv % jnp.int64(N_SIGS)).astype(jnp.int32),
                        jnp.int32((nrows - 1) * s - 1))
                    sl = probe(t64, fv, homes, s, ln)
                    return jnp.sum(sl * ok.reshape(-1))

                loop = rep(body_step)
                rate = timed(lambda r: loop(r, mats_all, lens, t64),
                             reps, 4 * reps) * nwin
                out[f"step_{variant}_lanes{lanes}"] = round(rate, 1)
                print(f"fused step {variant} lanes={lanes}: "
                      f"{rate/1e6:.1f}M windows/s "
                      f"(= {rate/(L-K+1)/1e3:.0f}k reads/s)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
