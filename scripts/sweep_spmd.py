#!/usr/bin/env python
"""Decompose the SPMD annotate step's device time and test alternatives.

bench.py round 2 measured the fused aa step at ~339k reads/s (= ~84M
window-lookups/s) while the standalone chunked fingerprint probe runs
~225M/s — so roughly half the step is prepare (encode+kmerize in int64)
and half is the int64 row-gather probe (1 KB/query vs the fp plane's
256 B). This sweep separates the stages and measures candidate fixes ON
HARDWARE before any production change:

  A. step parts: encode+kmerize alone; int64 probe alone; fused step.
  B. probe variants: int64 rows (current); int64 narrow rows ([*, 32]
     lanes, stride 32-W: 4x fewer bytes, 2x storage); uint16 fp rows
     (what the step would do if hits were verified host-side).
  C. kmerize variants: int64 polynomial (current); hi/lo int32 pair
     (value = hi*160000 + lo, both < 2^18: all-int32 VPU work, combined
     only at the compare).

Methodology per CLAUDE.md: one device program per measurement
(fori_loop reps with a data dependence), warm with the same static reps,
min-of-2, marginal two-point fit, device_get sync.

Usage: python scripts/sweep_spmd.py   (TPU; solo — one TPU process rule)
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import kmergutsjava_tpu  # noqa: F401  (x64 + compile cache setup)
import jax
import jax.numpy as jnp

from kmergutsjava_tpu.constants import AA_OFF_LUT, K, POW20

B, L = (int(os.environ.get("SWEEP_B", 2048)),
        int(os.environ.get("SWEEP_L", 256)))   # bench.py's aa shape
W = 16                     # probe window
N_SIGS = int(os.environ.get("SWEEP_SLOTS", 3_335_021))  # bench fixture @0.6


def sync(x):
    jax.device_get(jnp.ravel(x)[:1])


def timed(fn, r1, r2):
    """Marginal rate fit between two rep counts of one executable."""
    def t(r):
        sync(fn(r))
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            sync(fn(r))
            best = min(best, time.time() - t0)
        return best

    t1, t2 = t(r1), t(r2)
    return (r2 - r1) / max(t2 - t1, 1e-9)  # executions/sec


# ---------------------------------------------------------------- fixtures

NB = 4  # distinct batches cycled inside the rep loop: bodies must be
#         data-dependent per iteration or XLA hoists the whole pipeline
#         out of the fori_loop (round-3 first run measured exactly that:
#         "fused" rates of 1e16; only the probe bodies with per-iteration
#         value perturbation were honest)


def make_batch(key):
    sym = jax.random.randint(key, (NB, B, L), 0, 20, dtype=jnp.int32)
    lut = jnp.asarray(np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8))
    mats = jnp.take(lut, sym, axis=0)
    lens = jnp.full((B,), L, jnp.int32)
    return mats, lens


def make_dna_batch(key, b=512, l=512):
    sym = jax.random.randint(key, (NB, b, l), 0, 4, dtype=jnp.int32)
    lut = jnp.asarray(np.frombuffer(b"ACGT", np.uint8))
    mats = jnp.take(lut, sym, axis=0)
    lens = jnp.full((b,), l, jnp.int32)
    return mats, lens


def make_planes(key):
    """Random int64 k-mer plane in the overlapped row layout + the u16 fp
    and narrow-row variants of the same slots (content-independent timing;
    correctness of each layout is pinned by the test suite)."""
    stride = 128 - W
    rows = (N_SIGS - 1) // stride + 1
    ext = (rows - 1) * stride + 128
    flat = jax.random.randint(key, (ext,), 0, 1 << 40, dtype=jnp.int64)
    idx = (jnp.arange(rows)[:, None] * stride + jnp.arange(128)[None, :])
    tk64 = flat[idx]                                   # [rows, 128] int64
    tfp = (flat % jnp.int64(65535)).astype(jnp.uint16)[idx]
    stride32 = 32 - W
    rows32 = (N_SIGS - 1) // stride32 + 1
    idx32 = (jnp.arange(rows32)[:, None] * stride32
             + jnp.arange(32)[None, :])
    tk64n = flat[jnp.minimum(idx32, ext - 1)]          # [rows32, 32] int64
    thi = (flat // jnp.int64(160000)).astype(jnp.int32)[idx]
    tlo = (flat % jnp.int64(160000)).astype(jnp.int32)[idx]
    return tk64, tfp, tk64n, thi, tlo, stride, stride32


# ---------------------------------------------------------------- stages

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


def kmerize32(mats, lens):
    """hi/lo int32 pair: lo = sum(seg_k * 20^k, k<4) < 160000,
    hi = sum(seg_k * 20^(k-4), 4<=k<8) < 160000."""
    offs = jnp.asarray(AA_OFF_LUT)[mats.astype(jnp.int32)]
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


def probe64(tk, values, homes, stride, lanes=128):
    r = homes // jnp.int32(stride)
    o = homes - r * jnp.int32(stride)
    win = jnp.take(tk, r, axis=0)
    rel = jnp.arange(lanes, dtype=jnp.int32)[None, :] - o[:, None]
    match = (win == values[:, None]) & (rel >= 0) & (rel < W)
    off = jnp.min(jnp.where(match, rel, jnp.int32(W)), axis=1)
    return jnp.where(off < W, homes + off + 1, 0)


def probe_fp(tfp, qfp, homes, stride):
    r = homes // jnp.int32(stride)
    o = homes - r * jnp.int32(stride)
    win = jnp.take(tfp, r, axis=0)
    rel = jnp.arange(128, dtype=jnp.int32)[None, :] - o[:, None]
    match = (win == qfp[:, None]) & (rel >= 0) & (rel < W)
    off = jnp.min(jnp.where(match, rel, jnp.int32(W)), axis=1)
    return jnp.where(off < W, homes + off + 1, 0)


def probe_pair(thi, tlo, hi, lo, homes, stride):
    r = homes // jnp.int32(stride)
    o = homes - r * jnp.int32(stride)
    wh = jnp.take(thi, r, axis=0)
    wl = jnp.take(tlo, r, axis=0)
    rel = jnp.arange(128, dtype=jnp.int32)[None, :] - o[:, None]
    match = ((wh == hi[:, None]) & (wl == lo[:, None])
             & (rel >= 0) & (rel < W))
    off = jnp.min(jnp.where(match, rel, jnp.int32(W)), axis=1)
    return jnp.where(off < W, homes + off + 1, 0)


def main():
    out = {}
    with jax.enable_x64(True):
        k1, k2 = jax.random.split(jax.random.key(7))
        mats, lens = make_batch(k1)
        tk64, tfp, tk64n, thi, tlo, stride, stride32 = make_planes(k2)
        nwin = B * (L - K + 1)

        def rep(body):
            @partial(jax.jit, static_argnames=("r",))
            def loop(r, *args):
                def f(i, c):
                    return c + body(i, *args).astype(jnp.int32)
                return jax.lax.fori_loop(0, r, f, jnp.int32(0))
            return loop

        # --- A. stages of the current design (batch i % NB per
        # iteration: loop-variant input, nothing hoistable) ---
        def body_kmerize64(i, mats, lens):
            m = jax.lax.dynamic_index_in_dim(mats, i % NB, 0, keepdims=False)
            v, ok = kmerize64(m, lens)
            return jnp.sum((v & 0xFF).astype(jnp.int32) * ok) + i

        def body_step64(i, mats, lens, tk):
            m = jax.lax.dynamic_index_in_dim(mats, i % NB, 0, keepdims=False)
            v, ok = kmerize64(m, lens)
            flat = v.reshape(-1)
            homes = (flat % jnp.int64(N_SIGS)).astype(jnp.int32)
            s = probe64(tk, flat, homes, stride)
            return jnp.sum(s * ok.reshape(-1)) + i

        def body_step64n(i, mats, lens, tk):
            m = jax.lax.dynamic_index_in_dim(mats, i % NB, 0, keepdims=False)
            v, ok = kmerize64(m, lens)
            flat = v.reshape(-1)
            homes = ((flat % jnp.int64(N_SIGS)).astype(jnp.int32)
                     % jnp.int32((tk.shape[0] - 1) * stride32))
            s = probe64(tk, flat, homes, stride32, lanes=32)
            return jnp.sum(s * ok.reshape(-1)) + i

        def body_probe64(i, tk, values, homes):
            return jnp.sum(probe64(tk, values + i.astype(jnp.int64),
                                   homes, stride)) + i

        v0, _ = kmerize64(mats[0], lens)
        flat0 = v0.reshape(-1)
        homes0 = (flat0 % jnp.int64(N_SIGS)).astype(jnp.int32)
        qfp0 = (flat0 % jnp.int64(65535)).astype(jnp.uint16)
        hi0 = (flat0 // jnp.int64(160000)).astype(jnp.int32)
        lo0 = (flat0 % jnp.int64(160000)).astype(jnp.int32)
        homes32 = homes0 % jnp.int32((tk64n.shape[0] - 1) * stride32)

        cases = {
            "kmerize64": (rep(body_kmerize64), (mats, lens)),
            "step64_fused": (rep(body_step64), (mats, lens, tk64)),
            "step64n_fused": (rep(body_step64n), (mats, lens, tk64n)),
            "probe64_rows128": (rep(body_probe64), (tk64, flat0, homes0)),
            "probe64_rows32": (rep(lambda i, tk, v, h: jnp.sum(
                probe64(tk, v + i.astype(jnp.int64), h, stride32,
                        lanes=32)) + i), (tk64n, flat0, homes32)),
            "probe_fp_u16": (rep(lambda i, t, q, h: jnp.sum(
                probe_fp(t, q ^ i.astype(jnp.uint16), h, stride)) + i),
                (tfp, qfp0, homes0)),
            "probe_pair_i32": (rep(lambda i, th, tl, hh, ll, h: jnp.sum(
                probe_pair(th, tl, hh + i, ll, h, stride)) + i),
                (thi, tlo, hi0, lo0, homes0)),
            "kmerize32": (rep(lambda i, m, ln: (lambda hl: jnp.sum(
                (hl[0] & 0xFF) * hl[2]) + i)(kmerize32(
                    jax.lax.dynamic_index_in_dim(m, i % NB, 0,
                                                 keepdims=False), ln))),
                (mats, lens)),
        }
        # --- DNA fused step (6-frame translate + kmerize + probe) ---
        from kmergutsjava_tpu.ops.translate import translate_6frames

        kd1, kd2 = jax.random.split(jax.random.key(9))
        dmats, dlens = make_dna_batch(kd1)
        DB, DL = dmats.shape[1], dmats.shape[2]
        dwin = DL // 3 - K + 1

        def dna_body(i, mats, lens, tk, strd, lns):
            m = jax.lax.dynamic_index_in_dim(mats, i % NB, 0, keepdims=False)
            frames = jax.vmap(translate_6frames)(m, lens)
            bq = frames.shape[0]
            offs = frames.reshape(bq * 6, frames.shape[2])
            num_starts = jnp.maximum(lens // 3 - K + 1, 0)
            w = offs.shape[1] - K + 1
            values = jnp.zeros((offs.shape[0], w), dtype=jnp.int64)
            ok = jnp.ones((offs.shape[0], w), dtype=bool)
            for k in range(K):
                seg = offs[:, k:k + w].astype(jnp.int64)
                values = values + seg * int(POW20[k])
                ok = ok & (seg < 20)
            ok = ok & (jnp.arange(w) < jnp.repeat(num_starts, 6)[:, None])
            flat = values.reshape(-1)
            homes = (flat % jnp.int64(N_SIGS)).astype(jnp.int32)
            if lns < 128:
                homes = homes % jnp.int32((tk.shape[0] - 1) * strd)
            s = probe64(tk, flat, homes, strd, lanes=lns)
            return jnp.sum(s * ok.reshape(-1)) + i

        def dna_translate_only(i, mats, lens):
            m = jax.lax.dynamic_index_in_dim(mats, i % NB, 0, keepdims=False)
            frames = jax.vmap(translate_6frames)(m, lens)
            return jnp.sum(frames.astype(jnp.int32)) + i

        cases["dna_translate"] = (rep(dna_translate_only), (dmats, dlens))
        cases["dna_step64_fused"] = (rep(partial(
            dna_body, strd=stride, lns=128)), (dmats, dlens, tk64))
        cases["dna_step64n_fused"] = (rep(partial(
            dna_body, strd=stride32, lns=32)), (dmats, dlens, tk64n))

        # step variant: int32 pair end-to-end (kmerize32 + pair probe)
        def body_step_pair(i, mats, lens, th, tl):
            m = jax.lax.dynamic_index_in_dim(mats, i % NB, 0, keepdims=False)
            hi, lo, ok = kmerize32(m, lens)
            hf, lf = hi.reshape(-1), lo.reshape(-1)
            homes = ((hf.astype(jnp.int64) * 160000 + lf)
                     % jnp.int64(N_SIGS)).astype(jnp.int32)
            s = probe_pair(th, tl, hf, lf, homes, stride)
            return jnp.sum(s * ok.reshape(-1)) + i
        cases["step_pair_i32"] = (rep(body_step_pair), (mats, lens, thi, tlo))

        reps = int(os.environ.get("SWEEP_REPS", 30))
        dna_nwin = DB * 6 * ((DL // 3) - K + 1)
        for name, (loop, args) in cases.items():
            fn = lambda r: loop(r, *args)  # noqa: B023
            execs = timed(fn, reps, 4 * reps)
            per_exec = dna_nwin if name.startswith("dna_") else nwin
            out[name] = round(execs * per_exec, 1)
            if name.startswith("dna_"):
                out[name + "_reads_per_sec"] = round(execs * DB, 1)
            print(f"{name}: {out[name] / 1e6:.1f}M windows/s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
