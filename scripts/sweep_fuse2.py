#!/usr/bin/env python
"""Round-3 sweep 3: (a) one-hot-matmul encode inside the REAL fused step
(sweep_fuse.py measured the encode LUT gather alone at 124M elements/s —
the whole kmerize ceiling — and a one-hot bf16 matmul encode at ~20B,
160x); (b) HONEST probe isolation with per-iteration HOME variation via
NB precomputed home arrays (no per-iter mod tax, no loop-invariant
gather); (c) one-hot codon LUT for the 6-frame translate.

Usage: nohup python scripts/sweep_fuse2.py > /tmp/sweep_fuse2.log 2>&1 &
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


def onehot_lut(bytes_u8, lut_u8):
    """LUT via one-hot bf16 matmul (MXU): exact for lut values < 256
    (single nonzero product per row; f32 accumulation)."""
    oh = jax.nn.one_hot(bytes_u8.astype(jnp.int32), 256, dtype=jnp.bfloat16)
    tbl = jnp.asarray(np.asarray(lut_u8, np.float32), dtype=jnp.bfloat16)
    return jnp.dot(oh, tbl, preferred_element_type=jnp.float32).astype(
        jnp.uint8)


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
        n = B * (L - K + 1)

        def make_plane(stride, lanes):
            rows = (N_SIGS - 1) // stride + 1
            kk = jax.random.key(3)
            flat = jax.random.randint(kk, ((rows - 1) * stride + lanes,),
                                      0, 1 << 40, dtype=jnp.int64)
            idx = (jnp.arange(rows)[:, None] * stride
                   + jnp.arange(lanes)[None, :])
            return flat[jnp.minimum(idx, flat.shape[0] - 1)], rows

        planes = {ln: make_plane(ln - W, ln) for ln in (32, 64, 128)}

        # honest probe inputs: NB precomputed (values, homes) variants
        kv, kh = jax.random.split(jax.random.key(5))
        vals_nb = jax.random.randint(kv, (NB, n), 0, 1 << 40,
                                     dtype=jnp.int64)
        homes_nb = {ln: jax.random.randint(
            kh, (NB, n), 0, (planes[ln][1] - 1) * (ln - W),
            dtype=jnp.int32) for ln in (32, 64, 128)}

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

        cases = {}
        for ln in (32, 64, 128):
            tk, _rows = planes[ln]

            def probe_body(i, tk, vals_nb, homes_nb, ln=ln):
                v = pick(i, vals_nb)
                h = pick(i, homes_nb)
                return jnp.sum(probe64(tk, v, h, ln - W, ln))

            cases[f"probe_h{ln}"] = (rep(probe_body),
                                     (tk, vals_nb, homes_nb[ln]))

        def step_oh(i, mats, lens, tk, stride, lanes):
            m = pick(i, mats)
            offs = onehot_lut(m, AA_OFF_LUT)
            v, ok = kmerize64(offs, lens)
            flat_v = v.reshape(-1)
            homes = (flat_v % jnp.int64(N_SIGS)).astype(jnp.int32)
            homes = homes % jnp.int32((tk.shape[0] - 1) * stride)
            s = probe64(tk, flat_v, homes, stride, lanes)
            return jnp.sum(s * ok.reshape(-1)) + i

        for ln in (32, 128):
            cases[f"step_oh_{ln}"] = (
                rep(partial(step_oh, stride=ln - W, lanes=ln)),
                (mats, lens, planes[ln][0]))

        # one-hot encode alone (exactness + rate), and correctness check
        def enc_oh(i, mats, lens):
            m = pick(i, mats)
            return jnp.sum(onehot_lut(m, AA_OFF_LUT).astype(jnp.int32)) + i

        cases["enc_oh"] = (rep(enc_oh), (mats, lens))
        want = np.asarray(jnp.asarray(AA_OFF_LUT)[mats[0].astype(jnp.int32)])
        got = np.asarray(onehot_lut(mats[0], AA_OFF_LUT))
        out["enc_oh_exact"] = bool(np.array_equal(want, got))
        print(f"enc_oh_exact: {out['enc_oh_exact']}", flush=True)

        # DNA translate: current LUT form vs one-hot codon form
        from kmergutsjava_tpu.ops.translate import translate_6frames

        kd = jax.random.key(9)
        dsym = jax.random.randint(kd, (NB, 512, 512), 0, 4, dtype=jnp.int32)
        dlut = jnp.asarray(np.frombuffer(b"ACGT", np.uint8))
        dmats = jnp.take(dlut, dsym, axis=0)
        dlens = jnp.full((512,), 512, jnp.int32)

        def dna_tr(i, mats, lens):
            m = pick(i, mats)
            fr = jax.vmap(translate_6frames)(m, lens)
            return jnp.sum(fr.astype(jnp.int32)) + i

        cases["dna_translate_cur"] = (rep(dna_tr), (dmats, dlens))

        reps = int(os.environ.get("SWEEP_REPS", 30))
        for name, (loop, args) in cases.items():
            fn = lambda r: loop(r, *args)  # noqa: B023
            execs = timed(fn, reps, 4 * reps)
            per = 512 * 6 * (512 // 3 - K + 1) if name.startswith("dna_") \
                else nwin
            out[name] = round(execs * per, 1)
            print(f"{name}: {out[name] / 1e6:.1f}M windows/s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
