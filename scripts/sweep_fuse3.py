#!/usr/bin/env python
"""Round-3 sweep 4: honesty audit of the u16 sparse gather ladder + the
one-hot DNA translate.

sweep_fuse2.py proved the 'narrow-lane' int64 rates of earlier sweeps
were loop-hoisting fiction (homes fixed across reps -> XLA materializes
the loop-invariant [N, lanes] gather once when it is small enough, and
only the compare re-runs; honest narrow32 = 70M, honest wide128 = 170M).
The round-2 u16 narrow sweeps (scripts/sweep_narrow.py, sparse_big in
bench.py) used the same fixed-homes xor-perturbation form, so the
543M/s narrow32 figure and the derived production default (XlaLookup
rows1 narrow lanes) need re-measurement with per-iteration HOME
variation (NB precomputed home arrays — no per-iter mod tax).

Also: DNA translate with one-hot (MXU) LUTs for dna codes, revcomp
codes, and the codon table, vs the current gather form, and the full
DNA fused step with one-hot everything + wide probe.

Usage: nohup python scripts/sweep_fuse3.py > /tmp/sweep_fuse3.log 2>&1 &
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

from kmergutsjava_tpu.constants import (CODON_AA_OFF, COMPL_DNA_CODE_LUT,
                                        DNA_CODE_LUT, INVALID_AA, K, POW20,
                                        TERMINATOR_AA)

W = 16
NB = 4
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


def onehot_lut(bytes_i32, lut, width=256):
    oh = jax.nn.one_hot(bytes_i32, width, dtype=jnp.bfloat16)
    tbl = jnp.asarray(np.asarray(lut, np.float32)[:width],
                      dtype=jnp.bfloat16)
    return jnp.dot(oh, tbl, preferred_element_type=jnp.float32).astype(
        jnp.uint8)


def probe_u16(tfp, qfp, homes, stride, lanes):
    r = homes // jnp.int32(stride)
    o = homes - r * jnp.int32(stride)
    win = jnp.take(tfp, r, axis=0)
    rel = jnp.arange(lanes, dtype=jnp.int32)[None, :] - o[:, None]
    match = ((win == qfp[:, None]) & (rel >= 0) & (rel < W))
    off = jnp.min(jnp.where(match, rel, jnp.int32(W)), axis=1)
    return off


def main():
    out = {}
    with jax.enable_x64(True):
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
        per_case = {}
        # --- u16 probe ladder, honest homes ---
        for mb in (13, 512):
            for lanes in (32, 128):
                stride = lanes - W
                rows = int(mb * 2**20) // (2 * lanes)
                k1, k2, k3 = jax.random.split(jax.random.key(mb + lanes), 3)
                with jax.enable_x64(False):
                    tfp = jax.random.bits(k1, (rows, lanes),
                                          dtype=jnp.uint16)
                    qfp_nb = jax.random.bits(k2, (NB, N_Q),
                                             dtype=jnp.uint16)
                    homes_nb = jax.random.randint(
                        k3, (NB, N_Q), 0, (rows - 1) * stride,
                        dtype=jnp.int32)

                def body(i, tfp, qfp_nb, homes_nb, stride=stride,
                         lanes=lanes):
                    q = pick(i, qfp_nb)
                    h = pick(i, homes_nb)
                    return jnp.sum(probe_u16(tfp, q, h, stride, lanes))

                name = f"u16_{mb}mb_l{lanes}"
                cases[name] = (rep(body), (tfp, qfp_nb, homes_nb))
                per_case[name] = N_Q

        # --- DNA translate, one-hot form ---
        def frames_oh(codes, length):
            lpad = codes.shape[-1]
            m = lpad // 3
            j = jnp.arange(m)
            frames = []
            for f in range(3):
                pos = f + 3 * j
                c1 = jnp.take(codes, pos, mode="fill", fill_value=4)
                c2 = jnp.take(codes, pos + 1, mode="fill", fill_value=4)
                c3 = jnp.take(codes, pos + 2, mode="fill", fill_value=4)
                codon_ok = (c1 < 4) & (c2 < 4) & (c3 < 4)
                idx = (c1.astype(jnp.int32) * 16 + c2.astype(jnp.int32) * 4
                       + c3.astype(jnp.int32))
                aa = onehot_lut(jnp.where(codon_ok, idx, 0),
                                np.asarray(CODON_AA_OFF), width=64)
                aa = jnp.where(codon_ok, aa, INVALID_AA)
                p = jnp.maximum(length - f, 0) // 3
                aa = jnp.where(j < p, aa, TERMINATOR_AA)
                frames.append(aa.astype(jnp.uint8))
            return jnp.stack(frames)

        def translate6_oh(ascii_u8, length):
            codes = onehot_lut(ascii_u8.astype(jnp.int32),
                               np.asarray(DNA_CODE_LUT))
            rcl = onehot_lut(ascii_u8.astype(jnp.int32),
                             np.asarray(COMPL_DNA_CODE_LUT))
            rc = jnp.roll(jnp.flip(rcl, -1), -(ascii_u8.shape[-1] - length))
            return jnp.concatenate([frames_oh(codes, length),
                                    frames_oh(rc, length)], axis=0)

        DB, DL = 512, 512
        kd = jax.random.key(9)
        dsym = jax.random.randint(kd, (NB, DB, DL), 0, 4, dtype=jnp.int32)
        dlut = jnp.asarray(np.frombuffer(b"ACGT", np.uint8))
        dmats = jnp.take(dlut, dsym, axis=0)
        dlens = jnp.full((DB,), DL, jnp.int32)
        dna_nwin = DB * 6 * (DL // 3 - K + 1)

        # exactness vs the production translate
        from kmergutsjava_tpu.ops.translate import translate_6frames

        want = np.asarray(jax.vmap(translate_6frames)(dmats[0], dlens))
        got = np.asarray(jax.vmap(translate6_oh)(dmats[0], dlens))
        out["translate_oh_exact"] = bool(np.array_equal(want, got))
        print(f"translate_oh_exact: {out['translate_oh_exact']}",
              flush=True)

        def dna_tr_oh(i, mats, lens):
            m = pick(i, mats)
            fr = jax.vmap(translate6_oh)(m, lens)
            return jnp.sum(fr.astype(jnp.int32)) + i

        cases["dna_translate_oh"] = (rep(dna_tr_oh), (dmats, dlens))
        per_case["dna_translate_oh"] = dna_nwin

        # --- full DNA fused step, one-hot translate + wide probe ---
        N_SIGS = int(os.environ.get("SWEEP_SLOTS", 3_335_021))
        stride128 = 128 - W
        rows128 = (N_SIGS - 1) // stride128 + 1
        kt = jax.random.key(3)
        flat = jax.random.randint(kt, ((rows128 - 1) * stride128 + 128,),
                                  0, 1 << 40, dtype=jnp.int64)
        idx128 = (jnp.arange(rows128)[:, None] * stride128
                  + jnp.arange(128)[None, :])
        tk128 = flat[idx128]

        def probe64(tk, values, homes, stride, lanes):
            r = homes // jnp.int32(stride)
            o = homes - r * jnp.int32(stride)
            win = jnp.take(tk, r, axis=0)
            rel = jnp.arange(lanes, dtype=jnp.int32)[None, :] - o[:, None]
            match = (win == values[:, None]) & (rel >= 0) & (rel < W)
            off = jnp.min(jnp.where(match, rel, jnp.int32(W)), axis=1)
            return jnp.where(off < W, homes + off + 1, 0)

        def dna_step_oh(i, mats, lens, tk):
            m = pick(i, mats)
            frames = jax.vmap(translate6_oh)(m, lens)
            bq = frames.shape[0]
            offs = frames.reshape(bq * 6, frames.shape[2])
            w = offs.shape[1] - K + 1
            values = jnp.zeros((offs.shape[0], w), dtype=jnp.int64)
            ok = jnp.ones((offs.shape[0], w), dtype=bool)
            for k in range(K):
                seg = offs[:, k:k + w].astype(jnp.int64)
                values = values + seg * int(POW20[k])
                ok = ok & (seg < 20)
            num_starts = jnp.maximum(lens // 3 - K + 1, 0)
            ok = ok & (jnp.arange(w) < jnp.repeat(num_starts, 6)[:, None])
            flat_v = values.reshape(-1)
            homes = (flat_v % jnp.int64(N_SIGS)).astype(jnp.int32)
            homes = homes % jnp.int32((tk.shape[0] - 1) * stride128)
            s = probe64(tk, flat_v, homes, stride128, 128)
            return jnp.sum(s * ok.reshape(-1)) + i

        cases["dna_step_oh_128"] = (rep(dna_step_oh), (dmats, dlens, tk128))
        per_case["dna_step_oh_128"] = dna_nwin

        reps = int(os.environ.get("SWEEP_REPS", 20))
        for name, (loop, args) in cases.items():
            fn = lambda r: loop(r, *args)  # noqa: B023
            execs = timed(fn, reps, 4 * reps)
            out[name] = round(execs * per_case[name], 1)
            if name.startswith("dna_step"):
                out[name + "_reads_per_sec"] = round(execs * DB, 1)
            print(f"{name}: {out[name] / 1e6:.1f}M/s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
