#!/usr/bin/env python
"""Stage-resolve the fused SPMD aa step; test an i64-free prepare (TPU).

The fused aa step measures ~227M windows/s with the probe's isolated
gather at ~270M/s — close, but the step also packs every window into an
int64 k-mer value (ops/kmerize.kmer_windows: 8 multiply-adds in int64,
which the VPU emulates with multi-op 32-bit sequences). Since the
fingerprint-candidate protocol (round 3) means the device only ever
needs home = value %% num_sigs and qfp = value %% 65535, both are
computable in PURE int32 modular arithmetic:

    home = (sum_k off_k * (20^k mod m)) mod m     (partial sum < 2^31
    qfp  = (sum_k off_k * (20^k mod 65535)) mod 65535   for m < 14.1M)

Stages measured (honest: NB input variants cycled per rep, marginal
two-point fit, device_get sync):
  prep     encode one-hot LUT + int64 kmer_windows      (current)
  prep32   encode + int32 modular (home, qfp) windows   (candidate)
  probe    qfp/home compute from int64 values + row gather + first-match
  probefp  row gather + first-match from precomputed (qfp, home)
  full     the production fused step (mesh (1,1)) for reference

Usage: nohup python scripts/sweep_fuse5.py > /tmp/sweep_fuse5.log 2>&1 &
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

import kmergutsjava_tpu  # noqa: F401
from kmergutsjava_tpu.constants import AA_OFF_LUT, K
from kmergutsjava_tpu.ops.encode import byte_lut
from kmergutsjava_tpu.ops.kmerize import kmer_windows

B = int(os.environ.get("SWEEP_B", 2048))
L = int(os.environ.get("SWEEP_L", 256))
REPS = int(os.environ.get("SWEEP_REPS", 8))
NB = 2
N_SIGS = int(os.environ.get("SWEEP_SIGS", 2_000_000))
W = 16
FP_MOD = 65535
# SWEEP_X64=1 measures under x64 ENABLED — the production engine's mode
# (the package enables x64 globally; bench.py's enable_x64(False) secretly
# turned the int64 kmer packing into int32 at trace time, so its spmd
# rates measured an i32-truncated pipeline, not production)
X64 = os.environ.get("SWEEP_X64") == "1"


def sync(x):
    jax.device_get(jnp.ravel(x)[:1])


def pick(i, a):
    return jax.lax.dynamic_index_in_dim(a, i % NB, 0, keepdims=False)


def rep_loop(body):
    @partial(jax.jit, static_argnames=("r",))
    def loop(r, *args):
        def f(i, c):
            return c + body(i, *args).astype(jnp.int32)
        return jax.lax.fori_loop(0, r, f, jnp.int32(0))
    return loop


def timed(fn, r):
    sync(fn(r))
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        sync(fn(r))
        best = min(best, time.time() - t0)
    return best


def marginal(fn, reps, work):
    t1, t2 = timed(fn, reps), timed(fn, 4 * reps)
    return work * 3 * reps / max(t2 - t1, 1e-9)


def _prep_body(i, mats, lens, *, num_sigs):
    m = pick(i, mats)
    offs = byte_lut(np.asarray(AA_OFF_LUT), m.astype(jnp.int32))
    values, ok = kmer_windows(offs, lens - K)
    flat = values.reshape(-1)
    homes = (flat % num_sigs).astype(jnp.int32)
    qfp = (flat % jnp.asarray(FP_MOD, flat.dtype)).astype(jnp.int32)
    return (jnp.sum(homes) + jnp.sum(qfp)
            + jnp.sum(ok.astype(jnp.int32)))


def _windows32(offs, num_starts, mod):
    """int32 modular window accumulation: sum_k off[:, j+k] * (20^k % mod),
    one final %% mod. Exact for mod < 2^31 / (8*19)."""
    b, n = offs.shape
    w = n - K + 1
    acc = jnp.zeros((b, w), jnp.int32)
    ok = jnp.ones((b, w), bool)
    o32 = offs.astype(jnp.int32)
    for k in range(K):
        c = pow(20, K - 1 - k, mod)  # POW20 packs big-endian (ref :274-292)
        seg = o32[:, k: k + w]
        acc = acc + seg * jnp.int32(c)
        ok = ok & (seg < 20)
    jj = jnp.arange(w, dtype=jnp.int32)[None, :]
    ok = ok & (jj < num_starts[:, None].astype(jnp.int32))
    return acc % jnp.int32(mod), ok


def _prep32_body(i, mats, lens, *, num_sigs):
    m = pick(i, mats)
    offs = byte_lut(np.asarray(AA_OFF_LUT), m.astype(jnp.int32))
    homes, ok = _windows32(offs, lens - K, num_sigs)
    qfp, _ = _windows32(offs, lens - K, FP_MOD)
    return jnp.sum(homes) + jnp.sum(qfp) + jnp.sum(ok.astype(jnp.int32))


def _gather_first(tk, qfp_u16, homes, stride, probe_window):
    big = jnp.int32(probe_window)
    r = homes // jnp.int32(stride)
    o = homes - r * jnp.int32(stride)
    win = jnp.take(tk, r, axis=0)
    rel = jnp.arange(128, dtype=jnp.int32)[None, :] - o[:, None]
    match = (win == qfp_u16[:, None]) & (rel >= 0) & (rel < probe_window)
    off = jnp.min(jnp.where(match, rel, big), axis=1)
    found = off < big
    return jnp.sum(jnp.where(found, homes + off + 1, 0))


def _probe_body(i, vals_nb, tk, *, stride, probe_window, num_sigs):
    flat = pick(i, vals_nb)
    homes = (flat % num_sigs).astype(jnp.int32)
    qfp = (flat % jnp.asarray(FP_MOD, flat.dtype)).astype(jnp.uint16)
    return _gather_first(tk, qfp, homes, stride, probe_window)


def _probefp_body(i, qfp_nb, homes_nb, tk, *, stride, probe_window):
    return _gather_first(tk, pick(i, qfp_nb).astype(jnp.uint16),
                         pick(i, homes_nb), stride, probe_window)


def main():
    from kmergutsjava_tpu.formats.kmer_table import build_table
    from kmergutsjava_tpu.parallel.annotate_step import (
        make_sharded_annotate_step)
    from kmergutsjava_tpu.parallel.mesh import make_mesh
    from kmergutsjava_tpu.parallel.sharded_lookup import shard_table_planes

    print(json.dumps({"backend": jax.default_backend(), "b": B, "l": L,
                      "reps": REPS}), flush=True)
    rng = np.random.default_rng(3)
    from kmergutsjava_tpu.constants import MAX_ENCODED

    kmers = rng.choice(MAX_ENCODED, size=N_SIGS, replace=False).astype(
        np.int64)
    table = build_table(kmers, np.zeros(N_SIGS, np.int32),
                        np.zeros(N_SIGS, np.int32),
                        np.zeros(N_SIGS, np.int32),
                        np.ones(N_SIGS, np.float32))
    if table.max_probe is None:
        table.compute_max_probe()
    pw = max(8, table.max_probe)
    planes = shard_table_planes(table, 1, pw)
    num_sigs = table.num_sigs
    n_win = B * (L - K + 1)

    with jax.enable_x64(X64):
        tk = jax.device_put(planes["fp"][0])
        stride = planes["stride"]
        aa = jnp.asarray(np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8))
        sym = jax.random.randint(jax.random.key(5), (NB, B, L), 0, 20,
                                 dtype=jnp.int32)
        mats = jnp.take(aa, sym, axis=0)
        lens = jnp.full((B,), L, jnp.int32)
        vals_nb = jax.random.randint(jax.random.key(7), (NB, n_win),
                                     0, 1 << 30, dtype=jnp.int32
                                     ).astype(jnp.int64) * 23 + 7
        homes_nb = (jax.random.randint(jax.random.key(9), (NB, n_win), 0,
                                       num_sigs, dtype=jnp.int32))
        qfp_nb = (jax.random.bits(jax.random.key(11), (NB, n_win),
                                  dtype=jnp.uint16) % jnp.uint16(FP_MOD)
                  ).astype(jnp.int32)

        for name, body, args in [
            ("prep", partial(_prep_body, num_sigs=num_sigs), (mats, lens)),
            ("prep32", partial(_prep32_body, num_sigs=num_sigs),
             (mats, lens)),
            ("probe", partial(_probe_body, stride=stride, probe_window=pw,
                              num_sigs=num_sigs), (vals_nb, tk)),
            ("probefp", partial(_probefp_body, stride=stride,
                                probe_window=pw), (qfp_nb, homes_nb, tk)),
        ]:
            work = n_win
            try:
                loop = rep_loop(body)
                fn = lambda r: loop(r, *args)  # noqa: B023
                rate = marginal(fn, REPS, work)
                print(json.dumps({"stage": name,
                                  "windows_per_sec": round(rate, 1)}),
                      flush=True)
            except Exception as ex:  # noqa: BLE001
                print(json.dumps({"stage": name, "error": repr(ex)[:300]}),
                      flush=True)

        # full production step for reference
        mesh = make_mesh(1, 1)
        step, dplanes = make_sharded_annotate_step(mesh, table, pw)

        def full_body(i, mats, lens):
            o = step(dplanes["fp"], pick(i, mats), lens)
            return jnp.sum(o, dtype=jnp.int32)

        loop = rep_loop(full_body)
        rate = marginal(lambda r: loop(r, mats, lens.astype(jnp.int64)),
                        REPS, n_win)
        print(json.dumps({"stage": "full",
                          "windows_per_sec": round(rate, 1),
                          "reads_per_sec": round(rate / (L - K + 1) * 1, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
