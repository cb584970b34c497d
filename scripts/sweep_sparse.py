#!/usr/bin/env python
"""Sparse-regime probe experiments: what limits the HBM-bound row gather?

Round-1 facts (docs/performance.md): the overlapped single-row gather
(rows1, uint16 fingerprints, 256 B/query) runs ~206M lookups/s on small
planes and ~112M/s once the plane is HBM-bound (122-488MB), independent of
further plane growth and of query locality.  The north star wants >=200M/s
on >=400MB planes.  Hypotheses this sweep separates:

  H1 byte/tile-bound: the gather's true HBM traffic is tile-granular
     ((16,128) for u16 = 4KB/query).  Then a uint8 plane (tile (32,128),
     same 4KB) should NOT help, but rate should track plane dtype only
     weakly -> test u8 vs u16 vs packed-u32.
  H2 issue-bound at ~112M rows/s from HBM and ~206M/s from fast memory:
     then dtype changes nothing, and the only lever is gathering from a
     SMALL operand -> measure rate vs operand size (1MB..512MB) and a
     chunked form: stream the plane through a lax.scan (sequential HBM
     reads at full bandwidth) and gather each chunk's pre-binned queries
     from the small per-chunk slice.

Honest methodology (see docs/performance.md): whole rep loop inside ONE
device program, warm call with the same static shapes first, timed call
ends with jax.device_get of a data-dependent scalar.

Usage: nohup python scripts/sweep_sparse.py > /tmp/sweep_sparse.log 2>&1 &

ROUND-3 METHODOLOGY WARNING: the rep loops in this script perturb only
the QUERY fingerprints and hold HOMES loop-invariant. XLA hoists the
(loop-invariant) gather out of the fori_loop whenever the gathered
result is small enough to materialize, so narrow-lane rates measured
here are inflated up to ~7x (543M/s vs the honest 74M at 512MB/32
lanes). Honest harnesses index one of NB precomputed (query, home)
variants per iteration — see scripts/sweep_fuse2.py / sweep_fuse3.py /
sweep_fuse4.py and the corrected bench_tpu_sparse_big in bench.py.
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
import numpy as np

import kmergutsjava_tpu  # noqa: F401  (x64 + compile cache setup)

W = 16
STRIDE = 128 - W          # u16/u8 overlapped layout: row r = slots [r*S, r*S+128)
STRIDE32 = 256 - W        # packed-u32 layout: row r = slots [r*S32, r*S32+256)


def sync(x):
    jax.device_get(jnp.ravel(x)[:1])


def null_roundtrip():
    f = jax.jit(lambda x: x + 1)
    y = f(jnp.zeros((8,), jnp.int32))
    sync(y)
    t0 = time.time()
    sync(f(y))
    return time.time() - t0


# ---------------------------------------------------------------- probes

def _probe_rows1(fp2d, qfp, homes, w, stride):
    """rows1 probe body (dtype-generic: u16 or u8 plane; lane width from
    the plane's shape — 128 wide or the narrow production layout). Same
    first-event single-reduction form as the production probe
    (lookup/xla.py _first_event; the former two-reduction form measured
    316M vs 558M/s on narrow planes)."""
    lanes = fp2d.shape[1]
    r = homes // jnp.int32(stride)
    o = (homes - r * jnp.int32(stride)).astype(jnp.int32)
    win = jnp.take(fp2d, r, axis=0)  # [N, L] one row gather
    rel = jnp.arange(lanes, dtype=jnp.int32)[None, :] - o[:, None]
    in_w = (rel >= 0) & (rel < w)
    big2 = jnp.int32(2 * w)
    empty_v = jnp.array(np.iinfo(fp2d.dtype.name).max, fp2d.dtype)
    key = jnp.where((win == qfp[:, None]) & in_w, rel * 2,
                    jnp.where((win == empty_v) & in_w, rel * 2 + 1, big2))
    fst = jnp.min(key, axis=1)
    return fst + (fst < big2).astype(jnp.int32)


def _probe_rows1_u32p(fp2d, qfp, homes, w, stride):
    """Packed-u32 probe: lane j of row r = fp16 of slots (base+2j, base+2j+1)."""
    r = homes // jnp.int32(stride)
    o = (homes - r * jnp.int32(stride)).astype(jnp.int32)
    win = jnp.take(fp2d, r, axis=0)  # [N, 128] u32 -> covers 256 slots
    lo = (win & jnp.uint32(0xFFFF)).astype(jnp.int32)
    hi = jax.lax.shift_right_logical(win, jnp.uint32(16)).astype(jnp.int32)
    q = qfp[:, None].astype(jnp.int32)
    j2 = 2 * jnp.arange(128, dtype=jnp.int32)[None, :]
    rel_lo = j2 - o[:, None]
    rel_hi = rel_lo + 1
    big = jnp.int32(w)
    emp = jnp.int32(65535)
    in_lo = (rel_lo >= 0) & (rel_lo < w)
    in_hi = (rel_hi >= 0) & (rel_hi < w)
    fc = jnp.minimum(
        jnp.min(jnp.where((lo == q) & in_lo, rel_lo, big), axis=1),
        jnp.min(jnp.where((hi == q) & in_hi, rel_hi, big), axis=1))
    fe = jnp.minimum(
        jnp.min(jnp.where((lo == emp) & in_lo, rel_lo, big), axis=1),
        jnp.min(jnp.where((hi == emp) & in_hi, rel_hi, big), axis=1))
    has = (fc < big) & (fc < fe)
    return fc + 2 * has.astype(jnp.int32)


@partial(jax.jit, static_argnames=("w", "stride", "reps", "packed"))
def rows1_loop(fp2d, qfp, homes, w, stride, reps, packed=False):
    probe = _probe_rows1_u32p if packed else _probe_rows1

    def body(i, carry):
        # query-xor perturbation: one u16 op per query to defeat loop
        # hoisting — the former (homes + i) % limit modulo cost ~2-4x
        # the narrow probe itself and understated every rows rate
        return carry + jnp.sum(probe(fp2d, qfp ^ i.astype(jnp.uint16),
                                     homes, w, stride))

    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))


def bench_rows1_dtype(plane_mb: float, n_queries: int, reps: int,
                      floor: float, dtype: str):
    """rows1 probe rate for a given fingerprint dtype and plane size."""
    if dtype == "u16":
        nrows = int(plane_mb * 2**20) // 256
        mk = lambda k: jax.random.bits(k, (nrows, 128), dtype=jnp.uint16)
        qk = lambda k: jax.random.bits(k, (n_queries,), dtype=jnp.uint16)
        stride, packed = STRIDE, False
    elif dtype == "u8":
        nrows = int(plane_mb * 2**20) // 128
        mk = lambda k: jax.random.bits(k, (nrows, 128), dtype=jnp.uint8)
        qk = lambda k: jax.random.bits(k, (n_queries,), dtype=jnp.uint8)
        stride, packed = STRIDE, False
    elif dtype == "u32p":
        nrows = int(plane_mb * 2**20) // 512
        mk = lambda k: jax.random.bits(k, (nrows, 128), dtype=jnp.uint32)
        qk = lambda k: jax.random.bits(k, (n_queries,), dtype=jnp.uint16)
        stride, packed = STRIDE32, True
    else:
        raise ValueError(dtype)
    n_slots = (nrows - 1) * stride
    k1, k2, k3 = jax.random.split(jax.random.key(hash(dtype) % 2**31), 3)
    with jax.enable_x64(False):
        fp2d = mk(k1)
        qfp = qk(k2)
        homes = jax.random.randint(k3, (n_queries,), 0, n_slots - W,
                                   dtype=jnp.int32)
        out = rows1_loop(fp2d, qfp, homes, W, stride, reps, packed)
        sync(out)
        t0 = time.time()
        out = rows1_loop(fp2d, qfp, homes, W, stride, reps, packed)
        sync(out)
        dt = max(time.time() - t0 - floor, 1e-9)
    return {"kind": f"rows1_{dtype}", "plane_mb": round(plane_mb, 1),
            "queries": n_queries, "reps": reps, "secs": round(dt, 4),
            "lookups_per_sec": round(n_queries * reps / dt, 1)}


# ------------------------------------------------- chunked scan + gather

@partial(jax.jit, static_argnames=("w", "stride", "reps"))
def chunked_loop(plane3, qfp_b, homes_b, w, stride, reps):
    """Scan over plane chunks; per chunk, gather its pre-binned queries
    from the (small) chunk slice.  plane3: [C, Rc, 128]; qfp_b/homes_b:
    [C, Q] with chunk-local homes."""
    rc = plane3.shape[1]
    limit = jnp.int32((rc - 1) * stride - w - 1)

    def rep(i, carry):
        def chunk(c, xs):
            pl_c, qf, hm = xs
            h = (hm + i) % limit
            return c + jnp.sum(_probe_rows1(pl_c, qf, h, w, stride)), None

        c2, _ = jax.lax.scan(chunk, carry, (plane3, qfp_b, homes_b))
        return c2

    return jax.lax.fori_loop(0, reps, rep, jnp.int32(0))


def bench_chunked(plane_mb: float, chunk_mb: float, n_queries: int,
                  reps: int, floor: float):
    nchunks = max(1, int(plane_mb / chunk_mb))
    rc = int(chunk_mb * 2**20) // 256
    q = n_queries // nchunks
    k1, k2, k3 = jax.random.split(jax.random.key(11), 3)
    with jax.enable_x64(False):
        plane3 = jax.random.bits(k1, (nchunks, rc, 128), dtype=jnp.uint16)
        qfp_b = jax.random.bits(k2, (nchunks, q), dtype=jnp.uint16)
        homes_b = jax.random.randint(k3, (nchunks, q), 0,
                                     (rc - 1) * STRIDE - W, dtype=jnp.int32)
        out = chunked_loop(plane3, qfp_b, homes_b, W, STRIDE, reps)
        sync(out)
        t0 = time.time()
        out = chunked_loop(plane3, qfp_b, homes_b, W, STRIDE, reps)
        sync(out)
        dt = max(time.time() - t0 - floor, 1e-9)
    return {"kind": "chunked_scan", "plane_mb": round(plane_mb, 1),
            "chunk_mb": chunk_mb, "chunks": nchunks,
            "queries": q * nchunks, "reps": reps, "secs": round(dt, 4),
            "lookups_per_sec": round(q * nchunks * reps / dt, 1)}


@partial(jax.jit, static_argnames=("w", "chunk_rows", "reps"))
def prod_chunked_loop(tbl3, qfp_b, row_b, off_b, w, chunk_rows, reps):
    """The production device program (lookup/xla.py
    probe_fingerprint_chunk_bins) rep-looped: bins are host-built in
    production (device routing via sort/scatter measured 11M/s — 20x
    worse than the raw scan), so the device work is exactly this."""
    from kmergutsjava_tpu.lookup.xla import probe_fingerprint_chunk_bins

    def body(i, carry):
        # query-xor perturbation (see rows1_loop)
        off, st = probe_fingerprint_chunk_bins(
            tbl3, qfp_b ^ i.astype(jnp.uint16), row_b, off_b, w)
        return (carry + jnp.sum(st.astype(jnp.int32))
                + jnp.sum(off.astype(jnp.int32)))

    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))


def bench_prod_chunked(plane_mb: float, chunk_mb: float, n_queries: int,
                       reps: int, floor: float):
    """Device rate of the binned chunked probe. Every bin cell does the
    work of one query, so bins are generated full: n = C x cap cells
    (production fill is ~0.85-0.98 of cap; host binning runs ~16M
    queries/s on the dev VM and overlaps device work in the pipeline)."""
    chunk_rows = int(chunk_mb * 2**20) // 256
    nchunks = max(1, int(plane_mb / chunk_mb))
    cap = -(-(n_queries // nchunks) // 8) * 8
    k1, k2, k3, k4 = jax.random.split(jax.random.key(21), 4)
    with jax.enable_x64(False):
        tbl3 = jax.random.bits(k1, (nchunks, chunk_rows, 128),
                               dtype=jnp.uint16)
        qfp_b = jax.random.bits(k2, (nchunks, cap), dtype=jnp.uint16)
        row_b = (jax.random.bits(k3, (nchunks, cap), dtype=jnp.uint16)
                 % jnp.uint16(chunk_rows))
        off_b = (jax.random.bits(k4, (nchunks, cap), dtype=jnp.uint8)
                 % jnp.uint8(STRIDE))
        out = prod_chunked_loop(tbl3, qfp_b, row_b, off_b, W, chunk_rows,
                                reps)
        sync(out)
        t0 = time.time()
        out = prod_chunked_loop(tbl3, qfp_b, row_b, off_b, W, chunk_rows,
                                reps)
        sync(out)
        dt = max(time.time() - t0 - floor, 1e-9)
    n = nchunks * cap
    return {"kind": "prod_chunked_bins", "plane_mb": round(plane_mb, 1),
            "chunk_mb": chunk_mb, "chunks": nchunks, "cap": cap,
            "queries": n, "reps": reps, "secs": round(dt, 4),
            "lookups_per_sec": round(n * reps / dt, 1)}


def chunked_correctness_on_tpu():
    """Real table, real queries, forced-chunked XlaLookup COMPILED on TPU
    vs the host parity oracle (incl. an overflow-skew batch)."""
    from kmergutsjava_tpu.formats.kmer_table import build_table
    from kmergutsjava_tpu.lookup.parity import lookup_stream
    from kmergutsjava_tpu.lookup.xla import XlaLookup

    rng = np.random.default_rng(7)
    kmers = np.unique(rng.integers(0, 20**8, 400_000, dtype=np.int64))
    table = build_table(kmers,
                        rng.integers(0, 100, len(kmers)).astype(np.int32),
                        rng.integers(0, 500, len(kmers)).astype(np.int32),
                        rng.integers(0, 999, len(kmers)).astype(np.int32),
                        rng.random(len(kmers)).astype(np.float32))
    os.environ["KMER_CHUNK_ROWS"] = "256"
    try:
        lk = XlaLookup(table, probe_impl="chunked")
    finally:
        del os.environ["KMER_CHUNK_ROWS"]
    n = 300_000
    values = np.concatenate([
        rng.choice(kmers, n // 2),
        rng.integers(0, 20**8, n - n // 2, dtype=np.int64)])
    cnt = np.arange(n, dtype=np.int64) % 7
    pos = np.arange(n, dtype=np.int64)
    a = lookup_stream(table, values, cnt, pos)
    b = lk.lookup(values, cnt, pos)
    rec = lambda h: sorted(zip(h.cnt_id, h.pos, h.fi, h.otu, h.avg_from_end,
                               h.wt))
    ok = rec(a) == rec(b) and a.kmers_found == b.kmers_found
    # skew batch: all homes in the first chunk -> bin overflow fallback
    skew = (values % np.int64(table.num_sigs)) % np.int64(
        lk.chunk_rows * lk.stride // 4)
    c2 = lookup_stream(table, skew, cnt, pos)
    d2 = lk.lookup(skew, cnt, pos)
    ok2 = rec(c2) == rec(d2) and c2.kmers_found == d2.kmers_found
    return {"kind": "chunked_correctness_tpu", "impl": lk.probe_impl,
            "hits": len(b), "skew_hits": len(d2),
            "ok": bool(ok), "skew_ok": bool(ok2)}


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "devices": len(jax.devices())}), flush=True)
    if "correct" in os.environ.get("SWEEP", ""):
        try:
            print(json.dumps(chunked_correctness_on_tpu()), flush=True)
        except Exception as ex:
            print(json.dumps({"kind": "chunked_correctness_tpu",
                              "error": repr(ex)[:2000]}), flush=True)
    floor = min(null_roundtrip() for _ in range(3))
    print(json.dumps({"kind": "sync_floor", "secs": round(floor, 4)}),
          flush=True)

    which = os.environ.get("SWEEP", "dtype,size,chunked")
    runs = []
    if "dtype" in which:
        # binding-constraint test at one HBM-bound size
        for dt in ("u16", "u8", "u32p"):
            runs.append(lambda dt=dt: bench_rows1_dtype(512, 4_000_000, 16,
                                                        floor, dt))
    if "size" in which:
        # operand-size ladder (u16 + u8): where is the fast-operand cliff?
        for mb in (1, 4, 16, 64, 256):
            for dt in ("u16", "u8"):
                reps = 64 if mb <= 16 else 24
                runs.append(lambda mb=mb, dt=dt: bench_rows1_dtype(
                    mb, 4_000_000, reps, floor, dt))
    if "chunked" in which:
        for chunk_mb in (1, 4, 8, 16):
            runs.append(lambda c=chunk_mb: bench_chunked(512, c, 4_000_000,
                                                         16, floor))
    if "prod" in which:
        for n in (1_000_000, 4_000_000, 16_000_000):
            runs.append(lambda n=n: bench_prod_chunked(
                512, 4, n, max(4, 64_000_000 // n), floor))
        runs.append(lambda: bench_prod_chunked(512, 8, 4_000_000, 16, floor))
        # (no 16MB config: 65536 rows exceeds the u16 local-row wire format)
    for fn in runs:
        try:
            print(json.dumps(fn()), flush=True)
        except Exception as ex:
            print(json.dumps({"error": repr(ex)[:1500]}), flush=True)
        gc.collect()


if __name__ == "__main__":
    main()
