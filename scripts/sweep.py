#!/usr/bin/env python
"""Consolidated TPU sweep harness — THE one place that owns the honest
on-chip measurement scaffold (round-4 verdict item 7; supersedes the
eleven sweep_*.py one-offs, whose findings live in docs/performance.md
"Sweep archive").

Honest-measurement rules (every section below inherits them):

1. **Sync by device_get.** Through this harness's TPU relay,
   block_until_ready returns while work is still queued; only a
   device->host transfer of an output proves completion. Every timing
   ends with jax.device_get of one element of the result.
2. **Marginal two-point fit.** The relay charges ~1.5s fixed per
   dispatch with ~±0.5s variance. Rate = d(work)/d(time) between two rep
   counts of the SAME executable (min of 2 runs each, warmed at the same
   static reps), with the rep spread wide enough that the compute delta
   dwarfs the variance.
3. **Per-rep input variation.** Each rep must consume a DIFFERENT
   precomputed input variant (dynamic_index_in_dim over NB stacked
   variants) — holding inputs loop-invariant lets XLA hoist gathers out
   of the rep loop and fabricates rates (the round-2 narrow-lane
   retraction, docs/performance.md).
4. **Device-generated inputs.** The relay host link is ~MB/s; planes and
   query loads are generated on-device with jax.random. Probe throughput
   is content-independent; correctness is pinned by the differential
   tests, not here.

Usage: nohup python scripts/sweep.py SECTION [SECTION...] \
           > /tmp/sweep.log 2>&1 &
Sections: tilejoin | tjgather | sparse | stream | all
Env: SWEEP_REPS (default 20), SWEEP_PLANE_MB (default 512),
     SWEEP_QUERIES (default 4M), SWEEP_CAPS (default "128,256,512").
Prints one JSON line at the end; per-case lines stream as they finish.
"""
import functools
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

NB = int(os.environ.get("SWEEP_NB", 4))
W = 16
OUT: dict = {}


def sync(x):
    jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[:1])


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
    sync(fn(r))  # warm with the SAME static reps (same executable)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        sync(fn(r))
        best = min(best, time.time() - t0)
    return best


def measure(name, work_per_rep, loop, args, reps=None, extra=None):
    """Fault-isolated marginal-rate measurement; records OUT[name]."""
    reps = reps or int(os.environ.get("SWEEP_REPS", 20))
    try:
        fn = lambda r: loop(r, *args)
        r1, r2 = reps, 4 * reps
        t1, t2 = timed(fn, r1), timed(fn, r2)
        rate = work_per_rep * (r2 - r1) / max(t2 - t1, 1e-9)
        OUT[name] = round(rate, 1)
        if extra:
            OUT.update({f"{name}_{k}": v for k, v in extra.items()})
        print(f"{name}: {rate / 1e6:.1f}M/s  (t1={t1:.2f}s t2={t2:.2f}s, "
              f"work/rep={work_per_rep})", flush=True)
    except Exception as ex:  # noqa: BLE001 — keep other cases alive
        OUT[name] = None
        print(f"{name}: FAILED {ex!r}", flush=True)


# ---------------------------------------------------------------- tilejoin
def section_tilejoin():
    """The Pallas tile-join kernel (lookup/pallas_tilejoin.py) on an
    HBM-large plane: all tiles visited in merge-join order (sequential
    ids) and shuffled order, across per-tile bin capacities. Work is
    counted in CELLS (cap x tiles — what the kernel computes); the
    production query rate is cells/padding_factor, reported alongside."""
    from kmergutsjava_tpu.lookup.pallas_tilejoin import TPG, tilejoin_probe

    plane_mb = float(os.environ.get("SWEEP_PLANE_MB", 512))
    tpg = int(os.environ.get("SWEEP_TPG", TPG))
    form = os.environ.get("SWEEP_TJ_FORM", "gather")
    tiles = (int(plane_mb * 2**20) // (128 * 128 * 2)) // tpg * tpg
    nsup = tiles // tpg
    caps = [int(c) for c in
            os.environ.get("SWEEP_CAPS", "128,256,512").split(",")]
    stride = 128 - W
    with jax.enable_x64(False):
        k1, k2, k4 = jax.random.split(jax.random.key(42), 3)
        if form.startswith("gather2"):
            # packed plane: two random u16 fingerprints per int32 lane
            plane3 = jax.lax.bitcast_convert_type(
                jax.random.bits(k1, (tiles, 64, 128), dtype=jnp.uint32),
                jnp.int32)
        else:
            plane3 = jax.random.bits(k1, (tiles, 128, 128),
                                     dtype=jnp.uint16)
        ids_seq = jnp.arange(nsup, dtype=jnp.int32)
        ids_shuf = jax.random.permutation(k4, ids_seq)
        for cap in caps:
            # packed = qfp<<14 | rr<<7 | off, built from random fields
            bits = jax.random.bits(k2, (NB, nsup, tpg, cap // 128, 128),
                                   dtype=jnp.uint32)
            pk_nb = (((bits >> 16) << 14) | (((bits >> 9) & 127) << 7)
                     | (bits % jnp.uint32(stride))).astype(jnp.int32)

            def body(i, plane3, ids, pk_nb, cap=cap):
                fst = tilejoin_probe(plane3, ids, pick(i, pk_nb), W,
                                     cap // 128, tpg=tpg, form=form)
                return jnp.sum(fst)

            cells = tiles * cap
            measure(f"tilejoin_{int(plane_mb)}mb_cap{cap}_tpg{tpg}_{form}",
                    cells, rep_loop(body), (plane3, ids_seq, pk_nb),
                    extra={"cells": cells, "tiles": tiles})
            if cap == caps[len(caps) // 2]:
                measure(
                    f"tilejoin_{int(plane_mb)}mb_cap{cap}_tpg{tpg}_"
                    f"{form}_shuffled",
                    cells, rep_loop(body), (plane3, ids_shuf, pk_nb))
            pk_nb.delete()
            del pk_nb


# ---------------------------------------------------------------- tjgather
def section_tjgather():
    """EXPERIMENT: tile-join with an in-VMEM LANE-axis gather instead of
    the MXU one-hot: the plane tile arrives pre-transposed [off, row], so
    the row extract is take_along_axis along LANES (the gather dim then
    spans one vreg of 128 lanes, which this Mosaic accepts where the
    sublane-axis gather is rejected). Same packed layout and TPG
    super-tiles as production. The production form is MXU-bound at ~60%
    of bf16 peak; this form trades the matmuls for VPU gathers — if it
    wins, promote it."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kmergutsjava_tpu.lookup.pallas_tilejoin import (LANES, TILE_ROWS,
                                                         TPG)
    from kmergutsjava_tpu.lookup.xla import FP_EMPTY

    plane_mb = float(os.environ.get("SWEEP_PLANE_MB", 512))
    tiles = int(plane_mb * 2**20) // (128 * 128 * 2)
    nsup = tiles // TPG
    caps = [int(c) for c in
            os.environ.get("SWEEP_TJG_CAPS", "256,512").split(",")]
    stride = 128 - W

    def make_probe(cap128):
        def kernel(ids_ref, planeT_ref, packed_ref, out_ref):
            big2 = jnp.int32(2 * W)
            o_ids = jax.lax.broadcasted_iota(jnp.int32,
                                             (TILE_ROWS, LANES), 0)
            for t in range(TPG):
                tileT = planeT_ref[t].astype(jnp.int32)   # [off, row]
                for g in range(cap128):
                    p = packed_ref[0, t, g:g + 1, :]
                    rr = (p >> 7) & 127
                    off = p & 127
                    qfp = p >> 14
                    idx = jnp.broadcast_to(rr, (TILE_ROWS, LANES))
                    winT = jnp.take_along_axis(tileT, idx, axis=1)
                    rel = o_ids - off
                    in_w = (rel >= 0) & (rel < W)
                    key = jnp.where(
                        (winT == qfp) & in_w, rel * 2,
                        jnp.where((winT == jnp.int32(FP_EMPTY)) & in_w,
                                  rel * 2 + 1, big2))
                    out_ref[0, t, g:g + 1, :] = jnp.min(key, axis=0,
                                                        keepdims=True)

        @jax.jit
        def probe(plane3, ids, packed_b):
            blk = pl.BlockSpec((1, TPG, cap128, 128),
                               lambda b, i_: (b, 0, 0, 0))
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(packed_b.shape[0],),
                in_specs=[pl.BlockSpec((TPG, 128, 128),
                                       lambda b, i_: (i_[b], 0, 0)), blk],
                out_specs=blk)
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kernel, grid_spec=gs,
                    out_shape=jax.ShapeDtypeStruct(
                        (packed_b.shape[0], TPG, cap128, 128), jnp.int32),
                )(ids, plane3, packed_b)
        return probe

    with jax.enable_x64(False):
        k1, k2 = jax.random.split(jax.random.key(7), 2)
        plane3 = jax.random.bits(k1, (tiles, 128, 128), dtype=jnp.uint16)
        ids = jnp.arange(nsup, dtype=jnp.int32)
        for cap in caps:
            bits = jax.random.bits(k2, (NB, nsup, TPG, cap // 128, 128),
                                   dtype=jnp.uint32)
            pk_nb = (((bits >> 16) << 14) | (((bits >> 9) & 127) << 7)
                     | (bits % jnp.uint32(stride))).astype(jnp.int32)
            probe = make_probe(cap // 128)

            def body(i, plane3, ids, pk_nb, probe=probe):
                return jnp.sum(probe(plane3, ids, pick(i, pk_nb)))

            measure(f"tjgather_{int(plane_mb)}mb_cap{cap}", tiles * cap,
                    rep_loop(body), (plane3, ids, pk_nb))
            pk_nb.delete()
            del pk_nb


# ------------------------------------------------------------------ sparse
def section_sparse():
    """The XLA gather ladder (rows1 wide / chunked) at SWEEP_PLANE_MB,
    honest per-rep (query, home) variation — the same measurement
    bench.py records as sparse_big_*, kept here for experiments at other
    plane sizes / query counts."""
    from kmergutsjava_tpu.lookup.xla import (probe_fingerprint_chunk_bins,
                                             probe_fingerprint_rows1)

    plane_mb = float(os.environ.get("SWEEP_PLANE_MB", 512))
    n = int(os.environ.get("SWEEP_QUERIES", 4_000_000))
    stride = 128 - W
    with jax.enable_x64(False):
        nrows = int(plane_mb * 2**20) // 256
        k1, k2, k3 = jax.random.split(jax.random.key(23), 3)
        t128 = jax.random.bits(k1, (nrows, 128), dtype=jnp.uint16)
        q_nb = jax.random.bits(k2, (NB, n), dtype=jnp.uint16)
        h_nb = jax.random.randint(k3, (NB, n), 0, (nrows - 2) * stride,
                                  dtype=jnp.int32)

        def rows1_body(i, t, q, h):
            off, st = probe_fingerprint_rows1(t, pick(i, q), pick(i, h),
                                              W, stride)
            return (jnp.sum(st.astype(jnp.int32))
                    + jnp.sum(off.astype(jnp.int32)))

        measure(f"rows1_{int(plane_mb)}mb", n, rep_loop(rows1_body),
                (t128, q_nb, h_nb))
        t128.delete()
        h_nb.delete()

        chunk_rows = 16384
        nchunks = max(1, int(plane_mb * 2**20) // (chunk_rows * 256))
        cap = -(-(n // nchunks) // 8) * 8
        k4, k5, k6, k7 = jax.random.split(jax.random.key(17), 4)
        tbl3 = jax.random.bits(k4, (nchunks, chunk_rows, 128),
                               dtype=jnp.uint16)
        qb_nb = jax.random.bits(k5, (NB, nchunks, cap), dtype=jnp.uint16)
        rb_nb = (jax.random.bits(k6, (NB, nchunks, cap), dtype=jnp.uint16)
                 % jnp.uint16(chunk_rows))
        ob_nb = (jax.random.bits(k7, (NB, nchunks, cap), dtype=jnp.uint8)
                 % jnp.uint8(stride))

        def chunk_body(i, t, q, rr, oo):
            off, st = probe_fingerprint_chunk_bins(
                t, pick(i, q), pick(i, rr), pick(i, oo), W)
            return (jnp.sum(st.astype(jnp.int32))
                    + jnp.sum(off.astype(jnp.int32)))

        measure(f"chunked_{int(plane_mb)}mb", nchunks * cap,
                rep_loop(chunk_body), (tbl3, qb_nb, rb_nb, ob_nb))


# ------------------------------------------------------------------ stream
def section_stream():
    """Stream-kernel channel ladder (dense merge-join regime): raw
    slot-channel rate at C in {4, 8, 12} on the bench fixture geometry."""
    from kmergutsjava_tpu.lookup.pallas_stream import (BLOCK, HALO, ROWS,
                                                      stream_probe_blocks)

    n_sigs = int(os.environ.get("SWEEP_SLOTS", 3_335_021))
    nsuper = -(-n_sigs // (ROWS * BLOCK))
    with jax.enable_x64(False):
        for channels in (4, 8, 12):
            k1, k2 = jax.random.split(jax.random.key(channels))
            fpb = jax.random.bits(k1, (nsuper, ROWS, BLOCK + HALO),
                                  dtype=jnp.uint16)
            qt_nb = jax.random.bits(
                k2, (NB, nsuper, channels, ROWS, BLOCK), dtype=jnp.uint16)

            def body(i, fpb, qt_nb, channels=channels):
                out = stream_probe_blocks(fpb, pick(i, qt_nb), nsuper, 16,
                                          channels)
                return jnp.sum(out)

            measure(f"stream_c{channels}", nsuper * ROWS * BLOCK * channels,
                    rep_loop(body), (fpb, qt_nb))
            fpb.delete()
            qt_nb.delete()


SECTIONS = {"tilejoin": section_tilejoin, "tjgather": section_tjgather,
            "sparse": section_sparse, "stream": section_stream}


def main():
    names = sys.argv[1:] or ["tilejoin"]
    if names == ["all"]:
        names = list(SECTIONS)
    for name in names:
        if name not in SECTIONS:
            sys.exit(f"unknown section {name!r}; pick from {list(SECTIONS)}")
        print(f"=== section {name} ===", flush=True)
        SECTIONS[name]()
    OUT["sections"] = names
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
