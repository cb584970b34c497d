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

import json
import os
import time

import numpy as np


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
        # warm + measure
        sharded_lookup_queries(mesh, step, planes, values, table, 256)
        t0 = time.time()
        found, *_ = sharded_lookup_queries(mesh, step, planes, values,
                                           table, 256)
        dt = time.time() - t0
        rate = n_queries / dt
        n_dev = data * tshard
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n_dev)
        results.append({"mesh": f"{data}x{tshard}", "devices": n_dev,
                        "mode": "psum",
                        "lookups_per_sec": round(rate, 1),
                        "efficiency_vs_1dev": round(eff, 3),
                        "hits": int(found.sum())})

    # routed (all_to_all) mode over the full device set
    from kmergutsjava_tpu.parallel.routed_lookup import (RoutedLookup,
                                                         make_routed_mesh)

    for shards in [s for s in (2, n_devices) if s <= n_devices]:
        rl = RoutedLookup(table, make_routed_mesh(shards),
                          probe_window=max(16, table.max_probe))
        rl.lookup(values, np.zeros(len(values)), np.arange(len(values)))
        t0 = time.time()
        hits = rl.lookup(values, np.zeros(len(values)),
                         np.arange(len(values)))
        dt = time.time() - t0
        results.append({"mesh": f"routed-{shards}", "devices": shards,
                        "mode": "all_to_all",
                        "lookups_per_sec": round(n_queries / dt, 1),
                        "hits": len(hits)})
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
    print(json.dumps({
        "metric": "sharded_lookup_scaling",
        "platform": platform,
        "note": ("virtual CPU devices validate SPMD structure, not speed; "
                 "run on a pod slice for real scaling"),
        "num_sigs": table.num_sigs,
        "queries": n_queries,
        "sweep": results,
    }))


if __name__ == "__main__":
    main()
