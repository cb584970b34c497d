"""Multi-chip lookup: slot-range-sharded table + data-sharded queries.

The reference's scalability story is out-of-core disk streaming
(SURVEY.md §2.2); the TPU-native story is an HBM-resident table sharded by
slot range across the ``table`` mesh axis, query batches sharded across the
``data`` axis, and a psum hit-merge:

- each table shard holds its slot slice plus a ``probe_window`` halo so any
  probe window whose home slot it owns is a local contiguous read;
- every device probes only the queries whose home falls in its slice
  (exactly one owner per query), contributing zeros otherwise;
- ``psum`` over the table axis assembles complete per-query answers on every
  data shard — collectives ride ICI, no host round-trips.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..constants import EMPTY_KMER
from ..formats.kmer_table import KmerTable
from .mesh import DATA_AXIS, TABLE_AXIS


def shard_table_planes(table: KmerTable, n_shards: int, probe_window: int):
    """Host-side prep: per-shard slot-range slices (+ probe halo) laid out
    in 128-lane rows — TPU XLA vectorizes whole-row gathers but runs
    1-D-operand gathers scalar (docs/performance.md), so every plane is
    [n_shards, rows_loc, 128].

    probe_window <= 64 (every standard-load-factor table): OVERLAPPED rows
    (row r = local slots [r*stride, r*stride + 128), stride = 128 -
    probe_window), so any window AND its matched slot's metadata lie in
    ONE row — one gather per plane per query instead of two, for a
    128/stride storage factor (<= 2x). Larger windows fall back to plain
    rows + two-row gathers; returned "stride" is 0 in that case.
    """
    if probe_window > 128:
        raise ValueError("sharded lookup requires probe_window <= 128 "
                         "(two-row gather); rebuild the table at a lower "
                         "load factor")
    import os

    s = table.num_sigs
    s_loc = -(-s // n_shards)
    slice_len = s_loc + probe_window
    stride = 128 - probe_window if probe_window <= 64 else 0
    if stride:
        # same storage gate as XlaLookup's rows1: the overlap factor
        # (128/stride, up to 2x at probe_window 64) applies to all five
        # planes (24 B/slot); a big table in exactly these barely-fits
        # modes must not be inflated past the budget
        budget = int(os.environ.get("KMER_ROWS1_MAX_BYTES", 4 << 30))
        per_shard = ((s_loc - 1) // stride + 1) * 128 * 24
        if per_shard > budget:
            stride = 0
    if stride:
        rows_loc = (s_loc - 1) // stride + 1
        ext = (rows_loc - 1) * stride + 128
    else:
        rows_loc = -(-slice_len // 128) + 1
        ext = rows_loc * 128
    total = n_shards * s_loc + slice_len
    kmer = np.full(total, EMPTY_KMER, dtype=np.int64)
    kmer[:s] = table.slots["kmer"]
    otu = np.zeros(total, np.int32)
    otu[:s] = table.slots["otu"]
    avg = np.zeros(total, np.int32)
    avg[:s] = table.slots["avg_from_end"]
    fi = np.zeros(total, np.int32)
    fi[:s] = table.slots["fi"]
    wt = np.zeros(total, np.float32)
    wt[:s] = table.slots["wt"]

    def window(a, fill):
        flat = np.full((n_shards, ext), fill, dtype=a.dtype)
        for i in range(n_shards):
            flat[i, :slice_len] = a[i * s_loc: i * s_loc + slice_len]
        if not stride:
            return flat.reshape(n_shards, rows_loc, 128)
        it = a.dtype.itemsize
        rows = np.lib.stride_tricks.as_strided(
            flat, shape=(n_shards, rows_loc, 128),
            strides=(flat.strides[0], stride * it, it))
        return np.ascontiguousarray(rows)

    return {"kmer": window(kmer, EMPTY_KMER), "otu": window(otu, 0),
            "avg": window(avg, 0), "fi": window(fi, 0),
            "wt": window(wt, 0), "s_loc": s_loc, "stride": stride}


def _lane_select(rows, lane):
    """rows[q, lane[q]] without a minor-dim gather: one-hot mask + sum."""
    onehot = jnp.arange(128, dtype=jnp.int32)[None, :] == lane[:, None]
    return jnp.sum(jnp.where(onehot, rows, jnp.zeros_like(rows)), axis=1)


def _local_probe(tk, t_otu, t_avg, t_fi, t_wt, values, homes, s_loc,
                 probe_window, stride=0):
    """Probe queries whose home falls in this shard's slice. Runs inside
    shard_map; leading shard dim of the table planes is squeezed to 1.
    Row-gather formulation (no scalar gathers): with an overlapped layout
    (stride > 0, see shard_table_planes) the window AND the matched slot
    lie in one 128-lane row — one gather per plane per query; the plain
    layout needs two consecutive rows per gather. Metadata lanes are
    selected with a one-hot sum."""
    tk = tk[0]
    t_otu, t_avg, t_fi, t_wt = t_otu[0], t_avg[0], t_fi[0], t_wt[0]
    shard = jax.lax.axis_index(TABLE_AXIS)
    local = homes.astype(jnp.int32) - shard * s_loc
    mine = (local >= 0) & (local < s_loc)
    base = jnp.where(mine, local, 0)
    big = jnp.int32(probe_window)
    if stride:
        r = base // jnp.int32(stride)
        o = base - r * jnp.int32(stride)
        win = jnp.take(tk, r, axis=0)  # [N, 128] single row gather
        rel = jnp.arange(128, dtype=jnp.int32)[None, :] - o[:, None]
    else:
        r = jax.lax.shift_right_logical(base, jnp.int32(7))
        o = base & jnp.int32(127)
        win = jnp.concatenate([jnp.take(tk, r, axis=0),
                               jnp.take(tk, r + 1, axis=0)], axis=1)  # [N,256]
        rel = jnp.arange(256, dtype=jnp.int32)[None, :] - o[:, None]
    match = ((win == values[:, None])
             & (rel >= 0) & (rel < probe_window))
    off = jnp.min(jnp.where(match, rel, big), axis=1)
    found = (off < big) & mine
    off = jnp.where(found, off, 0)
    # matched slot's row/lane within the local slice
    pos = o + off
    if stride:
        r2 = r  # o + off <= stride-1 + probe_window-1 < 128: same row
        lane = pos
    else:
        r2 = r + jax.lax.shift_right_logical(pos, jnp.int32(7))
        lane = pos & jnp.int32(127)
    z = jnp.int32(0)
    out = (
        found.astype(jnp.int32),
        jnp.where(found, _lane_select(jnp.take(t_otu, r2, axis=0), lane), z),
        jnp.where(found, _lane_select(jnp.take(t_avg, r2, axis=0), lane), z),
        jnp.where(found, _lane_select(jnp.take(t_fi, r2, axis=0), lane), z),
        jnp.where(found, _lane_select(jnp.take(t_wt, r2, axis=0), lane),
                  jnp.float32(0)),
    )
    return tuple(jax.lax.psum(o, TABLE_AXIS) for o in out)


def make_sharded_lookup(mesh, table: KmerTable, probe_window: int
                        ) -> Tuple[Callable, dict]:
    """Build a jitted sharded lookup step and its device-ready table planes.

    Returns (step, planes): step(kmer, otu, avg, fi, wt, values, homes) ->
    (found, otu, avg, fi, wt) with values/homes sharded over the data axis
    and the table planes sharded over the table axis.
    """
    n_shards = mesh.shape[TABLE_AXIS]
    planes = shard_table_planes(table, n_shards, probe_window)
    s_loc = planes["s_loc"]

    table_spec = P(TABLE_AXIS, None, None)
    query_spec = P(DATA_AXIS)

    fn = partial(_local_probe, s_loc=s_loc, probe_window=probe_window,
                 stride=planes["stride"])
    step = jax.jit(
        jax.shard_map(
            fn, mesh=mesh,
            in_specs=(table_spec,) * 5 + (query_spec, query_spec),
            out_specs=(query_spec,) * 5,
        )
    )

    device_planes = {
        k: jax.device_put(planes[k], NamedSharding(mesh, table_spec))
        for k in ("kmer", "otu", "avg", "fi", "wt")
    }
    return step, device_planes


def sharded_lookup_queries(mesh, step, device_planes, values: np.ndarray,
                           num_sigs: int, pad_multiple: int):
    """Host convenience: pad values to the data-shard multiple and run."""
    n = len(values)
    n_data = mesh.shape[DATA_AXIS]
    mult = n_data * pad_multiple
    n_pad = -(-max(n, 1) // mult) * mult
    v = np.zeros(n_pad, dtype=np.int64)
    v[:n] = values
    homes = (v % np.int64(num_sigs)).astype(np.int32)
    # padding rows have value 0 / home 0; they may "find" kmer 0 but are
    # sliced off below
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    v_dev = jax.device_put(v, sharding)
    h_dev = jax.device_put(homes, sharding)
    found, otu, avg, fi, wt = step(
        device_planes["kmer"], device_planes["otu"], device_planes["avg"],
        device_planes["fi"], device_planes["wt"], v_dev, h_dev)
    from .multihost import fetch_global

    out = fetch_global((found, otu, avg, fi, wt))
    return tuple(a[:n] for a in out)
