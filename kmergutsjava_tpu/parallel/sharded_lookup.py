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
    """Host-side prep: planes as [n_shards, slice + halo] stacked arrays."""
    s = table.num_sigs
    s_loc = -(-s // n_shards)
    total = n_shards * s_loc + probe_window
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

    def window(a):
        return np.stack([a[i * s_loc: i * s_loc + s_loc + probe_window]
                         for i in range(n_shards)])

    return {"kmer": window(kmer), "otu": window(otu), "avg": window(avg),
            "fi": window(fi), "wt": window(wt), "s_loc": s_loc}


def _local_probe(tk, t_otu, t_avg, t_fi, t_wt, values, homes, s_loc, probe_window):
    """Probe queries whose home falls in this shard's slice. Runs inside
    shard_map; leading shard dim of the table planes is squeezed to 1."""
    tk = tk[0]
    t_otu, t_avg, t_fi, t_wt = t_otu[0], t_avg[0], t_fi[0], t_wt[0]
    shard = jax.lax.axis_index(TABLE_AXIS)
    local = homes.astype(jnp.int32) - shard * s_loc
    mine = (local >= 0) & (local < s_loc)
    base = jnp.where(mine, local, 0)
    idx = base[:, None] + jnp.arange(probe_window, dtype=jnp.int32)
    match = tk[idx] == values[:, None]
    found = jnp.any(match, axis=-1) & mine
    off = jnp.argmax(match, axis=-1).astype(jnp.int32)
    slot = jnp.where(found, base + off, 0)
    z = jnp.int32(0)
    out = (
        found.astype(jnp.int32),
        jnp.where(found, t_otu[slot], z),
        jnp.where(found, t_avg[slot], z),
        jnp.where(found, t_fi[slot], z),
        jnp.where(found, t_wt[slot], jnp.float32(0)),
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

    table_spec = P(TABLE_AXIS, None)
    query_spec = P(DATA_AXIS)

    fn = partial(_local_probe, s_loc=s_loc, probe_window=probe_window)
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
    out = jax.device_get((found, otu, avg, fi, wt))
    return tuple(a[:n] for a in out)
