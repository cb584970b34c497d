"""Pure data-parallel lookup: table replicated, query stream sharded.

The simplest multi-chip mode (SURVEY §2.2 row "data parallelism"): when the
fingerprint plane fits in every chip's HBM, replicate it and split the
query batch across the ``data`` axis — no collectives at all; each chip
probes its slice independently and results concatenate on the host.

Implemented with sharding annotations only (no shard_map): XLA partitions
the gather automatically from the in_shardings, which is exactly the
"annotate shardings, let XLA do the rest" recipe.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats.kmer_table import KmerTable
from ..lookup.parity import LookupHits
from ..lookup.xla import (FP_EMPTY, FP_MOD, XlaLookup,
                          probe_fingerprint_pass, probe_fingerprint_rows,
                          probe_fingerprint_rows1)

AXIS = "data"


def make_data_mesh(n_devices: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_devices]), (AXIS,))


class ReplicatedLookup:
    """Host driver: replicated plane + data-sharded probe dispatches."""

    def __init__(self, table: KmerTable, mesh: Mesh):
        self.mesh = mesh
        self.n_dev = mesh.shape[AXIS]
        # reuse the single-device wrapper for windows/verification/pass-2.
        # probe impl pinned to the 2-D row layouts: this driver probes via
        # sharding annotations on one flat gather, which is incompatible
        # with the chunked impl's host-binned [C, cap] dispatch (and a
        # replicated plane is the fits-in-HBM case where rows1 is right)
        self._lk = XlaLookup(table, probe_impl="rows1")
        self.num_sigs = table.num_sigs
        # re-place the fp plane replicated across the mesh
        self._lk.tbl_fp = jax.device_put(
            np.asarray(self._lk.tbl_fp), NamedSharding(mesh, P()))
        self._query_sharding = NamedSharding(mesh, P(AXIS))

    def lookup(self, values: np.ndarray, cnt_id: np.ndarray,
               pos: np.ndarray) -> LookupHits:
        values = np.asarray(values, dtype=np.int64)
        n = len(values)
        if n == 0:
            z = np.zeros(0)
            return LookupHits.from_lists(z, z, z, z, z, z, -1)
        n_pad = -(-max(n, 1) // self.n_dev) * self.n_dev
        qfp = np.full(n_pad, FP_EMPTY, np.uint16)
        qfp[:n] = (values % FP_MOD).astype(np.uint16)
        homes = np.zeros(n_pad, np.int32)
        homes[:n] = (values % np.int64(self.num_sigs)).astype(np.int32)
        if self._lk.probe_impl == "rows1":
            from functools import partial

            probe = partial(probe_fingerprint_rows1, stride=self._lk.stride)
        elif self._lk.probe_impl == "rows":
            probe = probe_fingerprint_rows
        else:
            probe = probe_fingerprint_pass
        off, state = jax.device_get(probe(
            self._lk.tbl_fp,
            jax.device_put(jnp.asarray(qfp), self._query_sharding),
            jax.device_put(jnp.asarray(homes), self._query_sharding),
            self._lk.w1))
        off = off[:n].astype(np.int64)
        state = state[:n]
        homes64 = homes[:n].astype(np.int64)

        has_cand = (state & 1) != 0
        empty_any = (state & 2) != 0
        found = np.zeros(n, dtype=bool)
        ci = np.nonzero(has_cand)[0]
        slots_c = homes64[ci] + off[ci]
        verified = self._lk.host_kmer[slots_c] == values[ci]
        found[ci] = verified
        todo_mask = np.zeros(n, dtype=bool)
        todo_mask[ci] = ~verified
        todo_mask |= ~has_cand & ~empty_any
        todo = np.nonzero(todo_mask)[0]
        if len(todo):
            f2, o2 = self._lk._host_full_window(values, homes64.astype(np.int32),
                                                todo)
            found[todo] = f2
            off[todo] = o2
        mask = found
        slots = homes64[mask] + off[mask]
        t = self._lk.table.slots
        return LookupHits(
            cnt_id=np.asarray(cnt_id)[mask].astype(np.int64),
            pos=np.asarray(pos)[mask].astype(np.int64),
            otu=t["otu"][slots], avg_from_end=t["avg_from_end"][slots],
            fi=t["fi"][slots], wt=t["wt"][slots],
            kmers_found=int(np.unique(values[mask]).size),
        )
