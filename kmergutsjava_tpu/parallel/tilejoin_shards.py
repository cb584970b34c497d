"""Multi-chip sparse tile-join lookup: super-tile-sharded plane + bins.

TPU-native scaling of the tile-join kernel (lookup/pallas_tilejoin.py;
the manual-DMA analog of the reference's sorted merge-join,
/root/reference/lib/src/kmergutsjava/KmerGutsJava.java:944-1034) with the
same zero-collective structure as parallel/stream_shards.py: the host
binner already routes every query to its home super-tile, so sharding
the transposed plane by super-tile range simultaneously shards the
packed bins — plane shard i pairs with bin shard i and the probe needs
NO collectives (contrast routed_lookup.py's all_to_all). Probe windows
never leave their row, rows never leave their tile, tiles never leave
their super-tile, so there is no halo exchange either: scaling over the
``table`` axis is linear by construction, and each chip holds 1/S of
the plane — S times the table per pod at the same per-chip HBM.

The sharded form uses the DENSE bin layout (every super-tile owns a
block, ids = arange): block counts are then static per (cap, table)
and split evenly over shards with plain jax.sharding, no per-batch
routing state. Host verification and the exact fallback are inherited
from XlaLookup unchanged, so reports stay byte-identical (pinned by
tests/test_tilejoin_shards.py against the single-device backend and the
parity oracle)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..formats.kmer_table import KmerTable
from ..lookup.xla import XlaLookup, _round_up_pow2
from .mesh import TABLE_AXIS


def make_tilejoin_mesh(n_shards: int) -> jax.sharding.Mesh:
    devices = jax.devices()
    if len(devices) < n_shards:  # mirror mesh.make_mesh: never truncate
        raise ValueError(
            f"need {n_shards} devices, have {len(devices)}")
    devs = np.array(devices[:n_shards])
    return jax.sharding.Mesh(devs, (TABLE_AXIS,))


class TileJoinShardedLookup(XlaLookup):
    """Tile-join lookup with the plane and bins sharded over a 1-D
    ``table`` mesh. Same exact-result contract as the single-chip
    impl."""

    def __init__(self, table: KmerTable, mesh: Optional[jax.sharding.Mesh]
                 = None, n_shards: Optional[int] = None, **kw):
        if mesh is None:
            mesh = make_tilejoin_mesh(n_shards or len(jax.devices()))
        if TABLE_AXIS not in mesh.shape:
            raise ValueError(f"mesh must carry a '{TABLE_AXIS}' axis")
        self.mesh = mesh
        self.n_shards = int(mesh.shape[TABLE_AXIS])
        # pad the super-tile count to split evenly over shards (read by
        # XlaLookup's tilejoin branch)
        self.TJ_TILES_MULTIPLE = self.n_shards
        self._steps: dict = {}
        super().__init__(table, probe_impl="tilejoin", **kw)
        if self.probe_impl != "tilejoin":  # geometry fell back (huge w1)
            raise ValueError(
                f"table geometry unsupported by the tile-join kernel "
                f"(fell back to {self.probe_impl}); use sharded_lookup")

    def _place_tj_plane(self, tiles: np.ndarray, put):
        return jax.device_put(
            tiles, NamedSharding(self.mesh, P(TABLE_AXIS, None, None)))

    def _step_for(self, cap128: int):
        step = self._steps.get(cap128)
        if step is None:
            from ..lookup.pallas_tilejoin import TPG, tilejoin_probe

            nsup_loc = (self.n_tiles // TPG) // self.n_shards
            w, form, interp = self.w1, self._tj_form, self._tj_interpret

            def local_probe(fp_loc, pk_loc):
                # one pallas grid per shard over its local super-tiles;
                # ids are LOCAL (each shard's bins are its plane slice's)
                ids = jnp.arange(nsup_loc, dtype=jnp.int32)
                return tilejoin_probe(fp_loc, ids, pk_loc, w, cap128,
                                      form=form, interpret=interp)

            # check_vma=False: pallas_call's out_shape carries no
            # varying-axis annotation, which this JAX's vma checker
            # rejects inside shard_map (same as stream_shards)
            step = jax.jit(jax.shard_map(
                local_probe, mesh=self.mesh, check_vma=False,
                in_specs=(P(TABLE_AXIS, None, None),
                          P(TABLE_AXIS, None, None, None)),
                out_specs=P(TABLE_AXIS, None, None, None)))
            self._steps[cap128] = step
        return step

    def dispatch_probe(self, q_fp: np.ndarray, homes: np.ndarray,
                       device_sort: bool = False):
        from ..lookup.pallas_tilejoin import TPG, bin_queries_tiles_dense

        n = len(homes)
        nb = n if n == self.chunk else max(_round_up_pow2(n), 4096)
        cap = self._select_tile_cap(homes, n, nb)
        _, packed_b, block_of, rank_of = bin_queries_tiles_dense(
            q_fp, homes, self.stride, cap, self.n_tiles,
            n_bands=self._tj_bands(cap))
        pk = jax.device_put(
            packed_b, NamedSharding(self.mesh, P(TABLE_AXIS, None, None,
                                                 None)))
        out = self._step_for(cap // 128)(self.tbl_fp, pk)
        return ("tiles", out, block_of, rank_of, cap * TPG, n)

    def resolve_probe(self, pending):
        if pending[0] == "tiles":
            from ..lookup.pallas_tilejoin import (TPG, decode_fst,
                                                  unpack_fst)
            from .multihost import fetch_global

            _, out, block_of, rank_of, cells, n = pending
            fst = unpack_fst(np.asarray(fetch_global(out)), cells // TPG)
            ok = rank_of < cells
            if ok.all():
                return decode_fst(fst[block_of, rank_of], self.w1)
            rc = np.minimum(rank_of, cells - 1)
            off, state = decode_fst(fst[block_of, rc], self.w1)
            return (np.where(ok, off, 0).astype(np.uint8),
                    np.where(ok, state, 0).astype(np.uint8))
        return super().resolve_probe(pending)
