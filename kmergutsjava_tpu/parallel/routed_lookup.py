"""All-to-all routed sharded lookup.

The replicating sharded path (sharded_lookup.py) sends every query to every
table shard and psums the answers — simple, but per-query traffic scales
with the shard count. This module implements the bandwidth-optimal design
from the build plan: each device owns a slot range of the table AND a slice
of the query stream; queries are binned by owner shard (home // slice) and
exchanged with ONE `lax.all_to_all`, probed locally by their owner, and the
(found, offset) answers return with a second all_to_all — per-query traffic
is O(1) in the shard count, riding ICI.

Binning uses fixed-capacity buffers (shape-static): capacity is the mean
per-owner load times a slack factor. With a uniform hash (home = value %
numSigs, numSigs prime) overload is statistically negligible; queries that
would overflow a bin are flagged and returned unanswered, and the host
resolves them through the single-device path (exactness preserved).

Like the fingerprint backend, only (fp, home) travel; verification happens
host-side against the table's host arrays.
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats.kmer_table import KmerTable
from ..lookup.parity import LookupHits
from ..lookup.xla import FP_EMPTY, FP_MOD, XlaLookup

AXIS = "shard"


def make_routed_mesh(n_shards: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_shards:
        raise ValueError(f"need {n_shards} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_shards]), (AXIS,))


def _routed_step(fp_ref, qfp, homes, valid, *, s_loc, probe_window, cap,
                 n_shards, stride=0):
    """Per-device body under shard_map.

    fp_ref: [1, rows_loc, 128] local fingerprint slice (slot-range slice
    + probe halo, laid out in 128-lane rows — TPU XLA vectorizes row
    gathers but runs 1-D-operand gathers scalar, see docs/performance.md;
    with stride > 0 the rows OVERLAP so any window fits in one row — one
    gather instead of two, as in lookup/xla.py probe_fingerprint_rows1)
    qfp/homes/valid: [n_loc] local query slice
    Returns (off_u8, state_u8, overflow_bool) for the local queries.
    """
    fp2d = fp_ref[0]
    n_loc = qfp.shape[0]
    owner = jnp.clip(homes // s_loc, 0, n_shards - 1).astype(jnp.int32)
    owner = jnp.where(valid, owner, n_shards)  # park invalid lanes

    # stable bin assignment: rank of each query within its owner bin
    order = jnp.argsort(owner, stable=True)
    owner_sorted = owner[order]
    # rank within run of equal owners
    idx = jnp.arange(n_loc, dtype=jnp.int32)
    first_of_owner = jnp.searchsorted(owner_sorted, owner_sorted, side="left")
    rank = idx - first_of_owner.astype(jnp.int32)
    overflow_sorted = (rank >= cap) | (owner_sorted >= n_shards)
    # scatter into [n_shards, cap+1] bins (column `cap` is the parking slot
    # for overflow/invalid lanes so they cannot clobber real entries);
    # FP_EMPTY fingerprints never match
    safe_owner = jnp.where(overflow_sorted, 0, owner_sorted)
    safe_rank = jnp.where(overflow_sorted, cap, rank)
    src = order
    bin_qfp = jnp.full((n_shards, cap + 1), FP_EMPTY, dtype=jnp.uint16).at[
        safe_owner, safe_rank].set(
        jnp.where(overflow_sorted, jnp.uint16(FP_EMPTY), qfp[src]))
    bin_home = jnp.zeros((n_shards, cap + 1), dtype=jnp.int32).at[
        safe_owner, safe_rank].set(
        jnp.where(overflow_sorted, 0, homes[src]))
    bin_qfp = bin_qfp[:, :cap]
    bin_home = bin_home[:, :cap]

    # exchange: row t goes to shard t; we receive one row from every shard
    recv_qfp = jax.lax.all_to_all(bin_qfp, AXIS, split_axis=0, concat_axis=0,
                                  tiled=True)
    recv_home = jax.lax.all_to_all(bin_home, AXIS, split_axis=0,
                                   concat_axis=0, tiled=True)

    # local probe of the received queries against our slot slice: the
    # row-gather formulation, one row with the overlapped layout, two
    # consecutive rows otherwise (lane arithmetic selects the window)
    shard = jax.lax.axis_index(AXIS)
    local = recv_home.reshape(-1).astype(jnp.int32) - shard * s_loc
    local = jnp.clip(local, 0, s_loc - 1)
    if stride:
        r = local // jnp.int32(stride)
        o = local - r * jnp.int32(stride)
        win = jnp.take(fp2d, r, axis=0)  # [n, 128]
        rel = jnp.arange(128, dtype=jnp.int32)[None, :] - o[:, None]
    else:
        r = jax.lax.shift_right_logical(local, jnp.int32(7))
        o = local & jnp.int32(127)
        row0 = jnp.take(fp2d, r, axis=0)
        row1 = jnp.take(fp2d, r + 1, axis=0)
        win = jnp.concatenate([row0, row1], axis=1)  # [n, 256]
        rel = jnp.arange(256, dtype=jnp.int32)[None, :] - o[:, None]
    in_window = (rel >= 0) & (rel < probe_window)
    big = jnp.int32(probe_window)
    rq = recv_qfp.reshape(-1)
    cand = (win == rq[:, None]) & in_window
    empty = (win == jnp.uint16(FP_EMPTY)) & in_window
    first_cand = jnp.min(jnp.where(cand, rel, big), axis=1)
    first_empty = jnp.min(jnp.where(empty, rel, big), axis=1)
    has_cand = (first_cand < big) & (first_cand < first_empty)
    empty_any = first_empty < big
    off = jnp.where(has_cand, first_cand, 0).astype(jnp.uint8)
    state = (has_cand.astype(jnp.uint8) + 2 * empty_any.astype(jnp.uint8))

    # answers travel back with the mirrored all_to_all
    back_off = jax.lax.all_to_all(off.reshape(n_shards, cap), AXIS,
                                  split_axis=0, concat_axis=0, tiled=True)
    back_state = jax.lax.all_to_all(state.reshape(n_shards, cap), AXIS,
                                    split_axis=0, concat_axis=0, tiled=True)

    # un-bin into original local query order (gather indices kept in range;
    # overflow lanes are masked anyway)
    g_rank = jnp.where(overflow_sorted, 0, rank)
    out_off = jnp.zeros(n_loc, dtype=jnp.uint8).at[src].set(
        jnp.where(overflow_sorted, 0, back_off[safe_owner, g_rank]))
    out_state = jnp.zeros(n_loc, dtype=jnp.uint8).at[src].set(
        jnp.where(overflow_sorted, 0, back_state[safe_owner, g_rank]))
    out_over = jnp.zeros(n_loc, dtype=bool).at[src].set(overflow_sorted)
    return out_off, out_state, out_over


class RoutedLookup:
    """Host driver around the routed SPMD step."""

    def __init__(self, table: KmerTable, mesh: Mesh, probe_window: int = 16,
                 slack: float = 2.0):
        self.table = table
        self.mesh = mesh
        self.n_shards = mesh.shape[AXIS]
        self.num_sigs = table.num_sigs
        self.s_loc = -(-table.num_sigs // self.n_shards)
        self.probe_window = probe_window
        self.slack = slack
        # exact single-device fallback (overflow + verification failures)
        self._exact = XlaLookup(table)
        if probe_window > 128:
            raise ValueError("routed lookup requires probe_window <= 128 "
                             "(two-row gather); rebuild the table at a "
                             "lower load factor")
        total = self.n_shards * self.s_loc + probe_window
        fp = np.full(total, FP_EMPTY, dtype=np.uint16)
        occ = table.occupied
        fp[: table.num_sigs][occ] = (
            table.slots["kmer"][occ] % FP_MOD).astype(np.uint16)
        # per-shard slice (slot range + halo) in 128-lane rows; for
        # probe_window <= 64 the rows OVERLAP (stride = 128 - W) so the
        # step's gather is one row per query instead of two
        import os

        slice_len = self.s_loc + probe_window
        self.stride = 128 - probe_window if probe_window <= 64 else 0
        if self.stride:
            # storage gate (see sharded_lookup.shard_table_planes): the
            # overlapped uint16 plane costs 128/stride x per shard
            budget = int(os.environ.get("KMER_ROWS1_MAX_BYTES", 4 << 30))
            rows_ov = (self.s_loc - 1) // self.stride + 1
            if rows_ov * 128 * 2 > budget:
                self.stride = 0
        if self.stride:
            rows_loc = (self.s_loc - 1) // self.stride + 1
            ext = (rows_loc - 1) * self.stride + 128
        else:
            rows_loc = -(-slice_len // 128) + 1
            ext = rows_loc * 128
        shards = np.full((self.n_shards, ext), FP_EMPTY, dtype=np.uint16)
        for i in range(self.n_shards):
            shards[i, :slice_len] = fp[i * self.s_loc:
                                       i * self.s_loc + slice_len]
        if self.stride:
            shards3d = np.ascontiguousarray(np.lib.stride_tricks.as_strided(
                shards, shape=(self.n_shards, rows_loc, 128),
                strides=(shards.strides[0], 2 * self.stride, 2)))
        else:
            shards3d = shards.reshape(self.n_shards, rows_loc, 128)
        self.fp_shards = jax.device_put(
            shards3d, NamedSharding(mesh, P(AXIS, None, None)))
        self._step_cache = {}

    def _step(self, n_loc: int, cap: int):
        key = (n_loc, cap)
        if key not in self._step_cache:
            fn = partial(_routed_step, s_loc=self.s_loc,
                         probe_window=self.probe_window, cap=cap,
                         n_shards=self.n_shards, stride=self.stride)
            self._step_cache[key] = jax.jit(jax.shard_map(
                fn, mesh=self.mesh,
                in_specs=(P(AXIS, None, None), P(AXIS), P(AXIS), P(AXIS)),
                out_specs=(P(AXIS), P(AXIS), P(AXIS)),
            ))
        return self._step_cache[key]

    def lookup(self, values: np.ndarray, cnt_id: np.ndarray,
               pos: np.ndarray) -> LookupHits:
        values = np.asarray(values, dtype=np.int64)
        n = len(values)
        if n == 0:
            z = np.zeros(0)
            return LookupHits.from_lists(z, z, z, z, z, z, -1)
        t = self.n_shards
        n_loc = -(-n // t)
        n_pad = n_loc * t
        homes = np.zeros(n_pad, np.int32)
        homes[:n] = (values % np.int64(self.num_sigs)).astype(np.int32)
        qfp = np.full(n_pad, FP_EMPTY, np.uint16)
        qfp[:n] = (values % FP_MOD).astype(np.uint16)
        valid = np.zeros(n_pad, bool)
        valid[:n] = True
        cap = max(64, int(n_loc / t * self.slack))
        sharding = NamedSharding(self.mesh, P(AXIS))
        step = self._step(n_loc, cap)
        from .multihost import fetch_global

        off, state, over = fetch_global(step(
            self.fp_shards,
            jax.device_put(jnp.asarray(qfp), sharding),
            jax.device_put(jnp.asarray(homes), sharding),
            jax.device_put(jnp.asarray(valid), sharding)))
        off = off[:n].astype(np.int64)
        state = state[:n]
        over = over[:n]

        has_cand = ((state & 1) != 0) & ~over
        empty_any = ((state & 2) != 0) & ~over
        found = np.zeros(n, dtype=bool)
        ci = np.nonzero(has_cand)[0]
        homes64 = homes[:n].astype(np.int64)
        slots_c = homes64[ci] + off[ci]
        verified = self.table.slots["kmer"][
            np.minimum(slots_c, self.num_sigs - 1)] == values[ci]
        found[ci] = verified
        todo = np.zeros(n, dtype=bool)
        todo[ci] = ~verified
        todo |= over | (~has_cand & ~empty_any)
        slot_off = np.where(found, off, 0)

        ti = np.nonzero(todo)[0]
        if len(ti):
            sub = self._exact.lookup(values[ti], np.arange(len(ti)),
                                     np.zeros(len(ti)),
                                     compute_kmers_found=False)
            # exact backend returns compacted hits; reconstruct
            hit_rows = ti[sub.cnt_id]
            found[hit_rows] = True
            # recover offsets from slots: exact meta already final; mark via
            # direct meta below using sub's arrays
        mask = found
        slots = np.minimum(homes64[mask] + slot_off[mask], self.num_sigs - 1)
        ts = self.table.slots
        otu = ts["otu"][slots].copy()
        avg = ts["avg_from_end"][slots].copy()
        fi = ts["fi"][slots].copy()
        wt = ts["wt"][slots].copy()
        if len(ti):
            pos_in_mask = np.cumsum(mask) - 1
            hr = ti[sub.cnt_id]
            otu[pos_in_mask[hr]] = sub.otu
            avg[pos_in_mask[hr]] = sub.avg_from_end
            fi[pos_in_mask[hr]] = sub.fi
            wt[pos_in_mask[hr]] = sub.wt
        return LookupHits(
            cnt_id=np.asarray(cnt_id)[mask].astype(np.int64),
            pos=np.asarray(pos)[mask].astype(np.int64),
            otu=otu, avg_from_end=avg, fi=fi, wt=wt,
            kmers_found=int(np.unique(values[mask]).size),
        )
