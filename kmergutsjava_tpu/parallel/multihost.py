"""Multi-host pod-slice execution helpers.

The reference is a single JVM with no distribution story (SURVEY.md §2.2);
the TPU-native scaling path is:

- ``jax.distributed.initialize`` per host (ICI inside a slice, DCN across
  hosts) — the only process-level setup the engine needs;
- input sharding at the FASTA level: each host parses only its share of
  records (round-robin by record index, so no host-to-host data exchange is
  needed before the device phase);
- the (data, table) mesh from parallel/mesh spans all hosts; shard_map's
  psum hit-merge rides ICI/DCN automatically;
- hit containers are host-local (a record's 6 containers live where it was
  parsed), so the grouping phase and report emission need no collectives —
  each host writes its own report shard, concatenated by record order.

Only single-process multi-device execution can be exercised in CI (see
__graft_entry__.dryrun_multichip which runs the full sharded step on a
virtual 8-device CPU mesh); this module carries the process bootstrap and
the record-sharding contract.
"""
from __future__ import annotations

from typing import Iterable, Iterator, Optional

from ..formats.fasta import FastaRecord


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime (no-op for single process)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def fetch_global(x):
    """device_get that also works when the array's mesh spans processes:
    non-addressable outputs (e.g. the data-sharded hit columns of the psum
    lookup on a multi-host mesh) are assembled with an allgather over the
    distributed runtime. Pytrees pass through leaf-wise."""
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    if all(getattr(l, "is_fully_addressable", True) for l in leaves):
        return jax.device_get(x)
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda l: (jax.device_get(l)
                   if getattr(l, "is_fully_addressable", True)
                   else multihost_utils.process_allgather(l, tiled=True)), x)


def shard_records(records: Iterable[FastaRecord], process_id: int,
                  num_processes: int) -> Iterator[FastaRecord]:
    """Round-robin record assignment: host p takes records i with
    i % num_processes == p. Deterministic, order-preserving per host, and
    balanced for corpora of many records."""
    for i, rec in enumerate(records):
        if i % num_processes == process_id:
            yield rec
