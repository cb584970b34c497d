"""Superblock-sharded stream-kernel lookup vs the parity oracle."""
import numpy as np
import pytest

from kmergutsjava_tpu.formats.kmer_table import build_table
from kmergutsjava_tpu.lookup.parity import lookup_stream
from kmergutsjava_tpu.parallel.stream_shards import (StreamShardedLookup,
                                                     make_stream_mesh)
from test_lookup import canon, make_queries
from test_table import random_signatures


@pytest.mark.parametrize("n_shards,n_sigs,seed", [
    (2, 2500, 0),
    (8, 2500, 1),     # tiny table: nsuper padded 1 -> 8 (mostly-empty shards)
    (8, 40000, 2),
    (4, 120000, 3),   # several superblocks per shard
])
def test_stream_sharded_matches_parity(n_shards, n_sigs, seed):
    rng = np.random.default_rng(seed)
    sig = random_signatures(rng, n_sigs)
    table = build_table(**sig, load_factor=0.7)
    lk = StreamShardedLookup(table, mesh=make_stream_mesh(n_shards))
    assert lk.nsuper % n_shards == 0
    values, cnt, pos = make_queries(rng, sig["kmers"], 2 * n_sigs)
    a = lookup_stream(table, values, cnt, pos)
    b = lk.lookup(values, cnt, pos)
    assert canon(a) == canon(b)
    assert a.kmers_found == b.kmers_found


def test_stream_sharded_dense_sweep():
    """Every slot queried on every channel (the kernel's target regime):
    hits exactly the occupied-slot signatures, zero misses wrong."""
    rng = np.random.default_rng(7)
    sig = random_signatures(rng, 30000)
    table = build_table(**sig, load_factor=0.65)
    lk = StreamShardedLookup(table, mesh=make_stream_mesh(8))
    s = np.int64(table.num_sigs)
    slots = np.arange(s, dtype=np.int64)
    ch0 = np.where(table.occupied, table.slots["kmer"], slots)
    values = np.concatenate([ch0] + [slots + k * s for k in range(1, 3)])
    cnt = np.zeros(len(values), np.int64)
    pos = np.arange(len(values), dtype=np.int64)
    a = lookup_stream(table, values, cnt, pos)
    b = lk.lookup(values, cnt, pos)
    assert canon(a) == canon(b)
    assert len(b) >= int(table.occupied.sum())


def test_stream_mesh_backend_end_to_end(tmp_path):
    import io

    from kmergutsjava_tpu.config import EngineConfig
    from kmergutsjava_tpu.formats.table_tools import (signatures_from_proteins,
                                                      write_data_dir)
    from kmergutsjava_tpu.models.pipeline import Engine

    aa = "ACDEFGHIKLMNPQRSTVWY"
    write_data_dir(str(tmp_path / "d"), signatures_from_proteins(
        [(aa, 0, 3)], weight=0.5), ["funcA"])
    outs = {}
    for backend, mesh in (("xla", None), ("stream", (4, 2)), ("stream", None)):
        out = io.StringIO()
        Engine(EngineConfig(aa=True, backend=backend, mesh_shape=mesh)).run(
            str(tmp_path / "d"), None, out, stdout=True,
            query_stream=io.StringIO(">P1\n" + aa + "\n"))
        outs[(backend, mesh)] = out.getvalue()
    assert len(set(outs.values())) == 1
    assert "CALL\t0\t18\t12\t0\tfuncA\t6.000000" in outs[("xla", None)]
