"""All-to-all routed sharded lookup vs the parity oracle on a CPU mesh."""
import numpy as np
import pytest

from kmergutsjava_tpu.formats.kmer_table import build_table
from kmergutsjava_tpu.lookup.parity import lookup_stream
from kmergutsjava_tpu.parallel.routed_lookup import (RoutedLookup,
                                                     make_routed_mesh)
from test_lookup import canon, make_queries
from test_table import random_signatures


@pytest.mark.parametrize("n_shards,seed", [(2, 0), (4, 1), (8, 2)])
def test_routed_matches_parity(n_shards, seed):
    rng = np.random.default_rng(seed)
    sig = random_signatures(rng, 3000)
    table = build_table(**sig, load_factor=0.7)
    mesh = make_routed_mesh(n_shards)
    rl = RoutedLookup(table, mesh,
                      probe_window=max(16, table.max_probe))
    values, cnt, pos = make_queries(rng, sig["kmers"], 6000)
    a = lookup_stream(table, values, cnt, pos)
    b = rl.lookup(values, cnt, pos)
    assert canon(a) == canon(b)


def test_routed_overflow_fallback():
    """Tiny slack forces bin overflow; the exact fallback must keep results
    correct."""
    rng = np.random.default_rng(5)
    sig = random_signatures(rng, 1000)
    table = build_table(**sig)
    mesh = make_routed_mesh(4)
    rl = RoutedLookup(table, mesh, probe_window=max(16, table.max_probe),
                      slack=0.1)  # deliberately too small
    values, cnt, pos = make_queries(rng, sig["kmers"], 4000)
    a = lookup_stream(table, values, cnt, pos)
    b = rl.lookup(values, cnt, pos)
    assert canon(a) == canon(b)


def test_routed_skewed_homes():
    """All queries target one shard (worst-case skew)."""
    rng = np.random.default_rng(9)
    sig = random_signatures(rng, 2000)
    table = build_table(**sig)
    mesh = make_routed_mesh(4)
    rl = RoutedLookup(table, mesh, probe_window=max(16, table.max_probe))
    # pick signature values homing into the first shard's range
    homes = sig["kmers"] % table.num_sigs
    first_shard = sig["kmers"][homes < rl.s_loc]
    values = np.tile(first_shard[:50], 40).astype(np.int64)
    a = lookup_stream(table, values, np.zeros(len(values)),
                      np.arange(len(values)))
    b = rl.lookup(values, np.zeros(len(values)), np.arange(len(values)))
    assert canon(a) == canon(b)
    assert len(b) == len(values)


def test_routed_backend_end_to_end(tmp_path):
    import io

    from kmergutsjava_tpu.config import EngineConfig
    from kmergutsjava_tpu.formats.table_tools import (signatures_from_proteins,
                                                      write_data_dir)
    from kmergutsjava_tpu.models.pipeline import Engine

    aa = "ACDEFGHIKLMNPQRSTVWY"
    write_data_dir(str(tmp_path / "d"), signatures_from_proteins(
        [(aa, 0, 3)], weight=0.5), ["funcA"])
    fasta = ">P1\n" + aa + "\n"
    outs = {}
    for backend in ("xla", "routed"):
        out = io.StringIO()
        Engine(EngineConfig(aa=True, backend=backend, mesh_shape=(4, 2))).run(
            str(tmp_path / "d"), None, out, stdout=True,
            query_stream=io.StringIO(fasta))
        outs[backend] = out.getvalue()
    assert outs["xla"] == outs["routed"]
    assert "CALL\t0\t18\t12\t0\tfuncA\t6.000000" in outs["xla"]
