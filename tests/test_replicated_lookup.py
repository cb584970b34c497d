"""Replicated (pure data-parallel) lookup vs the parity oracle."""
import numpy as np
import pytest

from kmergutsjava_tpu.formats.kmer_table import build_table
from kmergutsjava_tpu.lookup.parity import lookup_stream
from kmergutsjava_tpu.parallel.replicated_lookup import (ReplicatedLookup,
                                                         make_data_mesh)
from test_lookup import canon, make_queries
from test_table import random_signatures


@pytest.mark.parametrize("n_dev,seed", [(2, 0), (8, 1)])
def test_replicated_matches_parity(n_dev, seed):
    rng = np.random.default_rng(seed)
    sig = random_signatures(rng, 2500)
    table = build_table(**sig, load_factor=0.75)
    rl = ReplicatedLookup(table, make_data_mesh(n_dev))
    values, cnt, pos = make_queries(rng, sig["kmers"], 5000)
    a = lookup_stream(table, values, cnt, pos)
    b = rl.lookup(values, cnt, pos)
    assert canon(a) == canon(b)
    assert a.kmers_found == b.kmers_found


def test_replicated_backend_end_to_end(tmp_path):
    import io

    from kmergutsjava_tpu.config import EngineConfig
    from kmergutsjava_tpu.formats.table_tools import (signatures_from_proteins,
                                                      write_data_dir)
    from kmergutsjava_tpu.models.pipeline import Engine

    aa = "ACDEFGHIKLMNPQRSTVWY"
    write_data_dir(str(tmp_path / "d"), signatures_from_proteins(
        [(aa, 0, 3)], weight=0.5), ["funcA"])
    outs = {}
    for backend in ("xla", "replicated"):
        out = io.StringIO()
        Engine(EngineConfig(aa=True, backend=backend, mesh_shape=(4, 2))).run(
            str(tmp_path / "d"), None, out, stdout=True,
            query_stream=io.StringIO(">P1\n" + aa + "\n"))
        outs[backend] = out.getvalue()
    assert outs["xla"] == outs["replicated"]
    assert "CALL\t0\t18\t12\t0\tfuncA\t6.000000" in outs["xla"]
