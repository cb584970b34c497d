"""Sharded lookup over a virtual 8-device CPU mesh vs single-device answers."""
import numpy as np
import pytest

from kmergutsjava_tpu.formats.kmer_table import build_table
from kmergutsjava_tpu.parallel.mesh import make_mesh
from kmergutsjava_tpu.parallel.sharded_lookup import (make_sharded_lookup,
                                                      sharded_lookup_queries)
from kmergutsjava_tpu.lookup.xla import XlaLookup
from test_table import random_signatures


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (1, 8), (8, 1), (2, 2)])
def test_sharded_matches_single_device(mesh_shape):
    rng = np.random.default_rng(sum(mesh_shape))
    sig = random_signatures(rng, 2000)
    table = build_table(**sig, load_factor=0.8)
    mesh = make_mesh(*mesh_shape)
    probe_window = max(8, table.max_probe)
    step, planes = make_sharded_lookup(mesh, table, probe_window)

    from test_lookup import make_queries
    values, cnt, pos = make_queries(rng, sig["kmers"], 4096)
    found, otu, avg, fi, wt = sharded_lookup_queries(
        mesh, step, planes, values, table, pad_multiple=8)

    ref = XlaLookup(table).lookup(values, cnt, pos)
    mask = found.astype(bool)
    got = sorted(zip(values[mask].tolist(), otu[mask].tolist(),
                     avg[mask].tolist(), fi[mask].tolist(), wt[mask].tolist()))
    want = sorted(zip(values[np.isin(np.arange(len(values)), np.nonzero(
        _found_mask(ref, values))[0])].tolist(), ref.otu.tolist(),
        ref.avg_from_end.tolist(), ref.fi.tolist(), ref.wt.tolist()))
    assert int(mask.sum()) == len(ref)
    assert got == want


def _found_mask(ref, values):
    # reconstruct per-query found mask from the compacted LookupHits via pos
    mask = np.zeros(len(values), dtype=bool)
    mask[ref.pos] = True  # pos was arange(n) in make_queries
    return mask


def test_sharded_overlap_budget_gate(monkeypatch):
    """KMER_ROWS1_MAX_BYTES forces the plain two-row layout (stride 0) in
    the sharded and routed plane builders, and answers stay identical."""
    from kmergutsjava_tpu.parallel.routed_lookup import (RoutedLookup,
                                                         make_routed_mesh)
    from kmergutsjava_tpu.parallel.sharded_lookup import shard_table_planes

    rng = np.random.default_rng(17)
    sig = random_signatures(rng, 2000)
    table = build_table(**sig, load_factor=0.8)
    probe_window = max(8, table.max_probe)
    assert shard_table_planes(table, 2, probe_window)["stride"] > 0
    monkeypatch.setenv("KMER_ROWS1_MAX_BYTES", "128")
    planes = shard_table_planes(table, 2, probe_window)
    assert planes["stride"] == 0
    mesh = make_mesh(4, 2)
    from kmergutsjava_tpu.parallel.sharded_lookup import (
        make_sharded_lookup, sharded_lookup_queries)
    from test_lookup import make_queries
    values, cnt, pos = make_queries(rng, sig["kmers"], 2048)
    step, dplanes = make_sharded_lookup(mesh, table, probe_window)
    found, otu, avg, fi, wt = sharded_lookup_queries(
        mesh, step, dplanes, values, table, pad_multiple=8)
    ref = XlaLookup(table).lookup(values, cnt, pos)
    assert int(found.astype(bool).sum()) == len(ref)
    rmesh = make_routed_mesh(8)
    rl = RoutedLookup(table, rmesh, probe_window=max(16, probe_window))
    assert rl.stride == 0
    assert len(rl.lookup(values, cnt, pos)) == len(ref)


def test_sharded_backend_end_to_end(tmp_path):
    """Full engine run with backend='sharded' over the virtual mesh."""
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
    for backend, mesh in [("xla", None), ("sharded", (4, 2)), ("sharded", (2, 4))]:
        out = io.StringIO()
        cfg = EngineConfig(aa=True, backend=backend, mesh_shape=mesh)
        Engine(cfg).run(str(tmp_path / "d"), None, out, stdout=True,
                        query_stream=io.StringIO(fasta))
        outs[(backend, mesh)] = out.getvalue()
    assert outs[("xla", None)] == outs[("sharded", (4, 2))] == outs[("sharded", (2, 4))]
    assert "CALL\t0\t18\t12\t0\tfuncA\t6.000000" in outs[("xla", None)]


def test_sharded_metagenome_dna(tmp_path):
    """Config #4 analog: DNA read stream vs slot-range-sharded table."""
    import io
    import random

    from kmergutsjava_tpu.config import EngineConfig
    from kmergutsjava_tpu.formats.table_tools import (signatures_from_proteins,
                                                      write_data_dir)
    from kmergutsjava_tpu.models.pipeline import Engine

    rng = random.Random(3)
    aa = "ACDEFGHIKLMNPQRSTVWY"
    prots = ["".join(rng.choice(aa) for _ in range(60)) for _ in range(10)]
    write_data_dir(str(tmp_path / "d"), signatures_from_proteins(
        [(p, i, i % 4) for i, p in enumerate(prots)]),
        [f"f{i}" for i in range(10)])
    codon = {"A": "GCT", "C": "TGT", "D": "GAT", "E": "GAA", "F": "TTT",
             "G": "GGT", "H": "CAT", "I": "ATT", "K": "AAA", "L": "CTT",
             "M": "ATG", "N": "AAT", "P": "CCT", "Q": "CAA", "R": "CGT",
             "S": "TCT", "T": "ACT", "V": "GTT", "W": "TGG", "Y": "TAT"}
    reads = []
    for i in range(60):
        p = prots[i % len(prots)]
        frag = p[rng.randrange(0, 20): rng.randrange(40, 60)]
        reads.append("".join(codon[c] for c in frag))
    fasta = "".join(f">read{i}\n{r}\n" for i, r in enumerate(reads))
    outs = {}
    for backend in ("xla", "sharded"):
        out = io.StringIO()
        Engine(EngineConfig(aa=False, backend=backend, min_hits=3,
                            mesh_shape=(4, 2))).run(
            str(tmp_path / "d"), None, out, stdout=True,
            query_stream=io.StringIO(fasta))
        outs[backend] = out.getvalue()
    assert outs["xla"] == outs["sharded"]
    assert outs["xla"].count("processing ") == len(reads)
    assert "CALL\t" in outs["xla"]


def test_sharded_dna_step_matches_oracle():
    """Full on-device 6-frame pipeline over the mesh vs the scalar oracle."""
    import random

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import java_oracle as oracle
    from kmergutsjava_tpu.parallel.annotate_step import make_sharded_dna_step
    from kmergutsjava_tpu.parallel.mesh import DATA_AXIS

    rng = np.random.default_rng(6)
    pyrng = random.Random(6)
    sig = random_signatures(rng, 1500)
    table = build_table(**sig)
    mesh = make_mesh(4, 2)
    step, planes = make_sharded_dna_step(mesh, table,
                                         max(8, table.max_probe))
    b, lpad = 8, 192
    seqs = ["".join(pyrng.choice("ACGTacgtnN") for _ in range(pyrng.randint(30, lpad)))
            for _ in range(b)]
    ascii_u8 = np.zeros((b, lpad), dtype=np.uint8)
    lengths = np.zeros(b, dtype=np.int64)
    for i, s in enumerate(seqs):
        a = np.frombuffer(s.encode(), np.uint8)
        ascii_u8[i, : len(a)] = a
        lengths[i] = len(a)
    shard_b = NamedSharding(mesh, P(DATA_AXIS, None))
    shard_l = NamedSharding(mesh, P(DATA_AXIS))
    slotp = jax.device_get(step(
        planes["fp"], jax.device_put(jnp.asarray(ascii_u8), shard_b),
        jax.device_put(jnp.asarray(lengths), shard_l)))
    # fingerprint-candidate protocol: verify candidates host-side the way
    # the production decode does (models/spmd.py _decode)
    from kmergutsjava_tpu.ops.hostvalues import dna_values_at
    from kmergutsjava_tpu.parallel.sharded_lookup import gather_hit_metadata

    rr, gg, cc = np.nonzero(slotp)
    vals = dna_values_at(ascii_u8, lengths, rr, gg, cc)
    ok, _, _, _, _ = gather_hit_metadata(table, slotp[rr, gg, cc],
                                         values=vals)
    found = np.zeros(slotp.shape, dtype=bool)
    found[rr[ok], gg[ok], cc[ok]] = True
    # compare against oracle prepare + parity lookup per frame row
    from kmergutsjava_tpu.lookup.parity import lookup_stream

    for i, s in enumerate(seqs):
        want_frames = oracle.prepare_query(s, aa=False)
        for row in range(6):
            vals = [v for v, _ in want_frames[row]]
            poss = [p for _, p in want_frames[row]]
            ref = lookup_stream(table, np.array(vals, np.int64),
                                np.zeros(len(vals)), np.array(poss))
            got_pos = np.nonzero(found[i, row])[0]
            assert sorted(got_pos.tolist()) == sorted(ref.pos.tolist()), (i, row)
