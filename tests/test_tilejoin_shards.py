"""Sharded tile-join lookup (parallel/tilejoin_shards.py) on the virtual
8-device CPU mesh: zero-collective table parallelism for the sparse
kernel, byte-compared against the single-device backend and the parity
oracle."""
import numpy as np
import pytest

from kmergutsjava_tpu.lookup.parity import lookup_stream
from kmergutsjava_tpu.lookup.xla import XlaLookup
from kmergutsjava_tpu.parallel.tilejoin_shards import (TileJoinShardedLookup,
                                                       make_tilejoin_mesh)
from tests.test_tilejoin import _fixture, _mixed_queries, _sorted_cols


@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_matches_parity_and_single(n_shards):
    table, kmers = _fixture(n_sigs=60_000, seed=21)
    lk = TileJoinShardedLookup(table, mesh=make_tilejoin_mesh(n_shards))
    assert lk.n_tiles % (8 * n_shards) == 0  # TPG * shards
    values = _mixed_queries(kmers, 6000, seed=22)
    cnt = np.zeros(len(values), np.int64)
    pos = np.arange(len(values), dtype=np.int64)
    want = lookup_stream(table, values, cnt, pos)
    got = lk.lookup(values, cnt, pos)
    assert len(got) == len(want)
    for a, b in zip(_sorted_cols(got), _sorted_cols(want)):
        np.testing.assert_array_equal(a, b)
    single = XlaLookup(table, probe_impl="tilejoin").lookup(values, cnt,
                                                            pos)
    assert len(single) == len(want)


def test_sharded_banded_form_matches_parity(monkeypatch):
    """The banded kernel form (gather2b) through the SHARDED dispatcher:
    the per-shard bins must carry the same band-partitioned cell layout
    the kernel assumes (dispatch_probe passes _tj_bands through
    bin_queries_tiles_dense)."""
    monkeypatch.setenv("KMER_TJ_FORM", "gather2b")
    table, kmers = _fixture(n_sigs=60_000, seed=25)
    lk = TileJoinShardedLookup(table, mesh=make_tilejoin_mesh(2))
    assert lk._tj_form == "gather2b"
    values = _mixed_queries(kmers, 6000, seed=26)
    cnt = np.zeros(len(values), np.int64)
    pos = np.arange(len(values), dtype=np.int64)
    want = lookup_stream(table, values, cnt, pos)
    got = lk.lookup(values, cnt, pos)
    assert len(got) == len(want)
    for a, b in zip(_sorted_cols(got), _sorted_cols(want)):
        np.testing.assert_array_equal(a, b)


def test_sharded_streaming_front_end():
    from kmergutsjava_tpu.lookup.xla import StreamingLookup

    table, kmers = _fixture(n_sigs=40_000, seed=23)
    lk = TileJoinShardedLookup(table, mesh=make_tilejoin_mesh(4),
                               chunk=2048)
    values = _mixed_queries(kmers, 5000, seed=24)
    want = lookup_stream(table, values, np.zeros(len(values), np.int64),
                         np.arange(len(values), dtype=np.int64))
    st = StreamingLookup(lk, compute_kmers_found=True)
    for s in range(0, len(values), 1300):
        e = min(s + 1300, len(values))
        st.add_batch(values[s:e], 0, np.arange(s, e, dtype=np.int64))
    got = st.finish()
    assert len(got) == len(want)
    for a, b in zip(_sorted_cols(got), _sorted_cols(want)):
        np.testing.assert_array_equal(a, b)


def test_engine_xla_mesh_uses_sharded_tilejoin(monkeypatch, tmp_path):
    """backend=xla with --mesh routes through TileJoinShardedLookup
    (KMER_TILEJOIN=gather arms the kernel off-TPU for the test) and the
    report stays byte-identical to the parity backend."""
    import io

    from kmergutsjava_tpu.config import EngineConfig
    from kmergutsjava_tpu.formats.function_index import write_function_index
    from kmergutsjava_tpu.formats.kmer_table import write_table
    from kmergutsjava_tpu.models import pipeline as pl
    from kmergutsjava_tpu.models.pipeline import Engine

    monkeypatch.setenv("KMER_TILEJOIN", "gather")
    table, kmers = _fixture(n_sigs=20_000, seed=31)
    td = str(tmp_path)
    write_table(td + "/kmer.table.mem_map", table)
    write_function_index(td + "/function.index",
                         [f"fn {i}" for i in range(100)])
    rng = np.random.default_rng(32)
    alpha = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)
    rows = []
    for i in range(24):
        row = alpha[rng.integers(0, 20, 60)]
        v = int(kmers[rng.integers(len(kmers))])
        digits = [(v // 20 ** (7 - k)) % 20 for k in range(8)]
        col = int(rng.integers(0, 30))
        row[col:col + 8] = alpha[digits]
        row[col + 12:col + 20] = alpha[digits]
        rows.append(row.tobytes().decode())
    fasta = "".join(f">p{i} d\n{r}\n" for i, r in enumerate(rows))

    got = io.StringIO()
    Engine(EngineConfig(backend="xla", aa=True, min_hits=2,
                        mesh_shape=(1, 4))).run(
        td, None, got, stdout=True, query_stream=io.StringIO(fasta))
    # the cache must hold the sharded class
    lk = next(iter(pl._LOOKUP_CACHE.values()))
    from kmergutsjava_tpu.parallel.tilejoin_shards import \
        TileJoinShardedLookup
    assert isinstance(lk, TileJoinShardedLookup)
    want = io.StringIO()
    Engine(EngineConfig(backend="parity", aa=True, min_hits=2)).run(
        td, None, want, stdout=True, query_stream=io.StringIO(fasta))
    assert "CALL\t" in want.getvalue()
    assert got.getvalue() == want.getvalue()


def test_mesh_too_few_devices_raises():
    """Advisor r4: requesting more shards than devices must error, not
    silently truncate to a smaller mesh."""
    import jax

    with pytest.raises(ValueError, match="devices"):
        make_tilejoin_mesh(len(jax.devices()) + 1)


def test_engine_mesh_respects_explicit_probe_impl(monkeypatch, tmp_path):
    """Advisor r4: KMER_PROBE_IMPL naming a non-tilejoin impl must win
    over the --mesh sharded-tilejoin branch."""
    import io

    from kmergutsjava_tpu.config import EngineConfig
    from kmergutsjava_tpu.formats.function_index import write_function_index
    from kmergutsjava_tpu.formats.kmer_table import write_table
    from kmergutsjava_tpu.models import pipeline as pl
    from kmergutsjava_tpu.models.pipeline import Engine

    monkeypatch.setenv("KMER_TILEJOIN", "gather")
    monkeypatch.setenv("KMER_PROBE_IMPL", "rows1")
    table, _ = _fixture(n_sigs=20_000, seed=41)
    td = str(tmp_path)
    write_table(td + "/kmer.table.mem_map", table)
    write_function_index(td + "/function.index",
                         [f"fn {i}" for i in range(100)])
    pl._LOOKUP_CACHE.clear()
    out = io.StringIO()
    Engine(EngineConfig(backend="xla", aa=True, mesh_shape=(1, 4))).run(
        td, None, out, stdout=True,
        query_stream=io.StringIO(">p0 d\nACDEFGHIKLMNPQRSTVWY\n"))
    lk = next(iter(pl._LOOKUP_CACHE.values()))
    assert not isinstance(lk, TileJoinShardedLookup)
    assert lk.probe_impl == "rows1"
