import numpy as np
import pytest

from kmergutsjava_tpu.constants import EMPTY_KMER, MAX_ENCODED
from kmergutsjava_tpu.formats.kmer_table import (TableError, build_table,
                                                 read_table, write_table)


def random_signatures(rng, n, max_val=MAX_ENCODED):
    kmers = rng.choice(max_val, size=n, replace=False).astype(np.int64)
    return dict(
        kmers=kmers,
        otu=rng.integers(0, 50, n).astype(np.int32),
        avg_from_end=rng.integers(0, 500, n).astype(np.int32),
        fi=rng.integers(0, 30, n).astype(np.int32),
        wt=rng.random(n).astype(np.float32),
    )


def simulate_linear_probe_insert(kmers, num_sigs):
    """Textbook first-free-slot insertion in ascending (home, value) order."""
    slots = {}
    home = kmers % num_sigs
    for h, v in sorted(zip(home.tolist(), kmers.tolist())):
        p = h
        while p in slots:
            p += 1
        slots[p] = v
    return slots


@pytest.mark.parametrize("n", [0, 1, 5, 200, 3000])
def test_build_matches_textbook_probing(n):
    rng = np.random.default_rng(n)
    sig = random_signatures(rng, n)
    table = build_table(**sig)
    want = simulate_linear_probe_insert(sig["kmers"], table.num_sigs)
    got = {i: int(v) for i, v in enumerate(table.slots["kmer"]) if v <= MAX_ENCODED}
    assert got == want
    # last slot always empty; no wraparound
    assert table.slots["kmer"][-1] == EMPTY_KMER
    assert table.compute_max_probe() == table.max_probe


def test_high_load_factor_probe_chains():
    rng = np.random.default_rng(42)
    sig = random_signatures(rng, 2000)
    table = build_table(**sig, load_factor=0.95)
    assert table.max_probe >= 2  # collisions certainly occurred
    want = simulate_linear_probe_insert(sig["kmers"], table.num_sigs)
    got = {i: int(v) for i, v in enumerate(table.slots["kmer"]) if v <= MAX_ENCODED}
    assert got == want


def test_metadata_alignment():
    rng = np.random.default_rng(3)
    sig = random_signatures(rng, 500)
    table = build_table(**sig)
    by_kmer = {int(k): i for i, k in enumerate(sig["kmers"])}
    occ = np.nonzero(table.occupied)[0]
    for slot in occ.tolist():
        src = by_kmer[int(table.slots["kmer"][slot])]
        assert table.slots["otu"][slot] == sig["otu"][src]
        assert table.slots["avg_from_end"][slot] == sig["avg_from_end"][src]
        assert table.slots["fi"][slot] == sig["fi"][src]
        assert table.slots["wt"][slot] == sig["wt"][src]


def test_duplicate_kmers_rejected():
    with pytest.raises(TableError):
        build_table(np.array([5, 5], dtype=np.int64), [0, 0], [0, 0], [0, 0],
                    [0.0, 0.0])


@pytest.mark.parametrize("gz", [False, True])
def test_write_read_roundtrip(tmp_path, gz):
    rng = np.random.default_rng(9)
    sig = random_signatures(rng, 300)
    table = build_table(**sig)
    path = str(tmp_path / ("kmer.table.mem_map" + (".gz" if gz else "")))
    write_table(path, table)
    back = read_table(path)
    assert back.num_sigs == table.num_sigs
    assert back.max_probe == table.max_probe
    assert np.array_equal(back.slots, table.slots)


def test_native_build_matches_numpy(monkeypatch):
    """The fused native builder (table_place + table_fill) must produce a
    byte-identical table to the pure-numpy path, including growth retries
    (tiny fixed num_sigs forces chains to the last slot) and the duplicate
    rejection."""
    import kmergutsjava_tpu.formats.kmer_table as kt

    if kt._builder_native() is None:
        pytest.skip("native builder unavailable")
    for seed, n, load in ((0, 700, 0.6), (1, 900, 0.95), (2, 50, 0.99)):
        rng = np.random.default_rng(seed)
        sig = random_signatures(rng, n)
        a = build_table(**sig, load_factor=load)
        with monkeypatch.context() as m:
            m.setattr(kt, "_builder_native", lambda: None)
            b = build_table(**sig, load_factor=load)
        assert a.num_sigs == b.num_sigs
        assert a.max_probe == b.max_probe
        assert np.array_equal(a.slots, b.slots)
    with monkeypatch.context() as m:
        m.setattr(kt, "_builder_native", lambda: None)
        with pytest.raises(TableError):
            build_table(np.array([7, 7], dtype=np.int64), [0, 0], [0, 0],
                        [0, 0], [0.0, 0.0])
