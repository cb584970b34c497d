"""Sequence-parallel windowed DNA step vs host prepare + parity scan.

One contig is split into overlapping device windows sharded over the data
axis (parallel/seq_windows.py); the re-fused hits must equal the host
pipeline's per-container hits exactly — same containers, same global
protein positions, same metadata.
"""
import numpy as np
import pytest

from kmergutsjava_tpu.constants import K
from kmergutsjava_tpu.formats.fasta import FastaRecord
from kmergutsjava_tpu.formats.kmer_table import build_table
from kmergutsjava_tpu.lookup.parity import lookup_stream
from kmergutsjava_tpu.models.prepare import prepare_dna_numpy
from kmergutsjava_tpu.parallel.mesh import make_mesh
from kmergutsjava_tpu.parallel.seq_windows import (OVERLAP_NT,
                                                   make_windowed_dna_step,
                                                   plan_windows,
                                                   windowed_contig_hits)


class _ListStore:
    def __init__(self):
        self.v, self.c, self.p = [], [], []

    def add_batch(self, values, cnt_id, pos):
        n = len(values)
        self.v.append(np.asarray(values, np.int64).copy())
        self.c.append(np.broadcast_to(
            np.asarray(cnt_id, np.int64), (n,)).copy())
        self.p.append(np.asarray(pos, np.int64).copy())

    def cols(self):
        z = np.zeros(0, np.int64)
        cat = lambda xs: np.concatenate(xs) if xs else z
        return cat(self.v), cat(self.c), cat(self.p)


def _host_queries(seq: str):
    store = _ListStore()
    prepare_dna_numpy([FastaRecord("c", seq, "")], store)
    return store.cols()


def _table_from_values(rng, values, n_extra=200):
    """Signature table seeded from the contig's own k-mers (so hits exist)
    plus random extras."""
    uniq = np.unique(values)
    take = uniq[rng.random(len(uniq)) < 0.6] if len(uniq) else uniq
    extra = np.unique(rng.integers(0, 20 ** 8, n_extra, dtype=np.int64))
    kmers = np.unique(np.concatenate([take, extra]))
    n = len(kmers)
    return build_table(
        kmers,
        rng.integers(0, 40, n).astype(np.int32),
        rng.integers(0, 500, n).astype(np.int32),
        rng.integers(0, 30, n).astype(np.int32),
        rng.random(n).astype(np.float32),
        load_factor=0.75,
    )


def _rand_contig(rng, L):
    bases = np.frombuffer(b"ACGTacgt", dtype=np.uint8)
    a = rng.choice(bases, size=L)
    # sprinkle ambiguity codes (invalid codons -> 'x' aa, ref :320-343)
    amb = np.frombuffer(b"NRYKMnswx", dtype=np.uint8)
    m = rng.random(L) < 0.02
    a[m] = rng.choice(amb, size=int(m.sum()))
    return a.tobytes().decode("latin1")


def test_plan_windows_ownership_partition():
    """Every global k-mer anchor is owned by exactly one window, and the
    owned interval always lies inside the window's local frame row."""
    rng = np.random.default_rng(7)
    for L in [5, 23, 24, 26, 27, 30, 48, 49, 100, 301, 600, 2000]:
        for win_nt in [48, 90, 300]:
            if win_nt <= OVERLAP_NT:
                continue
            plan = plan_windows(L, win_nt)
            n_win = len(plan["s"])
            for f in range(3):
                for g, n_cod in ((f, (L - f) // 3), (3 + f, (L - f) // 3)):
                    owners = {}
                    for w in range(n_win):
                        a, b = plan["own_start"][w, g], plan["own_end"][w, g]
                        m_loc = (plan["len_w"][w]
                                 - (plan["row_map"][w, g] % 3)) // 3
                        # the tail window's open-ended interval is bounded
                        # by its local frame capacity (kernel validity mask)
                        b = min(int(b), int(m_loc) - K + 1)
                        for jj in range(int(a), b):
                            j = int(plan["j0"][w, g] + jj)
                            if j + K > n_cod:
                                continue  # beyond the global frame
                            assert jj + K <= m_loc, (L, win_nt, w, g, jj)
                            assert j not in owners, (L, win_nt, g, j)
                            owners[j] = w
                    want = set(range(max(n_cod - K + 1, 0)))
                    assert set(owners) == want, (L, win_nt, g)


@pytest.mark.parametrize("mesh_shape,win_nt",
                         [((4, 2), 48), ((2, 4), 90), ((8, 1), 300),
                          ((1, 8), 90)])
def test_windowed_step_matches_host(mesh_shape, win_nt):
    rng = np.random.default_rng(sum(mesh_shape) + win_nt)
    mesh = make_mesh(*mesh_shape)
    for L in [26, 60, 247, 901]:
        seq = _rand_contig(rng, L)
        v, c, p = _host_queries(seq)
        table = _table_from_values(rng, v)
        ref = lookup_stream(table, v, c, p)
        want = sorted(zip(ref.cnt_id.tolist(), ref.pos.tolist(),
                          ref.fi.tolist(), ref.otu.tolist(),
                          ref.avg_from_end.tolist(), ref.wt.tolist()))
        step, planes = make_windowed_dna_step(
            mesh, table, max(8, table.max_probe), win_nt)
        g, pos, otu, avg, fi, wt = windowed_contig_hits(
            mesh, step, planes, table,
            np.frombuffer(seq.encode("latin1"), dtype=np.uint8), win_nt)
        got = sorted(zip(g.tolist(), pos.tolist(), fi.tolist(), otu.tolist(),
                         avg.tolist(), wt.tolist()))
        assert got == want, (mesh_shape, win_nt, L)


def test_windowed_protein_matches_host():
    """aa-mode sequence parallelism: one long protein over overlapping
    7-aa windows == host prepare + parity scan, including the reference's
    skip-last-window quirk (i < len - K) at the true protein end."""
    from kmergutsjava_tpu.models.prepare import prepare_aa_numpy
    from kmergutsjava_tpu.parallel.annotate_step import \
        make_sharded_annotate_step
    from kmergutsjava_tpu.parallel.seq_windows import windowed_protein_hits

    rng = np.random.default_rng(11)
    mesh = make_mesh(4, 2)
    aa = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    for L in [8, 9, 20, 63, 64, 65, 300, 2001]:
        for win_aa in [16, 64]:
            seq_a = rng.choice(aa, size=L).astype(np.uint8)
            # sprinkle invalid residues (offset 20 paths)
            m = rng.random(L) < 0.05
            seq_a[m] = ord("X")
            seq = seq_a.tobytes().decode("latin1")
            store = _ListStore()
            prepare_aa_numpy([FastaRecord("p", seq, "")], store)
            v, c, p = store.cols()
            table = _table_from_values(rng, v)
            ref = lookup_stream(table, v, c, p)
            want = sorted(zip(ref.pos.tolist(), ref.fi.tolist(),
                              ref.otu.tolist(), ref.avg_from_end.tolist(),
                              ref.wt.tolist()))
            step, planes = make_sharded_annotate_step(
                mesh, table, max(8, table.max_probe))
            pos, otu, avg, fi, wt = windowed_protein_hits(
                mesh, step, planes, table, seq_a, win_aa)
            got = sorted(zip(pos.tolist(), fi.tolist(), otu.tolist(),
                             avg.tolist(), wt.tolist()))
            assert got == want, (L, win_aa)


def test_windowed_fuzz_random_geometry():
    """Random (L, win_nt) draws on one mesh: the re-fused hit set must
    match the host pipeline for arbitrary geometry, not just the grid."""
    rng = np.random.default_rng(23)
    mesh = make_mesh(2, 4)
    for _ in range(8):
        L = int(rng.integers(9, 1500))
        win_nt = int(rng.integers(9, 200)) * 3
        if win_nt <= OVERLAP_NT:
            win_nt = 27
        seq = _rand_contig(rng, L)
        v, c, p = _host_queries(seq)
        table = _table_from_values(rng, v, n_extra=100)
        ref = lookup_stream(table, v, c, p)
        step, planes = make_windowed_dna_step(
            mesh, table, max(8, table.max_probe), win_nt)
        g, pos, otu, avg, fi, wt = windowed_contig_hits(
            mesh, step, planes, table,
            np.frombuffer(seq.encode("latin1"), np.uint8), win_nt)
        want = sorted(zip(ref.cnt_id.tolist(), ref.pos.tolist(),
                          ref.fi.tolist(), ref.wt.tolist()))
        got = sorted(zip(g.tolist(), pos.tolist(), fi.tolist(), wt.tolist()))
        assert got == want, (L, win_nt)


def test_windowed_long_contig_many_windows():
    """A long contig fans out over many windows; hit positions stay exact."""
    rng = np.random.default_rng(42)
    mesh = make_mesh(4, 2)
    seq = _rand_contig(rng, 12_000)
    v, c, p = _host_queries(seq)
    table = _table_from_values(rng, v, n_extra=1000)
    ref = lookup_stream(table, v, c, p)
    step, planes = make_windowed_dna_step(mesh, table,
                                          max(8, table.max_probe), 300)
    g, pos, otu, avg, fi, wt = windowed_contig_hits(
        mesh, step, planes, table,
        np.frombuffer(seq.encode("latin1"), dtype=np.uint8), 300)
    assert len(g) == len(ref)
    want = sorted(zip(ref.cnt_id.tolist(), ref.pos.tolist(), ref.fi.tolist()))
    got = sorted(zip(g.tolist(), pos.tolist(), fi.tolist()))
    assert got == want
