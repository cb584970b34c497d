"""backend='spmd' (fused on-device prepare+lookup) vs host backends.

Reports must be byte-identical: the device program covers encode,
(translation,) kmerization, and the probe; everything downstream is the
shared grouping machine.
"""
import io
import random

import numpy as np
import pytest

from kmergutsjava_tpu.config import EngineConfig
from kmergutsjava_tpu.formats.table_tools import (signatures_from_proteins,
                                                  write_data_dir)
from kmergutsjava_tpu.models.pipeline import Engine

from test_end_to_end import AA, _random_corpus, _strip_info, run_engine

CODON = {"A": "GCT", "C": "TGT", "D": "GAT", "E": "GAA", "F": "TTT",
         "G": "GGT", "H": "CAT", "I": "ATT", "K": "AAA", "L": "CTT",
         "M": "ATG", "N": "AAT", "P": "CCT", "Q": "CAA", "R": "CGT",
         "S": "TCT", "T": "ACT", "V": "GTT", "W": "TGG", "Y": "TAT"}


def _dna_corpus(rng, prots, n_reads=40):
    reads = []
    for i in range(n_reads):
        p = prots[rng.randrange(len(prots))]
        a = rng.randrange(max(1, len(p) - 11))
        nt = "".join(CODON[c] for c in p[a: a + 12])
        pre = "".join(rng.choice("ACGT") for _ in range(rng.randrange(9)))
        post = "".join(rng.choice("ACGT") for _ in range(rng.randrange(9)))
        nt = pre + nt + post
        if i % 3 == 0:  # reverse-complement some reads
            comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
            nt = "".join(comp[c] for c in reversed(nt))
        reads.append(nt)
    return reads


@pytest.mark.parametrize("mesh", [None, (2, 4), (8, 1)])
def test_spmd_aa_byte_identical(tmp_path, mesh):
    rng = random.Random(7 + (0 if mesh is None else sum(mesh)))
    prots, triples, funcs = _random_corpus(rng)
    write_data_dir(tmp_path / "d", signatures_from_proteins(triples), funcs)
    fasta = "".join(f">p{i} d{i}\n{p}\n" for i, p in enumerate(prots))
    kw = dict(aa=True, min_hits=2)
    ref = run_engine(tmp_path / "d", fasta, backend="xla", **kw)
    got = run_engine(tmp_path / "d", fasta, backend="spmd",
                     mesh_shape=mesh, **kw)
    assert got == ref
    assert "CALL\t" in ref


@pytest.mark.parametrize("mesh", [None, (4, 2)])
def test_spmd_dna_byte_identical(tmp_path, mesh):
    rng = random.Random(11 + (0 if mesh is None else sum(mesh)))
    prots, triples, funcs = _random_corpus(rng, n_prot=12)
    write_data_dir(tmp_path / "d", signatures_from_proteins(triples), funcs)
    reads = _dna_corpus(rng, prots)
    fasta = "".join(f">r{i}\n{s}\n" for i, s in enumerate(reads))
    kw = dict(min_hits=2, max_gap=200)
    ref = run_engine(tmp_path / "d", fasta, backend="xla", **kw)
    got = run_engine(tmp_path / "d", fasta, backend="spmd",
                     mesh_shape=mesh, **kw)
    assert got == ref
    assert "CALL\t" in ref


def test_spmd_debug_byte_identical(tmp_path):
    """Debug mode: HIT lines and the 'Kmers found' accounting match (the
    spmd path recomputes matched values host-side at hit coordinates)."""
    rng = random.Random(13)
    prots, triples, funcs = _random_corpus(rng, n_prot=15)
    write_data_dir(tmp_path / "d", signatures_from_proteins(triples), funcs)
    for aa in (True, False):
        if aa:
            fasta = "".join(f">p{i}\n{p}\n" for i, p in enumerate(prots))
        else:
            fasta = "".join(f">r{i}\n{s}\n" for i, s in
                            enumerate(_dna_corpus(rng, prots, 15)))
        kw = dict(aa=aa, min_hits=2, debug=True)
        ref = _strip_info(run_engine(tmp_path / "d", fasta, backend="xla",
                                     **kw))
        got = _strip_info(run_engine(tmp_path / "d", fasta, backend="spmd",
                                     **kw))
        assert got == ref, aa
        assert "Kmers found:" in ref and "HIT\t" in ref


def test_spmd_long_sequences_route_through_windows(tmp_path, monkeypatch):
    """Records beyond LONG_AA/LONG_NT take the sequence-parallel windowed
    path; reports stay byte-identical (thresholds shrunk to force it)."""
    import kmergutsjava_tpu.models.spmd as spmd_mod

    monkeypatch.setattr(spmd_mod, "LONG_AA", 100)
    monkeypatch.setattr(spmd_mod, "WIN_AA", 64)
    monkeypatch.setattr(spmd_mod, "LONG_NT", 300)
    monkeypatch.setattr(spmd_mod, "WIN_NT", 150)
    rng = random.Random(17)
    prots, triples, funcs = _random_corpus(rng, n_prot=10)
    write_data_dir(tmp_path / "d", signatures_from_proteins(triples), funcs)
    # one long protein built from real signatures + short ones
    long_prot = "".join(prots)[:400]
    fasta = (f">long\n{long_prot}\n"
             + "".join(f">p{i}\n{p}\n" for i, p in enumerate(prots[:4])))
    kw = dict(aa=True, min_hits=2, debug=True)
    ref = _strip_info(run_engine(tmp_path / "d", fasta, backend="xla", **kw))
    got = _strip_info(run_engine(tmp_path / "d", fasta, backend="spmd",
                                 mesh_shape=(4, 2), **kw))
    assert got == ref
    # long DNA contig
    long_nt = "".join(CODON[c] for c in "".join(prots))[:900]
    fasta = f">ctg\n{long_nt}\n>c2\n{long_nt[:120]}\n"
    kw = dict(min_hits=2, debug=True)
    ref = _strip_info(run_engine(tmp_path / "d", fasta, backend="xla", **kw))
    got = _strip_info(run_engine(tmp_path / "d", fasta, backend="spmd",
                                 mesh_shape=(2, 4), **kw))
    assert got == ref
    assert "CALL\t" in ref


def test_spmd_cli_reachable(tmp_path, capsys):
    from kmergutsjava_tpu.cli import main as cli_main

    write_data_dir(tmp_path / "d", signatures_from_proteins(
        [(AA, 0, 3)], weight=0.5), ["funcA"])
    q = tmp_path / "q.faa"
    q.write_text(">P1\n" + AA + "\n")
    rc = cli_main(["-a", "--backend", "spmd", "-D", str(tmp_path / "d"),
                   "-q", str(q)])
    assert rc == 0
    assert "CALL\t0\t18\t12\t0\tfuncA\t6.000000" in capsys.readouterr().out
