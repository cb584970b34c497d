"""Parity-corpus integration: the reference repo's E. coli K-12 W3110 data
(/root/reference/test/data/, ref KmerGutsJavaServerTest.java:80 mounts the
table externally — we build our own from the proteome).

Backends must agree byte-for-byte on the full report. Sized-down by default
(first N proteins / genome slice); set KMER_ECOLI_FULL=1 for the full corpus.
"""
import gzip
import io
import os

import numpy as np
import pytest

from kmergutsjava_tpu.config import EngineConfig
from kmergutsjava_tpu.formats.fasta import read_fasta
from kmergutsjava_tpu.formats.table_tools import (signatures_from_proteins,
                                                  write_data_dir)
from kmergutsjava_tpu.models.pipeline import Engine

DATA = "/root/reference/test/data"
FULL = os.environ.get("KMER_ECOLI_FULL") == "1"
N_PROT = None if FULL else 800
GENOME_SLICE = None if FULL else 300_000


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    faa = os.path.join(DATA, "Ecoli_K12_W3110.faa.gz")
    fna = os.path.join(DATA, "Ecoli_K12_W3110.fna.gz")
    if not os.path.exists(faa):
        pytest.skip("reference corpus not available")
    prots = list(read_fasta(faa))[:N_PROT]
    contig = next(iter(read_fasta(fna)))
    if GENOME_SLICE:
        contig = contig._replace(seq=contig.seq[:GENOME_SLICE])
    # signature set: every 3rd protein contributes, one function per protein
    # family bucket, otu = protein index mod 20
    triples = [(p.seq, i % 97, i % 20) for i, p in enumerate(prots)
               if i % 3 != 2]
    funcs = [f"ecoli function {i}" for i in range(97)]
    d = tmp_path_factory.mktemp("ecoli_data")
    write_data_dir(str(d), signatures_from_proteins(triples), funcs,
                   load_factor=0.7)
    return d, prots, contig


def _run(data_dir, fasta_text, backend, aa):
    out = io.StringIO()
    Engine(EngineConfig(backend=backend, aa=aa)).run(
        str(data_dir), None, out, stdout=True,
        query_stream=io.StringIO(fasta_text))
    return out.getvalue()


def test_aa_mode_backends_agree(corpus):
    d, prots, _ = corpus
    fasta = "".join(f">{p.id} {p.descr}\n{p.seq}\n" for p in prots)
    r_xla = _run(d, fasta, "xla", aa=True)
    r_parity = _run(d, fasta, "parity", aa=True)
    assert r_xla == r_parity
    assert r_xla.count("PROTEIN-ID") == len(prots)
    # every signature-contributing protein should call its own function
    assert r_xla.count("\nCALL\t") > len(prots) // 2


def test_dna_mode_backends_agree(corpus):
    d, _, contig = corpus
    fasta = f">{contig.id} {contig.descr}\n{contig.seq}\n"
    r_xla = _run(d, fasta, "xla", aa=False)
    r_parity = _run(d, fasta, "parity", aa=False)
    assert r_xla == r_parity
    assert r_xla.count("TRANSLATION") == 6
    assert "CALL\t" in r_xla
    # fused device pipeline on the genome: the contig exceeds LONG_NT, so
    # this also runs the sequence-parallel windowed path at corpus scale
    assert _run(d, fasta, "spmd", aa=False) == r_parity


def test_distribution_modes_agree_on_corpus(corpus):
    """replicated / sharded / routed backends: byte-identical corpus reports."""
    d, prots, _ = corpus
    fasta = "".join(f">{p.id}\n{p.seq}\n" for p in prots[:300])
    outs = {}
    for backend in ("xla", "replicated", "sharded", "routed", "spmd"):
        outs[backend] = _run(d, fasta, backend, aa=True)
    assert (outs["xla"] == outs["replicated"] == outs["sharded"]
            == outs["routed"] == outs["spmd"])
    assert "CALL\t" in outs["xla"]
