"""Parity-corpus integration: the reference repo's E. coli K-12 W3110 data
(vendored into tests/data; ref KmerGutsJavaServerTest.java:80 mounts the
table externally — we build our own from the proteome, recipe shared with
the golden generator via corpus_util).

Backends must agree byte-for-byte on the full report. Sized-down by default
(first N proteins / genome slice); set KMER_ECOLI_FULL=1 for the full corpus.
"""
import io
import os

import pytest
from corpus_util import build_corpus_data_dir, load_corpus

from kmergutsjava_tpu.config import EngineConfig
from kmergutsjava_tpu.models.pipeline import Engine

FULL = os.environ.get("KMER_ECOLI_FULL") == "1"
N_PROT = None if FULL else 800
GENOME_SLICE = None if FULL else 300_000


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    prots, contig = load_corpus(N_PROT, GENOME_SLICE)
    d = tmp_path_factory.mktemp("ecoli_data")
    build_corpus_data_dir(str(d), prots)
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
