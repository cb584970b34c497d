"""Checked-in golden parity reports (VERDICT round 1, missing item 2).

The goldens (tests/data/golden_*.txt.gz) pin the full corpus reports
byte-for-byte across rounds: any change to prepare/lookup/grouping/
formatting that alters a single byte of the E. coli report fails here.
Provenance: scripts/make_goldens.py — parity backend output accepted only
when xla and spmd reproduce it byte-identically (no JVM exists on this
image; see docs/parity.md "Oracle chain" for what that does and doesn't
prove).

The default run checks the sized-down goldens; KMER_ECOLI_FULL=1 checks
the full-corpus ones (scheduled CI job).
"""
import gzip
import io
import os

import pytest

from kmergutsjava_tpu.config import EngineConfig
from kmergutsjava_tpu.models.pipeline import Engine

from corpus_util import build_corpus_data_dir, corpus_path, load_corpus

FULL = os.environ.get("KMER_ECOLI_FULL") == "1"
TAG = "full" if FULL else "800"
N_PROT = None if FULL else 800
GENOME_SLICE = None if FULL else 300_000


def golden(mode: str) -> str:
    with gzip.open(corpus_path(f"golden_{mode}_{TAG}.txt.gz"), "rt") as fh:
        return fh.read()


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    prots, contig = load_corpus(N_PROT, GENOME_SLICE)
    d = tmp_path_factory.mktemp("golden_data")
    build_corpus_data_dir(str(d), prots)
    return d, prots, contig


def _run(data_dir, fasta_text, backend, aa):
    out = io.StringIO()
    Engine(EngineConfig(backend=backend, aa=aa)).run(
        str(data_dir), None, out, stdout=True,
        query_stream=io.StringIO(fasta_text))
    return out.getvalue()


def test_aa_report_matches_golden(corpus):
    d, prots, _ = corpus
    fasta = "".join(f">{p.id} {p.descr}\n{p.seq}\n" for p in prots)
    assert _run(d, fasta, "auto", aa=True) == golden("aa")


def test_dna_report_matches_golden(corpus):
    d, _, contig = corpus
    fasta = f">{contig.id} {contig.descr}\n{contig.seq}\n"
    assert _run(d, fasta, "auto", aa=False) == golden("dna")


def test_forced_chunked_engine_matches_golden(corpus, monkeypatch):
    """The chunked probe impl (the wide-lane HBM escape hatch; forced
    small here) reproduces the golden corpus report byte-for-byte through
    the full engine."""
    monkeypatch.setenv("KMER_PROBE_IMPL", "chunked")
    monkeypatch.setenv("KMER_CHUNK_ROWS", "64")
    d, prots, _ = corpus
    fasta = "".join(f">{p.id} {p.descr}\n{p.seq}\n" for p in prots)
    assert _run(d, fasta, "xla", aa=True) == golden("aa")
