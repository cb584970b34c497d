"""Fuzz the FASTA parser against an independent transcription of the
reference's readFasta loop."""
import io
import random

import pytest

from java_oracle import oracle_read_fasta
from kmergutsjava_tpu.formats.fasta import FastaError, read_fasta

PIECES = [">", ">id1", ">id2 desc here", "> ", ">x\ty z", "", " ", "A",
          "ACGT", "ACG T", "  ACGT  ", "a", ">>", "garbage line", "\t",
          "MKV LLE", ">id3  multi   space"]


def _parsers():
    """Both implementations: the default dispatch (bulk native when the
    toolchain exists) and the line-by-line python parser explicitly."""
    from kmergutsjava_tpu.formats.fasta import _read_fasta_stream

    return [("auto", lambda t: read_fasta(io.StringIO(t))),
            ("python", lambda t: _read_fasta_stream(io.StringIO(t)))]


def test_fasta_fuzz_vs_oracle():
    rng = random.Random(17)
    parsers = _parsers()
    for trial in range(800):
        lines = [rng.choice(PIECES) for _ in range(rng.randint(0, 12))]
        text = "\n".join(lines) + ("\n" if rng.random() < 0.8 else "")
        try:
            want = oracle_read_fasta(lines)
            err = None
        except ValueError as ex:
            want, err = None, str(ex)
        for name, parse in parsers:
            try:
                got = [(r.id, r.seq, r.descr) for r in parse(text)]
                got_err = None
            except FastaError as ex:
                got, got_err = None, str(ex)
            assert (got, got_err) == (want, err), (trial, name, lines)


def test_fasta_bulk_matches_python_carriage_returns():
    """\\r\\n and stray \\r handling must match readline().rstrip('\\r\\n')."""
    from kmergutsjava_tpu.formats.fasta import _read_fasta_stream

    for text in (">a d\r\nACGT\r\nTTTT\r\n", ">a\nAC\r\r\nGG",
                 ">a\nACGT", ">a\nACGT\n\n>b\nCC\n", ">a\nA CGT \n"):
        a = [(r.id, r.seq, r.descr) for r in read_fasta(io.StringIO(text))]
        b = [(r.id, r.seq, r.descr)
             for r in _read_fasta_stream(io.StringIO(text))]
        assert a == b, text
