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


def test_fasta_fuzz_vs_oracle():
    rng = random.Random(17)
    for trial in range(800):
        lines = [rng.choice(PIECES) for _ in range(rng.randint(0, 12))]
        text = "\n".join(lines) + ("\n" if rng.random() < 0.8 else "")
        try:
            want = oracle_read_fasta(lines)
            err = None
        except ValueError as ex:
            want, err = None, str(ex)
        try:
            got = [(r.id, r.seq, r.descr)
                   for r in read_fasta(io.StringIO(text))]
            got_err = None
        except FastaError as ex:
            got, got_err = None, str(ex)
        assert (got, got_err) == (want, err), (trial, lines)
