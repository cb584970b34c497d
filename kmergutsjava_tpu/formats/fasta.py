"""Streaming FASTA reader with reference-identical semantics.

Replicates readFasta (/root/reference/lib/src/kmergutsjava/KmerGutsJava.java
:1132-1192) exactly, including its quirks:

- while seeking a caption, any line whose *trimmed* length is <= 1 is silently
  skipped (including a bare ">" line);
- a trimmed line of length > 1 that is not a valid caption raises
  "Wrong caption line: <line>";
- a caption must have a non-empty id after ">"; id is the first token split on
  space/tab, the description is the remaining tokens joined by single spaces;
- the first sequence line must exist and not start with ">" (after trimming)
  or we raise "No sequence for caption: <id>"; blank lines before it are
  skipped;
- subsequent sequence lines are appended RAW (untrimmed, so interior spaces
  survive into the sequence, as in the reference) until EOF or a line whose
  trimmed form starts with ">".

Java's String.trim() strips every char <= ' ' from both ends; we mirror that
rather than using Python's whitespace-only strip.
"""
from __future__ import annotations

import gzip
import io
from typing import Iterator, NamedTuple, TextIO, Union


class FastaRecord(NamedTuple):
    id: str
    seq: str
    descr: str


class FastaError(ValueError):
    pass


def _java_trim(s: str) -> str:
    start, end = 0, len(s)
    while start < end and s[start] <= " ":
        start += 1
    while end > start and s[end - 1] <= " ":
        end -= 1
    return s[start:end]


def open_text_maybe_gz(path: str) -> TextIO:
    """Open a text file, transparently decompressing *.gz (ref run() :764-769)."""
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="latin-1")
    return open(path, "r", encoding="latin-1")


def read_fasta(source: Union[str, TextIO]) -> Iterator[FastaRecord]:
    """Yield FastaRecord from a path (optionally .gz) or an open text stream."""
    if isinstance(source, str):
        with open_text_maybe_gz(source) as fh:
            yield from _read_fasta_stream(fh)
    else:
        yield from _read_fasta_stream(source)


def _read_fasta_stream(fh: TextIO) -> Iterator[FastaRecord]:
    def readline():
        line = fh.readline()
        if line == "":
            return None
        return line.rstrip("\r\n")

    str1 = readline()
    while True:
        # --- caption seek (ref :1141-1162) ---
        prot_name = None
        prot_descr = ""
        while str1 is not None:
            str2 = _java_trim(str1)
            if len(str2) > 1:
                if str2[0] == ">" and len(_java_trim(str2[1:])) > 0:
                    tokens = [t for t in str2[1:].replace("\t", " ").split(" ") if t]
                    prot_name = tokens[0]
                    prot_descr = " ".join(tokens[1:])
                    break
                raise FastaError("Wrong caption line: " + str2)
            str1 = readline()
        if prot_name is None:
            return
        # --- first sequence line (ref :1167-1174) ---
        while True:
            str1 = readline()
            if str1 is None or _java_trim(str1).startswith(">"):
                raise FastaError("No sequence for caption: " + prot_name)
            if len(_java_trim(str1)) > 0:
                break
        # --- sequence accumulation, raw lines (ref :1175-1180) ---
        parts = []
        while True:
            parts.append(str1)
            str1 = readline()
            if str1 is None or _java_trim(str1).startswith(">"):
                break
        seq = "".join(parts)
        if len(seq) == 0:
            raise FastaError("No sequence for caption: " + prot_name)
        yield FastaRecord(prot_name, seq, prot_descr)
