"""Prepare phase: FASTA records -> query k-mer stream (device-batched).

TPU-native counterpart of the reference's prepareQuery/addKmers
(/root/reference/lib/src/kmergutsjava/KmerGutsJava.java:1051-1074, :900-922).
Sequences are padded into power-of-two length buckets so each distinct shape
compiles once; encode/translate/kmerize run as jitted ops over whole batches
and valid windows are compacted host-side into (value, container, pos)
records feeding the lookup store.

Container creation order matches the reference exactly (it defines hit
container ids): per DNA contig +0, +1, +2, -0, -1, -2 (ref :1064-1072); one
'+/0' container per protein (ref :1059).
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..constants import K
from ..formats.fasta import FastaRecord
from ..lookup.store import QueryKmerStore
from ..ops.encode import aa_offsets
from ..ops.kmerize import kmer_windows
from ..ops.translate import translate_6frames

ContainerKey = Tuple[str, str, int]  # (query_id, strand, frame)


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


class Prepared:
    def __init__(self) -> None:
        self.containers: List[ContainerKey] = []
        self.id_len: Dict[str, int] = {}  # insertion-ordered, re-put keeps slot

    def new_container(self, key: ContainerKey) -> int:
        self.containers.append(key)
        return len(self.containers) - 1


def _seq_to_ascii(seq: str) -> np.ndarray:
    return np.frombuffer(seq.encode("latin-1"), dtype=np.uint8)


def prepare_aa(records: Iterable[FastaRecord], store: QueryKmerStore,
               batch_rows: int = 512, min_bucket: int = 256) -> Prepared:
    """Protein mode: encode + kmerize in length-bucketed padded batches."""
    prep = Prepared()
    pending: Dict[int, List[Tuple[int, np.ndarray]]] = {}  # bucket -> [(cnt_id, ascii)]

    def flush(bucket: int) -> None:
        rows = pending.pop(bucket, [])
        if not rows:
            return
        b = len(rows)
        mat = np.zeros((b, bucket), dtype=np.uint8)
        lens = np.empty(b, dtype=np.int64)
        cnt_ids = np.empty(b, dtype=np.int64)
        for r, (cid, ascii_u8) in enumerate(rows):
            mat[r, : len(ascii_u8)] = ascii_u8
            lens[r] = len(ascii_u8)
            cnt_ids[r] = cid
        offs = aa_offsets(jnp.asarray(mat))
        # reference window bound is strictly i < len - K (ref :912): the final
        # full window of a protein is skipped.
        values, valid = kmer_windows(offs, jnp.asarray(lens - K))
        values = np.asarray(values)
        valid = np.asarray(valid)
        rr, cc = np.nonzero(valid)
        store.add_batch(values[rr, cc], cnt_ids[rr], cc)

    for rec in records:
        ascii_u8 = _seq_to_ascii(rec.seq)
        cid = prep.new_container((rec.id, "+", 0))
        prep.id_len[rec.id] = len(rec.seq)
        bucket = _next_pow2(max(len(ascii_u8), min_bucket))
        pending.setdefault(bucket, []).append((cid, ascii_u8))
        if len(pending[bucket]) >= batch_rows:
            flush(bucket)
    for bucket in list(pending):
        flush(bucket)
    return prep


def prepare_dna(records: Iterable[FastaRecord], store: QueryKmerStore) -> Prepared:
    """DNA mode: 6-frame translate + kmerize, one device call per contig."""
    prep = Prepared()
    for rec in records:
        ascii_u8 = _seq_to_ascii(rec.seq)
        length = len(ascii_u8)
        cids = [prep.new_container((rec.id, s, f))
                for s in ("+", "-") for f in range(3)]
        prep.id_len[rec.id] = length
        mpad = _next_pow2(max(length // 3 + 1, 16))
        lpad = 3 * mpad
        padded = np.zeros(lpad, dtype=np.uint8)
        padded[:length] = ascii_u8
        frames = translate_6frames(jnp.asarray(padded), jnp.int64(length))
        # translated buffer spans len//3 usable positions; windows i < L - K
        # over the reference's len/3+1 buffer => len//3 - K + 1 starts
        num_starts = max(length // 3 - K + 1, 0)
        values, valid = kmer_windows(frames, jnp.full((6,), num_starts, dtype=jnp.int64))
        values = np.asarray(values)
        valid = np.asarray(valid)
        rr, cc = np.nonzero(valid)
        store.add_batch(values[rr, cc], np.asarray(cids, dtype=np.int64)[rr], cc)
    return prep
