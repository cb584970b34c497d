"""Utilities to create signature tables from sequence data.

The reference repo ships no table builder (its data directory is external,
ref /root/reference/data/README.md), but every test and deployment needs one.
These helpers derive a signature set from annotated proteins and write a
data directory (kmer.table.mem_map + function.index) the engine — and the
reference Java engine — can consume.
"""
from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from ..constants import AA_OFF_LUT, K, POW20
from .function_index import write_function_index
from .kmer_table import FUNCTION_INDEX_FILE, TABLE_FILE, KmerTable, build_table, write_table


def protein_kmers(seq: str) -> List[Tuple[int, int]]:
    """All valid (value, start) 8-mer windows of a protein (full windows,
    i <= len-K; table building has no reason to reproduce the query-side
    skip-last-window quirk)."""
    offs = AA_OFF_LUT[np.frombuffer(seq.encode("latin-1"), dtype=np.uint8)]
    n = len(offs)
    out = []
    for i in range(n - K + 1):
        win = offs[i: i + K]
        if (win < 20).all():
            out.append((int(np.dot(win.astype(np.int64), POW20)), i))
    return out


def signatures_from_proteins(
    proteins: Iterable[Tuple[str, int, int]],
    weight: float = 1.0,
    weights: Optional[Dict[int, float]] = None,
) -> Dict[str, np.ndarray]:
    """Derive a signature set from (sequence, function_index, otu_index)
    triples. First occurrence of a k-mer wins; avg_from_end is the k-mer's
    offset from the protein end (len - start - K)."""
    seen: Dict[int, int] = {}
    vals: List[int] = []
    otu: List[int] = []
    avg: List[int] = []
    fi: List[int] = []
    wt: List[float] = []
    for seq, f, o in proteins:
        for value, start in protein_kmers(seq):
            if value in seen:
                continue
            seen[value] = len(vals)
            vals.append(value)
            otu.append(o)
            avg.append(len(seq) - start - K)
            fi.append(f)
            wt.append(weights.get(f, weight) if weights else weight)
    return dict(
        kmers=np.asarray(vals, dtype=np.int64),
        otu=np.asarray(otu, dtype=np.int32),
        avg_from_end=np.asarray(avg, dtype=np.int32),
        fi=np.asarray(fi, dtype=np.int32),
        wt=np.asarray(wt, dtype=np.float32),
    )


def write_data_dir(data_dir: str, signatures: Dict[str, np.ndarray],
                   functions: Sequence[str], load_factor: float = 0.6,
                   gz: bool = False) -> KmerTable:
    """Write a complete engine data directory; returns the built table."""
    os.makedirs(data_dir, exist_ok=True)
    table = build_table(**signatures, load_factor=load_factor)
    suffix = ".gz" if gz else ""
    write_table(os.path.join(data_dir, TABLE_FILE + suffix), table)
    write_function_index(os.path.join(data_dir, FUNCTION_INDEX_FILE + suffix),
                         functions)
    return table
