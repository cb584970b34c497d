#!/usr/bin/env python
"""Standard end-to-end measurements on the reference E. coli corpus.

Builds a fixture table from the proteome, then times (warm, after one
warm-up run): aa proteome annotation, a 100k x 150bp synthetic read stream,
and the whole-genome contig. MEASURE_PLATFORM=cpu forces the CPU backend.

Usage: python scripts/measure_e2e.py
"""
import io
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    plat = os.environ.get("MEASURE_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    from kmergutsjava_tpu.config import EngineConfig
    from kmergutsjava_tpu.formats.fasta import read_fasta
    from kmergutsjava_tpu.formats.table_tools import (signatures_from_proteins,
                                                      write_data_dir)
    from kmergutsjava_tpu.models.pipeline import Engine

    data = os.environ.get("MEASURE_CORPUS",
                          "/root/reference/test/data")
    faa = os.path.join(data, "Ecoli_K12_W3110.faa.gz")
    fna = os.path.join(data, "Ecoli_K12_W3110.fna.gz")
    prots = list(read_fasta(faa))
    triples = [(p.seq, i % 97, i % 20) for i, p in enumerate(prots)
               if i % 3 != 2]
    d = tempfile.mkdtemp()
    t0 = time.time()
    write_data_dir(d, signatures_from_proteins(triples),
                   [f"f{i}" for i in range(97)], load_factor=0.7)
    print(f"table build: {time.time()-t0:.2f}s")
    contig = next(iter(read_fasta(fna))).seq

    def timed(name, cfg, fasta, count=None):
        eng = Engine(cfg)
        eng.run(d, None, io.StringIO(), stdout=True,
                query_stream=io.StringIO(fasta))  # warm
        t0 = time.time()
        eng.run(d, None, io.StringIO(), stdout=True,
                query_stream=io.StringIO(fasta))
        dt = time.time() - t0
        rate = f" -> {count/dt:.0f} reads/s" if count else ""
        print(f"{name}: {dt:.2f}s{rate}")

    fasta = "".join(f">{p.id} {p.descr}\n{p.seq}\n" for p in prots)
    timed("proteome (13645 aa)", EngineConfig(aa=True), fasta, len(prots))
    rng = np.random.default_rng(0)
    starts = rng.integers(0, len(contig) - 150, 100_000)
    mfasta = "".join(f">r{i}\n{contig[s:s+150]}\n"
                     for i, s in enumerate(starts))
    timed("metagenome (100k x 150bp)", EngineConfig(aa=False, min_hits=3),
          mfasta, 100_000)
    timed("genome (4.6Mbp contig)", EngineConfig(aa=False),
          f">genome\n{contig}\n")


if __name__ == "__main__":
    main()
