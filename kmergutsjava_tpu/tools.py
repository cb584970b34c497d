"""User-facing table-building CLI.

The reference ships no way to create its data directory (kmer.table.mem_map
+ function.index live outside the repo, ref data/README.md); this tool
builds one from annotated proteins.

Usage:
  python -m kmergutsjava_tpu.tools build-table -o DATA_DIR \
      --fasta proteins.faa[.gz] [--functions-from-descr | --function NAME] \
      [--load-factor 0.6] [--weight 1.0] [--gz]

Function assignment:
  --functions-from-descr : each distinct description becomes a function
                           (the common case for annotated proteomes);
  --function NAME        : single function for every protein;
  default                : one function per protein id.
OTU index defaults to 0 for every protein (override with --otu-mod N to
spread proteins over N pseudo-OTUs for testing).
"""
from __future__ import annotations

import sys
from typing import List, Optional

from .formats.fasta import read_fasta
from .formats.table_tools import signatures_from_proteins, write_data_dir


def build_table_cli(argv: List[str]) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="build-table")
    ap.add_argument("-o", "--out", required=True, help="output data directory")
    ap.add_argument("--fasta", required=True, help="annotated protein FASTA")
    ap.add_argument("--functions-from-descr", action="store_true")
    ap.add_argument("--function", default=None)
    ap.add_argument("--load-factor", type=float, default=0.6)
    ap.add_argument("--weight", type=float, default=1.0)
    ap.add_argument("--otu-mod", type=int, default=1)
    ap.add_argument("--gz", action="store_true")
    args = ap.parse_args(argv)

    functions: List[str] = []
    fn_index = {}

    def fn_id(name: str) -> int:
        if name not in fn_index:
            fn_index[name] = len(functions)
            functions.append(name)
        return fn_index[name]

    triples = []
    for i, rec in enumerate(read_fasta(args.fasta)):
        if args.function is not None:
            f = fn_id(args.function)
        elif args.functions_from_descr:
            f = fn_id(rec.descr or rec.id)
        else:
            f = fn_id(rec.id)
        triples.append((rec.seq, f, i % max(args.otu_mod, 1)))

    sig = signatures_from_proteins(triples, weight=args.weight)
    table = write_data_dir(args.out, sig, functions,
                           load_factor=args.load_factor, gz=args.gz)
    print(f"wrote {args.out}: {len(sig['kmers'])} signatures, "
          f"{len(functions)} functions, numSigs={table.num_sigs}, "
          f"max_probe={table.max_probe}")
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "build-table":
        return build_table_cli(rest)
    print(f"unknown command: {cmd}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
