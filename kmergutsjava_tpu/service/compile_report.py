"""Module compile report (the entrypoint's ``report`` mode).

The reference's entrypoint (ref scripts/entrypoint.sh, "report" branch)
sets KB_SDK_COMPILE_REPORT_FILE and reruns codegen so the KBase catalog
can inspect what the module exposes. This framework has no codegen step;
the equivalent artifact is produced directly: a JSON document describing
the module, its RPC surface (service/SPEC.md is the source of truth) and
the build environment.

Usage: python -m kmergutsjava_tpu.service.compile_report [out.json]
(default honors KMER_COMPILE_REPORT_FILE, else ./work/compile_report.json).
"""
from __future__ import annotations

import json
import os
import sys
from typing import List, Optional

from .. import __version__

RPC_METHODS = [
    {"name": "status", "params": [], "returns": "state/message/version/"
     "git_url/git_commit_hash object (reference servlet payload keys)"},
    {"name": "warm", "params": [], "returns": "num_sigs/max_probe/"
     "probe_window object (table + device planes preloaded)"},
    {"name": "annotate", "params": ["AnnotateParams"], "returns": "report"},
    {"name": "_annotate_submit", "params": ["AnnotateParams"],
     "returns": "job_id (async-job protocol, baseclient-compatible)"},
    {"name": "_check_job", "params": ["job_id"],
     "returns": "{finished, result | error}"},
]


def build_report() -> dict:
    import platform

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    spec = os.path.join(repo, "kmergutsjava_tpu", "service", "SPEC.md")
    report = {
        "module_name": "KmerGutsJava",
        "implementation": "kmergutsjava-tpu",
        "version": __version__,
        "language": "python (JAX/XLA/Pallas) + C++ natives",
        "rpc_prefix": "KmerGutsJava.",
        "functions": RPC_METHODS,
        "spec_file": spec if os.path.exists(spec) else None,
        "python": platform.python_version(),
    }
    try:
        import jax

        report["jax"] = jax.__version__
    except Exception:  # pragma: no cover - jax is a hard dep in practice
        report["jax"] = None
    return report


def main(argv: Optional[List[str]] = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    out = (argv[0] if argv else
           os.environ.get("KMER_COMPILE_REPORT_FILE",
                          os.path.join("work", "compile_report.json")))
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(build_report(), f, indent=2)
        f.write("\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
