#!/usr/bin/env python
"""Run the ACTUAL Java reference as a byte-parity oracle (round-5
verdict item 1 — the one leg no prior round could close on this image:
no JVM, zero egress; docs/parity.md "Oracle chain").

Steps:
  1. locate the reference checkout (REF_DIR) or clone REF_URL
     (default: the public rsutormin/KmerGutsJava GitHub repo);
  2. ``javac`` the engine — CLI mode is dependency-free
     (ref lib/src/kmergutsjava/KmerGutsJava.java:560-654; the KBase jars
     are only needed by the servlet scaffolding);
  3. build the deterministic corpus fixture with THIS repo's table
     builder (tests/corpus_util.py recipe — the exact recipe the
     committed golden fixtures describe) plus the aa/dna query FASTAs;
  4. run the Java CLI and this engine's CLI on identical inputs
     (default flags: -m 5 -g 200, the shared defaults) and byte-diff
     the reports;
  5. byte-diff the committed goldens (tests/data/golden_*_800.txt.gz)
     against the JVM output — after this passes in CI the goldens are
     JVM-verified, not just transcription-verified.

Env: REF_DIR (skip the clone), REF_URL, JVM_ORACLE_FULL=1 (full corpus:
adds the full-proteome/genome runs and checks golden_*_full),
JVM_ORACLE_BACKENDS (comma list, default "parity,auto").
Requires javac/java on PATH — ubuntu-latest CI carries a JDK; the dev
image does not (there this script stops at the javac check and prints
the exact commands it would run, which documents the local simulation).
"""
import gzip
import io
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

REF_URL = os.environ.get("REF_URL",
                         "https://github.com/rsutormin/KmerGutsJava.git")
ENGINE_REL = "lib/src/kmergutsjava/KmerGutsJava.java"


def sh(*cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    return subprocess.run(cmd, check=True, **kw)


def locate_reference(scratch: str) -> str:
    ref = os.environ.get("REF_DIR")
    if ref:
        if not os.path.exists(os.path.join(ref, ENGINE_REL)):
            sys.exit(f"REF_DIR={ref} lacks {ENGINE_REL}")
        return ref
    dest = os.path.join(scratch, "reference")
    sh("git", "clone", "--depth", "1", REF_URL, dest)
    return dest


def build_inputs(scratch: str, full: bool):
    """Fixture data dir + query FASTAs, via the shared corpus recipe."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from corpus_util import build_corpus_data_dir, load_corpus

    n_prot, genome_slice = (None, None) if full else (800, 300_000)
    prots, contig = load_corpus(n_prot, genome_slice)
    data = os.path.join(scratch, "data")
    build_corpus_data_dir(data, prots)
    faa = os.path.join(scratch, "q.faa")
    with open(faa, "w") as fh:
        fh.write("".join(f">{p.id} {p.descr}\n{p.seq}\n" for p in prots))
    fna = os.path.join(scratch, "q.fna")
    with open(fna, "w") as fh:
        fh.write(f">{contig.id} {contig.descr}\n{contig.seq}\n")
    return data, faa, fna


def run_ours(data: str, query: str, aa: bool, backend: str, out: str):
    from kmergutsjava_tpu.config import EngineConfig
    from kmergutsjava_tpu.models.pipeline import Engine

    buf = io.StringIO()
    with open(query) as q:
        Engine(EngineConfig(aa=aa, backend=backend)).run(
            data, None, buf, stdout=False, query_stream=q)
    with open(out, "w") as fh:
        fh.write(buf.getvalue())


def byte_diff(a: str, b: str, what: str):
    with open(a, "rb") as fa, open(b, "rb") as fb:
        da, db = fa.read(), fb.read()
    if da != db:
        la, lb = da.split(b"\n"), db.split(b"\n")
        for i, (x, y) in enumerate(zip(la, lb)):
            if x != y:
                sys.exit(f"FAIL {what}: first divergence at line {i + 1}:\n"
                         f"  jvm : {x[:200]!r}\n  ours: {y[:200]!r}")
        sys.exit(f"FAIL {what}: length mismatch {len(da)} vs {len(db)}")
    print(f"OK   {what}: byte-identical ({len(da)} bytes)", flush=True)


def main():
    full = os.environ.get("JVM_ORACLE_FULL") == "1"
    backends = os.environ.get("JVM_ORACLE_BACKENDS", "parity,auto").split(",")
    tag = "full" if full else "800"
    simulate = os.environ.get("JVM_ORACLE_SIMULATE") == "1"
    if simulate:
        # local simulation (documented in docs/parity.md): the dev image
        # has no JVM, so substitute the parity backend for the Java run —
        # this exercises every other step (fixture build, both CLIs, the
        # byte-diff and golden-diff machinery) and proves the harness;
        # only the `javac`/`java` invocations themselves wait for CI.
        scratch = tempfile.mkdtemp(prefix="jvm_oracle_sim_")
        data, faa, fna = build_inputs(scratch, full)
        for mode, query, aa in (("aa", faa, True), ("dna", fna, False)):
            jvm_out = os.path.join(scratch, f"jvm_{mode}.txt")
            run_ours(data, query, aa, "parity", jvm_out)  # stand-in
            for backend in backends:
                ours = os.path.join(scratch, f"ours_{mode}_{backend}.txt")
                run_ours(data, query, aa, backend, ours)
                byte_diff(jvm_out, ours, f"[sim] {mode} oracle-vs-{backend}")
            golden = os.path.join(REPO, "tests", "data",
                                  f"golden_{mode}_{tag}.txt.gz")
            if os.path.exists(golden):
                gtxt = os.path.join(scratch, f"golden_{mode}.txt")
                with gzip.open(golden, "rb") as gz, open(gtxt, "wb") as fh:
                    fh.write(gz.read())
                byte_diff(jvm_out, gtxt,
                          f"[sim] {mode} oracle-vs-committed-golden")
        print("SIMULATION passed (parity stood in for the JVM; CI runs "
              "the real javac/java)", flush=True)
        return
    if shutil.which("javac") is None or shutil.which("java") is None:
        print("No JDK on this machine. In CI (ubuntu-latest) this script "
              "runs for real; the commands it would run here:\n"
              f"  git clone --depth 1 {REF_URL} <scratch>/reference\n"
              f"  javac -d <cls> <ref>/{ENGINE_REL}\n"
              "  java -cp <cls> kmergutsjava.KmerGutsJava -a -D <data> "
              "-q q.faa -o jvm_aa.txt   (and the DNA run without -a)\n"
              "  byte-diff vs our CLI and tests/data/golden_*_"
              f"{tag}.txt.gz", flush=True)
        sys.exit(3)
    scratch = tempfile.mkdtemp(prefix="jvm_oracle_")
    ref = locate_reference(scratch)
    cls = os.path.join(scratch, "classes")
    os.makedirs(cls, exist_ok=True)
    sh("javac", "-d", cls, os.path.join(ref, ENGINE_REL))
    data, faa, fna = build_inputs(scratch, full)
    for mode, query, aa in (("aa", faa, True), ("dna", fna, False)):
        jvm_out = os.path.join(scratch, f"jvm_{mode}.txt")
        t0 = time.time()
        # pin the JVM locale: the reference's String.format("%f") is
        # locale-dependent (a comma-decimal default locale would break
        # the byte-diff for reasons unrelated to engine parity); the
        # engine's utils/javafmt.py implements the en-US '.' rules
        env = dict(os.environ)
        env["JAVA_TOOL_OPTIONS"] = (
            env.get("JAVA_TOOL_OPTIONS", "")
            + " -Duser.language=en -Duser.country=US").strip()
        sh("java", "-cp", cls, "kmergutsjava.KmerGutsJava",
           *(["-a"] if aa else []), "-D", data, "-q", query, "-o", jvm_out,
           env=env)
        print(f"jvm {mode} run: {time.time() - t0:.1f}s", flush=True)
        for backend in backends:
            ours = os.path.join(scratch, f"ours_{mode}_{backend}.txt")
            run_ours(data, query, aa, backend, ours)
            byte_diff(jvm_out, ours, f"{mode} jvm-vs-{backend}")
        golden = os.path.join(REPO, "tests", "data",
                              f"golden_{mode}_{tag}.txt.gz")
        if os.path.exists(golden):
            gtxt = os.path.join(scratch, f"golden_{mode}.txt")
            with gzip.open(golden, "rb") as gz, open(gtxt, "wb") as fh:
                fh.write(gz.read())
            byte_diff(jvm_out, gtxt, f"{mode} jvm-vs-committed-golden")
    print("JVM ORACLE: all byte-diffs passed — goldens are JVM-verified",
          flush=True)


if __name__ == "__main__":
    main()
