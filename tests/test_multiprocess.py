"""REAL two-process jax.distributed validation (CPU backend, gloo
collectives standing in for DCN): the psum-sharded lookup with the table
sharded ACROSS process boundaries, the all_to_all routed lookup, and the
per-host engine contract, each verified for exact hits on both ranks.

Complements test_multihost.py (single-process contract simulation) and
dryrun_multichip (single-process virtual mesh): here the collectives
actually cross OS processes through the distributed runtime.
"""
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, "2", str(pid), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()  # exact Popen handles only, never by pattern
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-4000:]}"
        for mark in ("MP-OK sharded-psum", "MP-OK routed",
                     "MP-OK stream-shards", "MP-OK engine-shard",
                     "MP-WORKER-DONE"):
            assert mark in out, f"rank {pid} missing {mark}:\n{out[-4000:]}"
    # merge the two ranks' report shards back into record order and
    # byte-compare against a single-process run of the same corpus — the
    # reference's whole deliverable is the report text, so the multi-host
    # story must end in those exact bytes (ref KmerGutsJava.java:398-404,
    # :516-522)
    import io

    from kmergutsjava_tpu.config import EngineConfig
    from kmergutsjava_tpu.models.pipeline import Engine
    from kmergutsjava_tpu.parallel.multihost import merge_report_shards

    shards = [(tmp_path / f"mp_report_{pid}.txt").read_text()
              for pid in range(2)]
    merged = merge_report_shards(shards)
    single = io.StringIO()
    Engine(EngineConfig(aa=True, min_hits=2)).run(
        str(tmp_path / "mp_data_0"), str(tmp_path / "mp_corpus.fa"),
        single, stdout=True)
    assert merged == single.getvalue(), "merged multi-host report != single-run bytes"
