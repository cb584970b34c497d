"""Worker for tests/test_multiprocess.py: one rank of a real two-process
jax.distributed run (CPU backend, gloo collectives — the DCN analog).

Runs three checks in sequence on a mesh spanning BOTH processes and
prints one MP-OK line per check; any failure raises (nonzero exit).

Usage: python _mp_worker.py <coordinator> <num_procs> <pid>
"""
import os
import sys

os.environ.pop("JAX_PLATFORMS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

from kmergutsjava_tpu.parallel.multihost import initialize_distributed

initialize_distributed(coordinator, nprocs, pid)
assert jax.process_count() == nprocs

import io  # noqa: E402
import numpy as np  # noqa: E402

from kmergutsjava_tpu.formats.kmer_table import build_table  # noqa: E402
from kmergutsjava_tpu.lookup.parity import lookup_stream  # noqa: E402

rng = np.random.default_rng(5)
kmers = np.unique(rng.integers(0, 20**8, 5000, dtype=np.int64))
table = build_table(
    kmers,
    rng.integers(0, 50, len(kmers)).astype(np.int32),
    rng.integers(0, 500, len(kmers)).astype(np.int32),
    rng.integers(0, 30, len(kmers)).astype(np.int32),
    rng.random(len(kmers)).astype(np.float32))
table.compute_max_probe()
values = np.concatenate([rng.choice(kmers, 3000),
                         rng.integers(0, 20**8, 3000, dtype=np.int64)])
want = lookup_stream(table, values, np.zeros(len(values)),
                     np.arange(len(values)))
want_canon = sorted(zip(want.pos.tolist(), want.otu.tolist(),
                        want.fi.tolist()))


def check(name, found, otu, fi):
    m = np.asarray(found).astype(bool)
    got = sorted(zip(np.flatnonzero(m).tolist(),
                     np.asarray(otu)[m].tolist(),
                     np.asarray(fi)[m].tolist()))
    assert got == want_canon, f"{name}: hit mismatch"
    print(f"MP-OK {name}", flush=True)


# 1. psum-sharded lookup: table sharded ACROSS the two processes, hit
#    columns merged with a psum riding gloo
from kmergutsjava_tpu.parallel.mesh import make_mesh  # noqa: E402
from kmergutsjava_tpu.parallel.sharded_lookup import (  # noqa: E402
    make_sharded_lookup, sharded_lookup_queries)

mesh = make_mesh(2, 2)
step, planes = make_sharded_lookup(mesh, table, max(8, table.max_probe))
found, otu, avg, fi, wt = sharded_lookup_queries(
    mesh, step, planes, values, table, pad_multiple=256)
check("sharded-psum", found, otu, fi)

# 2. routed lookup: queries all_to_all'd to owner shards across processes
from kmergutsjava_tpu.parallel.routed_lookup import (  # noqa: E402
    RoutedLookup, make_routed_mesh)

rl = RoutedLookup(table, make_routed_mesh(4),
                  probe_window=max(16, table.max_probe))
hits = rl.lookup(values, np.zeros(len(values), np.int64),
                 np.arange(len(values), dtype=np.int64))
got = sorted(zip(hits.pos.tolist(), hits.otu.tolist(), hits.fi.tolist()))
assert got == want_canon, "routed: hit mismatch"
print("MP-OK routed", flush=True)

# 3. zero-collective stream shards: plane + query tiles sharded by
#    superblock range across the process boundary (the flagship mode)
from kmergutsjava_tpu.parallel.stream_shards import (  # noqa: E402
    StreamShardedLookup, make_stream_mesh)

sl = StreamShardedLookup(table, mesh=make_stream_mesh(4))
hits = sl.lookup(values, np.zeros(len(values), np.int64),
                 np.arange(len(values), dtype=np.int64))
got = sorted(zip(hits.pos.tolist(), hits.otu.tolist(), hits.fi.tolist()))
assert got == want_canon, "stream-shards: hit mismatch"
print("MP-OK stream-shards", flush=True)

# 4. engine multihost contract: each host runs the engine over its
#    round-robin record share (jax.distributed up, host-local grouping),
#    writes its report SHARD to disk; the parent test merges the shards
#    with merge_report_shards and byte-compares against a single-process
#    run of the whole corpus (ref output grammar KmerGutsJava.java:398-404,
#    :516-522; phase-3 ordering :805-818)
from kmergutsjava_tpu.config import EngineConfig  # noqa: E402
from kmergutsjava_tpu.formats.fasta import FastaRecord  # noqa: E402
from kmergutsjava_tpu.formats.table_tools import (  # noqa: E402
    signatures_from_proteins, write_data_dir)
from kmergutsjava_tpu.models.pipeline import Engine  # noqa: E402
from kmergutsjava_tpu.parallel.multihost import shard_records  # noqa: E402

AA = "ACDEFGHIKLMNPQRSTVWY"
prng = np.random.default_rng(9)
prots = ["".join(AA[i] for i in prng.integers(0, 20, int(n)))
         for n in prng.integers(12, 90, 30)]
tmp_root = sys.argv[4] if len(sys.argv) > 4 else "/tmp"
d = os.path.join(tmp_root, f"mp_data_{pid}")
write_data_dir(d, signatures_from_proteins(
    [(p, i % 5, i % 7) for i, p in enumerate(prots)]),
    [f"fn{i}" for i in range(5)])
records = [FastaRecord(f"p{i}", p, "") for i, p in enumerate(prots)]
mine = list(shard_records(records, pid, nprocs))
out = io.StringIO()
Engine(EngineConfig(aa=True, min_hits=2)).run(
    d, None, out, stdout=True,
    query_stream=io.StringIO("".join(f">{r.id}\n{r.seq}\n" for r in mine)))
text = out.getvalue()
assert text.count("PROTEIN-ID") == len(mine)
with open(os.path.join(tmp_root, f"mp_report_{pid}.txt"), "w") as fh:
    fh.write(text)
if pid == 0:  # the parent needs the full corpus for its single-run leg
    with open(os.path.join(tmp_root, "mp_corpus.fa"), "w") as fh:
        fh.write("".join(f">{r.id}\n{r.seq}\n" for r in records))
print(f"MP-OK engine-shard n={len(mine)}", flush=True)
print("MP-WORKER-DONE", flush=True)
