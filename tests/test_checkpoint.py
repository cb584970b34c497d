"""Checkpoint/resume (models/checkpoint.py): batched execution must be
byte-identical to a single run, survive a mid-run crash with a torn output
tail, and refuse mismatched inputs/parameters."""
import io
import json
import os

import pytest

from kmergutsjava_tpu.cli import main as cli_main
from kmergutsjava_tpu.config import EngineConfig
from kmergutsjava_tpu.formats.table_tools import (signatures_from_proteins,
                                                  write_data_dir)
from kmergutsjava_tpu.models.checkpoint import (CheckpointError, iter_groups,
                                                run_with_checkpoint)
from kmergutsjava_tpu.models.pipeline import Engine

AA = "ACDEFGHIKLMNPQRSTVWY"


def _mk_corpus(n=23, seed=7):
    import random

    rng = random.Random(seed)
    lines = []
    for i in range(n):
        seq = "".join(rng.choice(AA) for _ in range(rng.randint(9, 60)))
        if rng.random() < 0.3:
            seq = AA + seq  # guaranteed hits for some records
        lines.append(f">P{i} some descr {i}\n{seq}\n")
        if rng.random() < 0.2:
            lines.append("\n")  # blank line noise (parser skips)
    return "".join(lines)


@pytest.fixture()
def data_dir(tmp_path):
    d = str(tmp_path / "d")
    write_data_dir(d, signatures_from_proteins(
        [(AA, 0, 3), (AA[::-1] + AA, 1, 5)], weight=0.5),
        ["funcA", "funcB"])
    return d


def _single_run(cfg, data_dir, fasta_text):
    out = io.StringIO()
    Engine(cfg).run(data_dir, None, out, stdout=False,
                    query_stream=io.StringIO(fasta_text))
    return out.getvalue()


def test_iter_groups_boundaries():
    text = ("junk\n\n>A d\nSEQ\nSEQ2\n>\n>B\nQQQ\n  >C\nRRR\n")
    groups = list(iter_groups(io.StringIO(text)))
    # preamble rides with the first caption group; bare '>' and an
    # indented '>C' (java-trim) both open groups
    assert ["".join(g) for g in groups] == [
        "junk\n\n>A d\nSEQ\nSEQ2\n", ">\n", ">B\nQQQ\n", "  >C\nRRR\n"]


def test_checkpoint_equals_single_run(tmp_path, data_dir):
    fasta = _mk_corpus()
    q = tmp_path / "q.fa"
    q.write_text(fasta)
    cfg = EngineConfig(aa=True)
    expect = _single_run(EngineConfig(aa=True), data_dir, fasta)
    out = tmp_path / "r.txt"
    ck = tmp_path / "r.ckpt"
    n = run_with_checkpoint(cfg, data_dir, str(q), str(out), str(ck),
                            batch_groups=5, progress=False)
    assert n == 23
    assert out.read_text() == expect
    st = json.loads(ck.read_text())
    assert st["complete"] and st["groups_done"] == 23
    # re-invoking a complete run is a no-op
    assert run_with_checkpoint(cfg, data_dir, str(q), str(out), str(ck),
                               batch_groups=5, progress=False) == 0
    assert out.read_text() == expect


def test_checkpoint_equals_single_run_dna(tmp_path, data_dir):
    import random

    rng = random.Random(11)
    fasta = "".join(
        f">C{i}\n" + "".join(rng.choice("ACGT") for _ in range(
            rng.randint(60, 400))) + "\n"
        for i in range(12))
    q = tmp_path / "q.fna"
    q.write_text(fasta)
    expect = _single_run(EngineConfig(aa=False), data_dir, fasta)
    out, ck = tmp_path / "r.txt", tmp_path / "r.ckpt"
    n = run_with_checkpoint(EngineConfig(aa=False), data_dir, str(q),
                            str(out), str(ck), batch_groups=5,
                            progress=False)
    assert n == 12 and out.read_text() == expect


def test_crash_resume_with_torn_tail(tmp_path, data_dir):
    fasta = _mk_corpus(n=17)
    q = tmp_path / "q.fa"
    q.write_text(fasta)
    cfg = EngineConfig(aa=True)
    expect = _single_run(EngineConfig(aa=True), data_dir, fasta)
    out = tmp_path / "r.txt"
    ck = tmp_path / "r.ckpt"

    # simulated crash: run exactly 2 batches of 4, then die mid-batch-3
    class Boom(RuntimeError):
        pass

    orig_run = Engine.run
    calls = {"n": 0}

    def crashing_run(self, *a, **k):
        calls["n"] += 1
        if calls["n"] > 2:
            raise Boom()
        return orig_run(self, *a, **k)

    Engine.run = crashing_run
    try:
        with pytest.raises(Boom):
            run_with_checkpoint(cfg, data_dir, str(q), str(out), str(ck),
                                batch_groups=4, progress=False)
    finally:
        Engine.run = orig_run
    st = json.loads(ck.read_text())
    assert st["groups_done"] == 8 and not st["complete"]
    # simulate a torn tail: garbage written after the last committed offset
    with open(out, "ab") as fh:
        fh.write(b"TORN GARBAGE FROM THE CRASH")
    n = run_with_checkpoint(cfg, data_dir, str(q), str(out), str(ck),
                            batch_groups=4, progress=False)
    assert n == 17 - 8
    assert out.read_text() == expect
    assert json.loads(ck.read_text())["complete"]


def test_duplicate_ids_checkpointed_byte_identical(tmp_path, data_dir):
    """Same-id sequences print at the id's FIRST occurrence with the LAST
    occurrence's length/containers (phase 3 walks containers grouped by
    id, ref KmerGutsJava.java:805-818), which batches cannot reproduce
    across a boundary — found by soak seed 253355989. The batcher must
    therefore hold a batch open until every id it contains has passed its
    last occurrence, and the result must still match a single run
    byte-for-byte at every batch size."""
    fasta = (">A x\n" + AA + "\n>B y\n" + AA[::-1] + AA + "\n"
             ">A z\n" + AA + AA + "\n"
             ">C w\n" + AA + "\n>D v\n" + AA[5:] + AA + "\n")
    # single run: one PROTEIN-ID A section, emitted before B, reporting
    # the SECOND A record's hits (dup semantics the batches must keep)
    expect = _single_run(EngineConfig(aa=True), data_dir, fasta)
    ids = [l.split("\t")[1] for l in expect.splitlines()
           if l.startswith("PROTEIN-ID")]
    assert ids == ["A", "B", "C", "D"]
    q = tmp_path / "q.fa"
    q.write_text(fasta)
    for bg in (1, 2, 3, 10):
        out, ck = tmp_path / f"r{bg}.txt", tmp_path / f"r{bg}.ckpt"
        n = run_with_checkpoint(EngineConfig(aa=True), data_dir, str(q),
                                str(out), str(ck), batch_groups=bg,
                                progress=False)
        assert n == 5
        assert out.read_text() == expect
        st = json.loads(ck.read_text())
        assert st["complete"] and st["groups_done"] == 5
    # at batch_groups=1 the A..A span must have been ONE batch (commits at
    # groups 3, 4, 5 — never between the two A records); prove it by
    # crashing after the first commit and checking the committed prefix
    # covers all three of A,B,A
    out, ck = tmp_path / "crash.txt", tmp_path / "crash.ckpt"
    orig_run = Engine.run
    calls = []

    class Boom(RuntimeError):
        pass

    def crashing_run(self, *a, **kw):
        calls.append(1)
        if len(calls) > 1:
            raise Boom()
        return orig_run(self, *a, **kw)

    Engine.run = crashing_run
    try:
        with pytest.raises(Boom):
            run_with_checkpoint(EngineConfig(aa=True), data_dir, str(q),
                                str(out), str(ck), batch_groups=1,
                                progress=False)
    finally:
        Engine.run = orig_run
    st = json.loads(ck.read_text())
    assert st["groups_done"] == 3 and not st["complete"]
    # resume completes to the same bytes
    n = run_with_checkpoint(EngineConfig(aa=True), data_dir, str(q),
                            str(out), str(ck), batch_groups=1,
                            progress=False)
    assert n == 2
    assert out.read_text() == expect


def test_prefix_digest_catches_inplace_edit_of_committed_region(
        tmp_path, data_dir, monkeypatch):
    """A size-preserving edit inside the already-committed input prefix
    must be caught on resume even when the whole-file identity check is
    only SAMPLED (large-input mode) — the running prefix digest re-covers
    the skipped groups exactly."""
    from kmergutsjava_tpu.models import checkpoint as ck_mod

    monkeypatch.setattr(ck_mod, "_FULL_HASH_MAX", 0)  # force sampled mode
    fasta = _mk_corpus(n=9)
    q = tmp_path / "q.fa"
    q.write_text(fasta)
    out, ck = tmp_path / "r.txt", tmp_path / "r.ckpt"
    orig_run = Engine.run
    calls = []

    class Boom(RuntimeError):
        pass

    def crashing_run(self, *a, **kw):
        calls.append(1)
        if len(calls) > 1:
            raise Boom()
        return orig_run(self, *a, **kw)

    Engine.run = crashing_run
    try:
        with pytest.raises(Boom):
            run_with_checkpoint(EngineConfig(aa=True), data_dir, str(q),
                                str(out), str(ck), batch_groups=4,
                                progress=False)
    finally:
        Engine.run = orig_run
    # size-preserving flip of one committed sequence byte, positioned
    # between the sampler's head block boundaries for huge files; with
    # _FULL_HASH_MAX=0 the sampled hash DOES still cover this tiny file,
    # so also bypass the identity check to isolate the prefix-digest leg
    data = q.read_bytes()
    idx = data.index(b">P1") + 10
    q.write_bytes(data[:idx] + (b"W" if data[idx:idx + 1] != b"W"
                                else b"Y") + data[idx + 1:])
    ident = json.loads(ck.read_text())["input"]
    monkeypatch.setattr(ck_mod, "_input_identity", lambda p: ident)
    with pytest.raises(CheckpointError, match="no longer match"):
        run_with_checkpoint(EngineConfig(aa=True), data_dir, str(q),
                            str(out), str(ck), batch_groups=4,
                            progress=False)


def test_mismatch_refusals(tmp_path, data_dir):
    fasta = _mk_corpus(n=6)
    q = tmp_path / "q.fa"
    q.write_text(fasta)
    out, ck = tmp_path / "r.txt", tmp_path / "r.ckpt"
    cfg = EngineConfig(aa=True)
    run_with_checkpoint(cfg, data_dir, str(q), str(out), str(ck),
                        batch_groups=3, progress=False)
    # changed parameters -> refuse
    with pytest.raises(CheckpointError, match="different parameters"):
        run_with_checkpoint(EngineConfig(aa=True, min_hits=7), data_dir,
                            str(q), str(out), str(ck), progress=False)
    # changed input file -> refuse
    q.write_text(fasta + ">X\n" + AA + "\n")
    with pytest.raises(CheckpointError, match="different input"):
        run_with_checkpoint(cfg, data_dir, str(q), str(out), str(ck),
                            progress=False)
    # debug mode -> refuse
    with pytest.raises(CheckpointError, match="non-debug"):
        run_with_checkpoint(EngineConfig(aa=True, debug=True), data_dir,
                            str(q), str(out), str(ck), progress=False)
    # missing output alongside a live checkpoint -> refuse
    q.write_text(fasta)
    os.unlink(out)
    with pytest.raises(CheckpointError, match="does not"):
        run_with_checkpoint(cfg, data_dir, str(q), str(out), str(ck),
                            progress=False)


def test_backend_switch_on_resume_is_allowed(tmp_path, data_dir):
    """All backends are byte-identical (the parity contract), so a resume
    may switch backends — e.g. a host without the native toolchain."""
    fasta = _mk_corpus(n=10)
    q = tmp_path / "q.fa"
    q.write_text(fasta)
    expect = _single_run(EngineConfig(aa=True), data_dir, fasta)
    out, ck = tmp_path / "r.txt", tmp_path / "r.ckpt"

    class Boom(RuntimeError):
        pass

    orig_run = Engine.run
    calls = {"n": 0}

    def crashing_run(self, *a, **k):
        calls["n"] += 1
        if calls["n"] > 1:
            raise Boom()
        return orig_run(self, *a, **k)

    Engine.run = crashing_run
    try:
        with pytest.raises(Boom):
            run_with_checkpoint(EngineConfig(aa=True, backend="xla"),
                                data_dir, str(q), str(out), str(ck),
                                batch_groups=4, progress=False)
    finally:
        Engine.run = orig_run
    run_with_checkpoint(EngineConfig(aa=True, backend="parity"), data_dir,
                        str(q), str(out), str(ck), batch_groups=4,
                        progress=False)
    assert out.read_text() == expect


def test_cli_checkpoint_flags(tmp_path, data_dir, capsys):
    fasta = _mk_corpus(n=8)
    q = tmp_path / "q.fa"
    q.write_text(fasta)
    out, ck = tmp_path / "r.txt", tmp_path / "r.ckpt"
    rc = cli_main(["-a", "-D", data_dir, "-q", str(q), "-o", str(out),
                   "--checkpoint", str(ck), "--checkpoint-every", "3"])
    assert rc == 0
    assert json.loads(ck.read_text())["complete"]
    assert out.read_text() == _single_run(EngineConfig(aa=True), data_dir,
                                          fasta)
    # flag validation
    assert cli_main(["-a", "-D", data_dir, "--checkpoint", str(ck)]) == 2
    assert cli_main(["-a", "-D", data_dir, "-q", str(q), "-o", str(out),
                     "--checkpoint-every", "3"]) == 2
    assert cli_main(["-a", "-d", "-D", data_dir, "-q", str(q), "-o",
                     str(out), "--checkpoint", str(ck)]) == 2
