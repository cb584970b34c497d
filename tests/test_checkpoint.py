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


def test_duplicate_id_refused(tmp_path, data_dir):
    """Same-id sequences print at the id's FIRST occurrence (phase 3 walks
    containers grouped by id, ref KmerGutsJava.java:805-818), which batches
    cannot reproduce across a boundary — found by soak seed 253355989.
    The pre-scan must refuse before ANY batch is committed."""
    fasta = (">A x\n" + AA + "\n>B y\n" + AA[::-1] + AA + "\n"
             ">A z\n" + AA + AA + "\n")
    q = tmp_path / "q.fa"
    q.write_text(fasta)
    out, ck = tmp_path / "r.txt", tmp_path / "r.ckpt"
    with pytest.raises(CheckpointError, match="duplicate sequence id 'A'"):
        run_with_checkpoint(EngineConfig(aa=True), data_dir, str(q),
                            str(out), str(ck), batch_groups=1,
                            progress=False)
    assert not ck.exists()  # refused before any commit
    # and duplicate ids really are unreproducible across batches: in aa
    # mode the engine keys containers by id, so the second A record's
    # hits MERGE into the first A section (one PROTEIN-ID A line, emitted
    # before B) — batch-split A records would emit two
    rep = _single_run(EngineConfig(aa=True), data_dir, fasta)
    ids = [l.split("\t")[1] for l in rep.splitlines()
           if l.startswith("PROTEIN-ID")]
    assert ids == ["A", "B"]


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
