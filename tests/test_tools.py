from kmergutsjava_tpu.tools import main as tools_main
from kmergutsjava_tpu.cli import main as cli_main

AA = "ACDEFGHIKLMNPQRSTVWY"


def test_build_table_cli_and_annotate(tmp_path, capsys):
    faa = tmp_path / "p.faa"
    faa.write_text(f">p1 alpha function\n{AA}\n>p2 beta function\n{AA[::-1]}\n")
    rc = tools_main(["build-table", "-o", str(tmp_path / "d"),
                     "--fasta", str(faa), "--functions-from-descr"])
    assert rc == 0
    assert "2 functions" in capsys.readouterr().out
    out = tmp_path / "r.txt"
    rc = cli_main(["-a", "-D", str(tmp_path / "d"), "-q", str(faa),
                   "-o", str(out)])
    assert rc == 0
    text = out.read_text()
    assert "alpha function" in text and "beta function" in text


def test_cli_flag_parsing_extras():
    from kmergutsjava_tpu.cli import parse_args

    import os

    env_before = os.environ.get("KMER_NATIVE_THREADS")
    cfg, d, q, o, platform, n_threads, ckpt, ckpt_every = parse_args(
        ["-D", "dir", "-t", "/tmp/x", "-l", "123",
         "-M", "2", "-O", "--grouping", "scan", "--threads", "3",
         "--mesh", "4x2", "--prepare", "jax", "--platform", "cpu"])
    assert d == "dir" and cfg.temp_dir == "/tmp/x"
    assert platform == "cpu"
    # --threads is only collected at parse time; main() applies it after a
    # successful parse (a parse error must not leave the env mutated)
    assert n_threads == 3
    assert os.environ.get("KMER_NATIVE_THREADS") == env_before
    assert cfg.input_size_limit == 123
    assert cfg.min_weighted_hits == 2
    assert cfg.order_constraint is True
    assert cfg.grouping_impl == "scan"
    assert cfg.mesh_shape == (4, 2)
    assert cfg.prepare_impl == "jax"


def test_profile_flag_writes_trace(tmp_path):
    from kmergutsjava_tpu.tools import main as tmain

    faa = tmp_path / "p.faa"
    faa.write_text(f">p1 fn\n{AA}\n")
    tmain(["build-table", "-o", str(tmp_path / "d"), "--fasta", str(faa)])
    out = tmp_path / "r.txt"
    rc = cli_main(["-a", "-D", str(tmp_path / "d"), "-q", str(faa),
                   "-o", str(out), "--profile", str(tmp_path / "trace")])
    assert rc == 0
    assert (tmp_path / "trace").exists()
    assert any((tmp_path / "trace").rglob("*"))


def test_check_table_cli(tmp_path, capsys):
    from kmergutsjava_tpu.tools import main as tmain

    faa = tmp_path / "p.faa"
    faa.write_text(f">p1 fn\n{AA}\n")
    tmain(["build-table", "-o", str(tmp_path / "d"), "--fasta", str(faa)])
    capsys.readouterr()
    rc = tmain(["check-table", str(tmp_path / "d")])
    out = capsys.readouterr().out
    assert rc == 0 and "OK" in out and "max_probe=" in out
    # corrupt: occupy the last slot
    import numpy as np

    from kmergutsjava_tpu.formats.kmer_table import (TABLE_FILE, read_table,
                                                     write_table)

    t = read_table(str(tmp_path / "d" / TABLE_FILE))
    slots = np.array(t.slots)
    slots["kmer"][-1] = 5
    t.slots = slots
    write_table(str(tmp_path / "d" / TABLE_FILE), t)
    rc = tmain(["check-table", str(tmp_path / "d")])
    out = capsys.readouterr().out
    assert rc == 1 and "last slot occupied" in out


def test_prepare_deploy_cfg(tmp_path, monkeypatch):
    """Stdlib deploy-config renderer (ref scripts/prepare_deploy_cfg.py)."""
    import subprocess
    import sys

    tmpl = tmp_path / "t.cfg"
    tmpl.write_text("dir={{ data_dir }}\nport={{ port }}\nwk={{ max_workers }}\n")
    ini = tmp_path / "deploy.ini"
    ini.write_text("[kmer_guts]\nmax_workers = 8\n")
    out = tmp_path / "o.cfg"
    env = {"PATH": "/usr/bin:/bin", "data_dir": "/data/x", "PORT": "5001",
           "KMER_DEPLOYMENT_CONFIG": str(ini)}
    r = subprocess.run([sys.executable, "scripts/prepare_deploy_cfg.py",
                        str(tmpl), str(out)], env=env, cwd="/root/repo",
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert out.read_text() == "dir=/data/x\nport=5001\nwk=8\n"

    # unresolved placeholder -> loud failure naming the key
    tmpl.write_text("x={{ nope_missing }}\n")
    r = subprocess.run([sys.executable, "scripts/prepare_deploy_cfg.py",
                        str(tmpl), str(out)], env=env, cwd="/root/repo",
                       capture_output=True, text=True)
    assert r.returncode == 1
    assert "nope_missing" in r.stderr


def test_compile_report(tmp_path, capsys):
    import json

    from kmergutsjava_tpu.service.compile_report import main as report_main

    out = tmp_path / "work" / "compile_report.json"
    rc = report_main([str(out)])
    assert rc == 0
    rep = json.loads(out.read_text())
    assert rep["module_name"] == "KmerGutsJava"
    names = {f["name"] for f in rep["functions"]}
    assert {"status", "annotate", "_annotate_submit", "_check_job"} <= names


def test_entrypoint_init_and_report_modes(tmp_path):
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo,
               DATA_DIR=str(tmp_path / "missing"),
               KMER_COMPILE_REPORT_FILE=str(tmp_path / "rep.json"))
    ep = os.path.join(repo, "scripts", "entrypoint.sh")
    r = subprocess.run(["bash", ep, "init"], env=env, cwd=repo,
                       capture_output=True, text=True)
    assert r.returncode == 0 and "nothing to validate" in r.stdout
    # init against a real data dir validates it
    from kmergutsjava_tpu.tools import main as tmain

    faa = tmp_path / "p.faa"
    faa.write_text(f">p1 fn\n{AA}\n")
    tmain(["build-table", "-o", str(tmp_path / "d"), "--fasta", str(faa)])
    env["DATA_DIR"] = str(tmp_path / "d")
    r = subprocess.run(["bash", ep, "init"], env=env, cwd=repo,
                       capture_output=True, text=True)
    assert r.returncode == 0 and "OK" in r.stdout
    r = subprocess.run(["bash", ep, "report"], env=env, cwd=repo,
                       capture_output=True, text=True)
    assert r.returncode == 0 and (tmp_path / "rep.json").exists()
