"""The JVM-oracle harness (scripts/jvm_oracle.py) must keep working: CI's
jvm-oracle job runs it for real (javac + java on ubuntu-latest); here the
documented local simulation exercises every other step — fixture build,
both CLIs, the byte-diff and golden-diff machinery."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_simulation_passes():
    env = dict(os.environ, JVM_ORACLE_SIMULATE="1",
               JVM_ORACLE_BACKENDS="parity,xla")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "jvm_oracle.py")],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "SIMULATION passed" in out.stdout
    # the committed goldens were byte-diffed too
    assert "oracle-vs-committed-golden: byte-identical" in out.stdout


def test_no_jdk_path_prints_commands():
    """Without a JDK the script documents the exact CI commands and exits
    3 (distinct from a parity failure)."""
    env = dict(os.environ)
    env.pop("JVM_ORACLE_SIMULATE", None)
    env["PATH"] = "/usr/bin:/bin"  # this image has no javac anywhere
    import shutil

    if shutil.which("javac", path=env["PATH"]):
        import pytest

        pytest.skip("a JDK exists here; the no-JDK path is moot")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "jvm_oracle.py")],
        capture_output=True, text=True, env=env, timeout=120)
    assert out.returncode == 3
    assert "javac" in out.stdout and "git clone" in out.stdout
