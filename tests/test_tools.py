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
