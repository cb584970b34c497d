import json

from kmergutsjava_tpu.formats.table_tools import (signatures_from_proteins,
                                                  write_data_dir)
from kmergutsjava_tpu.service.async_job import run_job

AA = "ACDEFGHIKLMNPQRSTVWY"


def test_async_job_roundtrip(tmp_path):
    write_data_dir(str(tmp_path / "d"), signatures_from_proteins(
        [(AA, 0, 3)], weight=0.5), ["funcA"])
    inp = tmp_path / "in.json"
    outp = tmp_path / "out.json"
    inp.write_text(json.dumps({
        "version": "1.1", "id": "1",
        "method": "KmerGutsJava.annotate",
        "params": [{"fasta": ">P1\n" + AA + "\n", "aa": True}],
    }))
    rc = run_job(str(inp), str(outp), str(tmp_path / "d"))
    assert rc == 0
    resp = json.loads(outp.read_text())
    assert "CALL\t0\t18\t12\t0\tfuncA\t6.000000" in resp["result"][0]["report"]


def test_async_job_error(tmp_path):
    inp = tmp_path / "in.json"
    outp = tmp_path / "out.json"
    inp.write_text(json.dumps({"method": "KmerGutsJava.nope", "params": []}))
    rc = run_job(str(inp), str(outp))
    assert rc == 1
    assert "error" in json.loads(outp.read_text())
