"""Operational endpoints + production hardening of the RPC server:
/metrics (Prometheus text), /healthz, /readyz, request-body cap, async-job
reaping, and graceful drain. No reference counterpart (the reference's only
operational signal is Jetty's NCSA log, scripts/jetty.xml:75-87)."""
import json
import threading
import time
import urllib.error
import urllib.request

import pytest

from kmergutsjava_tpu.formats.table_tools import (signatures_from_proteins,
                                                  write_data_dir)
from kmergutsjava_tpu.service.client import KmerGutsClient
from kmergutsjava_tpu.service.metrics import MetricsRegistry
from kmergutsjava_tpu.service.server import KmerGutsService, serve

AA = "ACDEFGHIKLMNPQRSTVWY"


@pytest.fixture()
def server(tmp_path):
    write_data_dir(str(tmp_path / "d"), signatures_from_proteins(
        [(AA, 0, 3)], weight=0.5), ["funcA"])
    srv = serve(str(tmp_path / "d"), port=0, max_body_bytes=4096)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.status, r.read().decode()


def test_healthz_readyz(server):
    srv, url = server
    assert _get(url + "/healthz") == (200, "ok\n")
    code, body = _get(url + "/readyz")
    assert code == 200 and body.strip() == "ok"


def test_readyz_not_ready(tmp_path):
    # data dir without a table file -> 503
    srv = serve(str(tmp_path), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(url + "/readyz")
        assert ei.value.code == 503
        # liveness stays green: the process is up even if not ready
        assert _get(url + "/healthz")[0] == 200
    finally:
        srv.shutdown()


def test_metrics_exposition(server):
    srv, url = server
    client = KmerGutsClient(url)
    client.status()
    client.annotate(fasta=">P1\n" + AA + "\n", aa=True)
    code, text = _get(url + "/metrics")
    assert code == 200
    assert '# TYPE rpc_requests_total counter' in text
    assert 'rpc_requests_total{method="status",outcome="ok"} 1' in text
    assert 'rpc_requests_total{method="annotate",outcome="ok"} 1' in text
    assert 'annotate_input_bytes_total' in text
    # histogram family present with cumulative buckets, sum, count
    assert 'rpc_request_seconds_bucket{le="+Inf",method="annotate"} 1' in text
    assert 'rpc_request_seconds_count{method="annotate"} 1' in text
    assert 'process_start_time_seconds' in text
    # in-flight gauge returns to zero after requests complete
    assert 'rpc_requests_in_flight 0' in text


def test_metrics_error_outcomes(server):
    srv, url = server
    client = KmerGutsClient(url)
    for fn in (lambda: client._call("nope", []),
               lambda: client._call("annotate", [{}])):
        try:
            fn()
        except Exception:
            pass
    _, text = _get(url + "/metrics")
    # unknown methods collapse onto a fixed label: echoing the raw client
    # string would let bogus methods mint unbounded counter keys
    assert 'rpc_requests_total{method="_unknown",outcome="no_such_method"} 1' \
        in text
    assert 'rpc_requests_total{method="annotate",outcome="rpc_error"} 1' \
        in text


def test_body_too_large(server):
    srv, url = server  # max_body_bytes=4096 in the fixture
    body = json.dumps({"method": "KmerGutsJava.annotate", "params": [
        {"fasta": ">P\n" + "A" * 8192 + "\n", "aa": True}],
        "id": 1, "version": "1.1"}).encode()
    req = urllib.request.Request(url, data=body,
                                 headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 413
    err = json.loads(ei.value.read())
    assert err["error"]["code"] == -32002
    _, text = _get(url + "/metrics")
    assert 'outcome="body_too_large"} 1' in text


def test_get_unknown_path(server):
    srv, url = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(url + "/nope")
    assert ei.value.code == 404


def test_job_reaping():
    svc = KmerGutsService(None)
    # 3 finished jobs, one stale beyond TTL
    with svc._jobs_lock:
        now = time.time()
        svc._jobs["job_old"] = {"finished": 1, "result": [1],
                                "_done_at": now - svc.JOB_TTL_S - 1}
        svc._jobs["job_new"] = {"finished": 1, "result": [1], "_done_at": now}
        svc._jobs["job_run"] = {"finished": 0}
        svc._reap_jobs(now)
        assert "job_old" not in svc._jobs
        assert "job_new" in svc._jobs and "job_run" in svc._jobs
    # _done_at never leaks over the wire
    out = svc.check_job(["job_new"])[0]
    assert "_done_at" not in out and out["finished"] == 1


def test_job_hard_cap():
    svc = KmerGutsService(None)
    svc.MAX_JOBS = 5
    now = time.time()
    with svc._jobs_lock:
        for i in range(8):
            svc._jobs[f"job_{i}"] = {"finished": 1, "result": [],
                                     "_done_at": now + i}
        svc._jobs["job_r"] = {"finished": 0}
        svc._reap_jobs(now)
        # oldest finished jobs reaped down to the cap; running job kept
        assert len(svc._jobs) == 5
        assert "job_r" in svc._jobs and "job_7" in svc._jobs
        assert "job_0" not in svc._jobs


def test_graceful_drain(tmp_path):
    write_data_dir(str(tmp_path / "d"), signatures_from_proteins(
        [(AA, 0, 3)], weight=0.5), ["funcA"])
    srv = serve(str(tmp_path / "d"), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    client = KmerGutsClient(url)
    results = []
    rt = threading.Thread(
        target=lambda: results.append(
            client.annotate(fasta=">P1\n" + AA + "\n", aa=True)))
    rt.start()
    time.sleep(0.05)
    assert srv.drain(timeout_s=30.0)
    rt.join(30.0)
    # the in-flight request completed during the drain window
    assert results and "PROTEIN-ID\tP1\t20" in results[0]


def test_histogram_rendering_cumulative():
    m = MetricsRegistry()
    for v in (0.001, 0.05, 0.3, 100.0):
        m.observe("rpc_request_seconds", v, {"method": "x"})
    text = m.render()
    assert 'rpc_request_seconds_bucket{le="0.005",method="x"} 1' in text
    assert 'rpc_request_seconds_bucket{le="0.1",method="x"} 2' in text
    assert 'rpc_request_seconds_bucket{le="0.5",method="x"} 3' in text
    assert 'rpc_request_seconds_bucket{le="300.0",method="x"} 4' in text
    assert 'rpc_request_seconds_bucket{le="+Inf",method="x"} 4' in text
    assert 'rpc_request_seconds_count{method="x"} 4' in text
