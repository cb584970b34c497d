"""Token-validation client (service/auth.py) — the analog of the
reference's lib/KmerGutsJava/authclient.py:24-91 (KBase token cache +
auth-service lookup), here wired into the live server via --auth-url."""
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from kmergutsjava_tpu.service.auth import AuthClient, AuthError, TokenCache


class _StubAuth:
    """Minimal auth service speaking the reference login wire shape
    (POST token=...&fields=user_id -> {"user_id": ...}; rejects with
    {"error_msg": ...})."""

    def __init__(self, valid):
        stub = self
        stub.hits = 0
        stub.valid = dict(valid)

        class H(BaseHTTPRequestHandler):
            def do_POST(self):
                stub.hits += 1
                body = self.rfile.read(
                    int(self.headers.get("Content-Length", 0))).decode()
                token = urllib.parse.parse_qs(body).get("token", [""])[0]
                user = stub.valid.get(token)
                if user is None:
                    payload = json.dumps({"error_msg": "bad token"}).encode()
                    self.send_response(401)
                else:
                    payload = json.dumps({"user_id": user}).encode()
                    self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, fmt, *args):
                pass

        self.srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=self.srv.serve_forever, daemon=True).start()
        self.url = f"http://127.0.0.1:{self.srv.server_address[1]}"

    def close(self):
        self.srv.shutdown()


@pytest.fixture()
def stub():
    s = _StubAuth({"tok-alice": "alice", "tok-bob": "bob"})
    yield s
    s.close()


def test_cache_ttl_and_hashing(monkeypatch):
    cache = TokenCache()
    cache.add_valid_token("secret-token", "alice")
    assert cache.get_user("secret-token") == "alice"
    # raw credentials never stored (sha256 keys only, ref :27,:42)
    assert all("secret-token" not in k for k in cache._cache)
    # 5-minute validity window (ref :17,:33-35)
    now = [0.0]
    import kmergutsjava_tpu.service.auth as auth_mod

    monkeypatch.setattr(auth_mod.time, "time", lambda: now[0])
    cache = TokenCache()
    cache.add_valid_token("t", "u")
    now[0] = TokenCache.MAX_TIME_SEC - 1
    assert cache.get_user("t") == "u"
    now[0] = TokenCache.MAX_TIME_SEC + 1
    assert cache.get_user("t") is None


def test_cache_evicts_oldest_half(monkeypatch):
    import kmergutsjava_tpu.service.auth as auth_mod

    now = [0.0]
    monkeypatch.setattr(auth_mod.time, "time", lambda: now[0])
    cache = TokenCache(maxsize=10)
    for i in range(11):
        now[0] = float(i)
        cache.add_valid_token(f"t{i}", f"u{i}")
    # overflow at insert 11 evicts the oldest half (indices 0..5, ref :44-51)
    assert len(cache._cache) == 5
    assert cache.get_user("t0") is None
    assert cache.get_user("t10") == "u10"
    with pytest.raises(ValueError, match="token"):
        cache.add_valid_token("", "u")
    with pytest.raises(ValueError, match="user"):
        cache.add_valid_token("t", "")


def test_auth_client_validates_and_caches(stub):
    c = AuthClient(stub.url)
    assert c.get_user("tok-alice") == "alice"
    assert stub.hits == 1
    # second resolution served from cache — no network round-trip (ref :73-75)
    assert c.get_user("tok-alice") == "alice"
    assert stub.hits == 1
    assert c.get_user("tok-bob") == "bob"
    assert stub.hits == 2
    with pytest.raises(AuthError, match="bad token"):
        c.get_user("tok-mallory")
    with pytest.raises(AuthError, match="Must supply token"):
        c.get_user("")


def test_auth_client_transport_failure():
    c = AuthClient("http://127.0.0.1:1/never", timeout=0.5)
    with pytest.raises(AuthError, match="auth service"):
        c.get_user("anything")


def test_server_auth_url_integration(stub, tmp_path):
    """--auth-url path: the live server resolves Authorization headers
    through the auth service instead of a static --token compare."""
    from kmergutsjava_tpu.formats.table_tools import (
        signatures_from_proteins, write_data_dir)
    from kmergutsjava_tpu.service.client import KmerGutsClient, ServerError
    from kmergutsjava_tpu.service.server import serve

    AA = "ACDEFGHIKLMNPQRSTVWY"
    write_data_dir(str(tmp_path / "d"), signatures_from_proteins(
        [(AA, 0, 3)], weight=0.5), ["funcA"])
    srv = serve(str(tmp_path / "d"), port=0, auth=AuthClient(stub.url))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        rep = KmerGutsClient(url, token="tok-alice").annotate(
            fasta=">P1\n" + AA + "\n", aa=True)
        assert "PROTEIN-ID\tP1\t20" in rep
        with pytest.raises(ServerError, match="Authorization required"):
            KmerGutsClient(url).status()
        with pytest.raises(ServerError, match="Authorization required"):
            KmerGutsClient(url, token="tok-mallory").status()
        # cached token: the second authorized call must not re-hit auth
        hits_before = stub.hits
        KmerGutsClient(url, token="tok-alice").status()
        assert stub.hits == hits_before
    finally:
        srv.shutdown()
