"""JSON-RPC client (stdlib-only).

Counterpart of the reference's generated clients
(lib/KmerGutsJava/KmerGutsJavaClient.py and the Java/Perl/JS stubs — all of
which expose only ``status`` because the KIDL module is empty). This client
additionally drives the real ``annotate`` method our server exposes.
"""
from __future__ import annotations

import itertools
import json
import urllib.request
from typing import Optional


class ServerError(RuntimeError):
    def __init__(self, name: str, code: int, message: str):
        super().__init__(f"{name} ({code}): {message}")
        self.name = name
        self.code = code


class KmerGutsClient:
    def __init__(self, url: str, timeout: float = 600.0):
        self.url = url
        self.timeout = timeout
        self._ids = itertools.count(1)

    def _call(self, method: str, params):
        payload = json.dumps({
            "version": "1.1",
            "method": f"KmerGutsJava.{method}",
            "params": params,
            "id": str(next(self._ids)),
        }).encode()
        req = urllib.request.Request(
            self.url, data=payload,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                body = json.load(resp)
        except urllib.error.HTTPError as ex:
            body = json.load(ex)
        if "error" in body and body["error"]:
            err = body["error"]
            raise ServerError(err.get("name", "JSONRPCError"),
                              err.get("code", -32000),
                              err.get("message", ""))
        return body["result"]

    def status(self) -> dict:
        return self._call("status", [])[0]

    def warm(self) -> dict:
        return self._call("warm", [])[0]

    def annotate(self, fasta: Optional[str] = None,
                 fasta_path: Optional[str] = None, **options) -> str:
        params = dict(options)
        if fasta is not None:
            params["fasta"] = fasta
        elif fasta_path is not None:
            params["fasta_path"] = fasta_path
        else:
            raise ValueError("fasta or fasta_path required")
        return self._call("annotate", [params])[0]["report"]
