"""Minimal REST transport used by the FastNetMon API source/sink.

The reference talks to the API with grequests + basic auth
(fnm/main.go:222-235). Here the HTTP layer is an injectable callable so
tests (and air-gapped runs) swap in a fake; the default implementation
uses only the standard library.

Transport signature: (method, url, auth) -> (status_code, parsed_json).
"""

from __future__ import annotations

import base64
import json
import urllib.error
import urllib.request
from collections.abc import Callable

Transport = Callable[[str, str, tuple[str, str]], tuple[int, dict]]


class RestError(RuntimeError):
    pass


def urllib_transport(method: str, url: str, auth: tuple[str, str]) -> tuple[int, dict]:
    """Stdlib transport with HTTP basic auth (no external deps)."""
    req = urllib.request.Request(url, method=method)
    token = base64.b64encode(f"{auth[0]}:{auth[1]}".encode()).decode()
    req.add_header("Authorization", f"Basic {token}")
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            body = resp.read()
            return resp.status, json.loads(body) if body else {}
    except urllib.error.HTTPError as e:  # non-2xx still carries a body
        body = e.read()
        try:
            return e.code, json.loads(body) if body else {}
        except json.JSONDecodeError:
            return e.code, {}


class HttpTransport:
    """Callable transport wrapper that checks the reference's error
    contract: 401 -> auth denied, other non-OK -> error with code
    (fnm/main.go:459-468)."""

    def __init__(self, transport: Transport | None = None):
        self._send = transport or urllib_transport

    def __call__(self, method: str, url: str, auth: tuple[str, str]) -> dict:
        status, body = self._send(method, url, auth)
        if status == 401:
            raise RestError("Auth denied")
        if not 200 <= status < 300:
            raise RestError(f"Did not return OK: {status}")
        return body
