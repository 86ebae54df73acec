"""HTTP SQL API: POST /api/sql over MzSession.

Reference: the reference serves SQL over HTTP alongside pgwire
(/root/reference/src/environmentd/src/http/sql.rs) — request is either
``{"query": "sql; sql2"}`` (simple) or ``{"queries": [{"query": "...",
"params": [...]}]}`` (extended, $n text parameters); response is
``{"results": [...]}`` with per-statement variants ``Rows {tag, rows,
desc.columns[{name,type_oid,type_len,type_mod}], notices}`` /
``Ok {ok, notices}`` / ``Err {error: {message, code}, notices}``
(sql.rs:521-610,720,781-809). This is the curl/JS-client path; the
engine serves the same MzSession surface the pgwire front-end does.

Auth: optional users map — HTTP Basic (RFC 7617), verified against the
same derived-verifier store SCRAM uses (the password re-derives the
stored key; plaintext never persists). Optional TLS via ssl_context.

Scale note: a serving veneer like pgwire — each statement executes the
session's ordinary Spark plans; rendering collects the peek result.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from materialize_spark import scram as _scram
from materialize_spark.plans.pgwire import _OIDS, MzPgServer, _render
from materialize_spark.plans.sqlfront import MzSession


def _verify_password(ver: dict, password: str) -> bool:
    import hashlib
    import hmac

    salted = hashlib.pbkdf2_hmac("sha256", password.encode(),
                                 ver["salt"], ver["iterations"])
    client_key = _scram.hm(salted, b"Client Key")
    return hmac.compare_digest(_scram.h(client_key), ver["stored_key"])


def _desc(df) -> dict:
    cols = []
    for f in df.schema.fields:
        simple = f.dataType.simpleString()
        oid = (1700 if simple.startswith("decimal")
               else _OIDS.get(simple, 25))
        cols.append({"name": f.name, "type_oid": oid,
                     "type_len": -1, "type_mod": -1})
    return {"columns": cols}


def _cell(v):
    """JSON cell rendering: JSON-native scalars pass through, everything
    else uses the pgwire text form (sql.rs renders Datum→serde_json)."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    r = _render(v)
    return r.decode() if r is not None else None


class MzHttpServer:
    """Threaded HTTP SQL endpoint over one MzSession."""

    def __init__(self, session: MzSession, host: str = "127.0.0.1",
                 port: int = 0, *, auth: dict[str, str] | None = None,
                 ssl_context=None):
        self.session = session
        self._auth = ({u: _scram.scram_verifier(p)
                       for u, p in auth.items()} if auth else None)
        # constant-cost decoy for unknown-user Basic auth attempts
        self._dummy_verifier = _scram.scram_verifier("decoy")
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _authorized(self) -> bool:
                if outer._auth is None:
                    return True
                hdr = self.headers.get("Authorization", "")
                if not hdr.startswith("Basic "):
                    return False
                try:
                    user, _, pw = base64.b64decode(
                        hdr[6:]).decode().partition(":")
                except Exception:
                    return False
                ver = outer._auth.get(user)
                if ver is None:
                    # unknown users pay the same PBKDF2 cost as known
                    # ones (the pgwire SCRAM path's fake-verifier
                    # defense) so Basic auth can't enumerate users by
                    # response timing
                    _verify_password(outer._dummy_verifier, pw)
                    return False
                return _verify_password(ver, pw)

            def do_POST(self):
                if self.path != "/api/sql":
                    self._reply(404, {"error": "unknown endpoint"})
                    return
                # network-policy gate (reference: environmentd applies
                # the active policy to HTTP sessions too)
                try:
                    session.check_network(self.client_address[0])
                except PermissionError as ex:
                    self._reply(403, {"error": str(ex)})
                    return
                if not self._authorized():
                    self.send_response(401)
                    self.send_header("WWW-Authenticate",
                                     'Basic realm="materialize"')
                    self.end_headers()
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError) as ex:
                    self._reply(400, {"error": f"invalid JSON: {ex}"})
                    return
                try:
                    results = outer._run(req)
                except ValueError as ex:
                    self._reply(400, {"error": str(ex)})
                    return
                self._reply(200, {"results": results})

        self._srv = ThreadingHTTPServer((host, port), Handler)
        if ssl_context is not None:
            self._srv.socket = ssl_context.wrap_socket(
                self._srv.socket, server_side=True)
        self.host, self.port = self._srv.server_address[:2]
        threading.Thread(target=self._srv.serve_forever,
                         daemon=True).start()

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- request execution ---------------------------------------------------
    def _run(self, req: dict) -> list[dict]:
        from materialize_spark.plans.lexer import split_statements

        if "queries" in req:  # extended: one statement each, $n params
            jobs = []
            for q in req["queries"]:
                sql = q.get("query", "")
                params = [None if p is None else str(p).encode()
                          for p in q.get("params", [])]
                bound = MzPgServer._substitute_params(sql, params, ())
                jobs.append(bound)
        elif "query" in req:  # simple: semicolon-delimited batch
            jobs = split_statements(req["query"])
        else:
            raise ValueError("body must contain 'query' or 'queries'")

        results: list[dict] = []
        for sql in jobs:
            try:
                out = self.session.execute(sql)
            except Exception as ex:
                results.append({"error": {"message": str(ex),
                                          "code": "XX000"},
                                "notices": []})
                # the reference stops a simple batch at the first error
                break
            if out is None:
                head = sql.lstrip().split(None, 2)
                tag = " ".join(head[:2]).upper() if head else "OK"
                results.append({"ok": tag, "notices": []})
                continue
            try:
                collected = self.session.check_result_size(out.collect())
            except Exception as ex:
                results.append({"error": {"message": str(ex),
                                          "code": "XX000"},
                                "notices": []})
                break
            rows = [[_cell(v) for v in row] for row in collected]
            results.append({
                "tag": f"SELECT {len(rows)}",
                "rows": rows,
                "desc": _desc(out),
                "notices": [],
            })
        return results
