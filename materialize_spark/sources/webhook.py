"""Webhook source — file-drop stand-in for the reference's HTTP webhook
sources (CREATE SOURCE ... FROM WEBHOOK, reference
src/sql-parser/src/ast/defs/statement.rs:52, src/adapter/src/webhook.rs).

The reference accepts HTTP POSTs and appends (body, headers) rows to a
collection. No HTTP server belongs inside a Spark job, so the engine-side
analog is a spool directory: each ``post()`` appends one JSON-lines file
(the append-only commit a webhook endpoint would perform), and the source
relation is a read over the directory — batch (``df()``) or Structured
Streaming (``stream()``), which at scale is exactly how webhook ingestion
lands in a lake (collector writes files, engine tails the directory).

Schema mirrors the reference's webhook relation: ``body`` (string — BYTES
or JSON text per format), ``headers`` (map<string,string>), plus
``received_at``. ``BODY FORMAT JSON`` exposes parsed access via
``get_json_object`` downstream; the raw body is always retained.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_SCHEMA = ("body string, headers map<string,string>, "
           "received_at timestamp")


class WebhookSource:
    """Append-only webhook spool bound to one source name."""

    def __init__(self, spark: SparkSession, path: str,
                 body_format: str = "json"):
        self.spark = spark
        self.path = path
        self.body_format = body_format.lower()
        os.makedirs(path, exist_ok=True)
        self._seq = 0
        # called after each post (e.g. to refresh a catalog registration —
        # a batch DataFrame's file listing is pinned at creation time)
        self.on_post = None

    # -- ingestion (the HTTP POST analog) -----------------------------------
    def post(self, body, headers: dict | None = None) -> None:
        """Append one webhook delivery. ``body`` may be a str or any
        JSON-serializable object (serialized like BODY FORMAT JSON)."""
        if not isinstance(body, str):
            body = json.dumps(body)
        rec = {
            "body": body,
            "headers": {str(k): str(v) for k, v in (headers or {}).items()},
            # deterministic logical receive time: monotone per source
            "received_at": f"1970-01-01 00:00:{self._seq % 60:02d}",
        }
        self._seq += 1
        fname = os.path.join(self.path, f"{self._seq:08d}-{uuid.uuid4().hex}.json")
        tmp = fname + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(rec) + "\n")
        os.rename(tmp, fname)  # atomic append: readers never see partials
        if self.on_post is not None:
            self.on_post(rec)

    # -- relation views ------------------------------------------------------
    def df(self) -> DataFrame:
        """Current contents as a batch DataFrame."""
        return self.spark.read.schema(_SCHEMA).json(self.path)

    def stream(self) -> DataFrame:
        """Continuous tail of the spool (Structured Streaming source)."""
        return self.spark.readStream.schema(_SCHEMA).json(self.path)

    # -- real HTTP endpoint (reference src/adapter/src/webhook.rs) -----------
    def serve_http(self, host: str = "127.0.0.1", port: int = 0,
                   validate=None) -> tuple[str, int]:
        """Expose this source as a live HTTP endpoint: POSTs append to
        the spool exactly like ``post()``. ``validate(body, headers) ->
        bool`` mirrors the reference's CHECK clause (webhook.rs runs the
        validation expression before admitting the delivery; a False
        verdict is 401, like the reference's unauthorized rejection).
        Returns (host, port); the server runs on a daemon thread."""
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        src = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0) or 0)
                body = self.rfile.read(n).decode("utf-8", "replace")
                headers = {k.lower(): v for k, v in self.headers.items()}
                if validate is not None and not validate(body, headers):
                    self.send_response(401)
                    self.end_headers()
                    return
                src.post(body, headers)
                self.send_response(200)
                self.end_headers()

            def log_message(self, *args):  # no stderr chatter per POST
                pass

        srv = ThreadingHTTPServer((host, port), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        self._http = srv
        return srv.server_address

    def stop_http(self) -> None:
        srv = getattr(self, "_http", None)
        if srv is not None:
            srv.shutdown()
            srv.server_close()
            self._http = None


def hmac_sha256_check(secret: str, header: str = "x-signature"):
    """CHECK-clause factory: admit a delivery only when ``header`` holds
    the hex HMAC-SHA256 of the body under ``secret`` — the reference's
    canonical webhook validation (CHECK (WITH (HEADERS, BODY, SECRET ...)
    constant_time_eq(decode(headers->'x-signature', 'hex'),
    hmac(body, secret, 'sha256')))). Constant-time compare, like the
    reference's constant_time_eq."""
    import hashlib
    import hmac as _hmac

    def validate(body: str, headers: dict) -> bool:
        want = _hmac.new(secret.encode(), body.encode(),
                         hashlib.sha256).hexdigest()
        got = headers.get(header, "")
        return _hmac.compare_digest(want, got)

    return validate
