"""TLS configuration for the wire clients and mini peers.

Reference: every external connection in the reference carries optional
TLS/SSL configuration (/root/reference/src/storage-types/src/
connections.rs — KafkaConnection brokers' TLS identity/CA, Postgres/MySQL
TlsMode); the pgwire server has its own TlsMode
(src/pgwire/src/server.rs). This module is the Spark-graft analog: a
small, PICKLABLE description of the client-side TLS settings (executors
can't ship an ``ssl.SSLContext`` — closures that run in Spark tasks carry
this dict and build the context per task).

Keys (all optional; an empty/None conf means plaintext):
- ``cafile``: path to a PEM CA bundle used to verify the peer
- ``insecure``: bool — skip certificate/hostname verification
  (self-signed test peers; the reference's VerifyNone-style mode)
"""

from __future__ import annotations

import ssl


def client_context(conf: dict | None) -> ssl.SSLContext | None:
    """Build a client ``SSLContext`` from a picklable conf dict (or pass
    an already-built ``SSLContext`` through; None → plaintext)."""
    if conf is None:
        return None
    if isinstance(conf, ssl.SSLContext):
        return conf
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    if conf.get("cafile"):
        ctx.load_verify_locations(conf["cafile"])
    if not conf.get("verify_hostname"):
        # verify-ca posture: chain is checked, hostname is not
        # (verify-full sets verify_hostname=True)
        ctx.check_hostname = False
    if conf.get("insecure"):
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    return ctx


def connection_ssl_conf(conn_opts: dict) -> dict | None:
    """Extract a TLS conf dict from CREATE CONNECTION options
    (``SSL = 'true'``, ``SSL_CA = '<pem>'``, ``SSL_MODE = 'require' |
    'verify-ca'`` — the reference's connection SSL surface)."""
    mode = str(conn_opts.get("ssl_mode", "")).lower()
    enabled = (str(conn_opts.get("ssl", "")).lower()
               in ("true", "on", "1", "require")
               or mode in ("require", "verify-ca", "verify-full"))
    if not enabled:
        return None
    return {"cafile": conn_opts.get("ssl_ca"),
            "verify_hostname": mode == "verify-full",
            "insecure": mode not in ("verify-ca", "verify-full")
            and not conn_opts.get("ssl_ca")}
