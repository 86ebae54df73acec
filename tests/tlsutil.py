"""Self-signed certificate + SSLContext helpers for TLS wire tests.

Uses the ``cryptography`` package when available (tests skip otherwise).
The key/cert pair is generated once per test session and cached.
"""

from __future__ import annotations

import ssl
import tempfile

import pytest

_CACHED: tuple[str, str] | None = None


def cert_files() -> tuple[str, str]:
    """(cert_pem_path, key_pem_path) for CN=localhost, cached."""
    global _CACHED
    if _CACHED is not None:
        return _CACHED
    x509 = pytest.importorskip("cryptography.x509")
    import datetime as _dt

    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(
        x509.oid.NameOID.COMMON_NAME, "localhost")])
    now = _dt.datetime.now(_dt.timezone.utc)
    cert = (x509.CertificateBuilder()
            .subject_name(name).issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now - _dt.timedelta(minutes=5))
            .not_valid_after(now + _dt.timedelta(days=1))
            .sign(key, hashes.SHA256()))
    d = tempfile.mkdtemp(prefix="mz_tls_")
    certf, keyf = f"{d}/cert.pem", f"{d}/key.pem"
    with open(certf, "wb") as f:
        f.write(cert.public_bytes(serialization.Encoding.PEM))
    with open(keyf, "wb") as f:
        f.write(key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption()))
    _CACHED = (certf, keyf)
    return _CACHED


def server_ctx() -> ssl.SSLContext:
    certf, keyf = cert_files()
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certf, keyf)
    return ctx


def client_ctx(verify: bool = False) -> ssl.SSLContext:
    """verify=True trusts the self-signed cert as CA (CN=localhost);
    verify=False skips verification (the 'insecure' conf)."""
    certf, _ = cert_files()
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    if verify:
        ctx.load_verify_locations(certf)
        ctx.check_hostname = False  # peers dial 127.0.0.1
        ctx.verify_mode = ssl.CERT_REQUIRED
    else:
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    return ctx
