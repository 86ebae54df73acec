"""SCRAM-SHA-256 primitives (RFC 5802 / RFC 7677), shared by the pgwire
server/client (PG AuthenticationSASL) and the Kafka wire client/broker
(SaslHandshake/SaslAuthenticate) — both protocols carry the SAME SCRAM
message exchange, only the framing differs.

Reference: the reference authenticates pgwire clients via SCRAM
(/root/reference/src/pgwire/src/protocol.rs) and configures SASL SCRAM
on Kafka connections (src/storage-types/src/connections.rs sasl
mechanisms). Only public RFC mechanics are implemented here.
"""

from __future__ import annotations

import base64
import hashlib
import hmac as _hmac
import secrets


def h(b: bytes) -> bytes:
    return hashlib.sha256(b).digest()


def hm(key: bytes, msg: bytes) -> bytes:
    return _hmac.new(key, msg, hashlib.sha256).digest()


def xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def scram_verifier(password: str, *, salt: bytes | None = None,
                   iterations: int = 4096) -> dict:
    """Server-side stored credential: the server never keeps the password,
    only (salt, i, StoredKey, ServerKey) — what PG stores in
    pg_authid.rolpassword and Kafka in its SCRAM credential store."""
    salt = salt if salt is not None else secrets.token_bytes(16)
    salted = hashlib.pbkdf2_hmac("sha256", password.encode(), salt,
                                 iterations)
    client_key = hm(salted, b"Client Key")
    return {"salt": salt, "iterations": iterations,
            "stored_key": h(client_key),
            "server_key": hm(salted, b"Server Key")}


def scram_attrs(msg: str) -> dict[str, str]:
    return {p[0]: p[2:] for p in msg.split(",") if len(p) > 1
            and p[1] == "="}


# -- message-level exchange (transport-agnostic) ----------------------------

def client_first(user: str = "") -> tuple[str, dict]:
    """-> (client-first-message, state)."""
    cnonce = secrets.token_urlsafe(18)
    bare = f"n={user},r={cnonce}"
    return "n,," + bare, {"bare": bare, "cnonce": cnonce}


def client_final(password: str, state: dict,
                 server_first: str) -> tuple[str, dict]:
    """-> (client-final-message, state'); raises on nonce mismatch."""
    at = scram_attrs(server_first)
    nonce, salt = at["r"], base64.b64decode(at["s"])
    if not nonce.startswith(state["cnonce"]):
        raise ValueError("server nonce mismatch")
    salted = hashlib.pbkdf2_hmac("sha256", password.encode(), salt,
                                 int(at["i"]))
    ckey = hm(salted, b"Client Key")
    wo_proof = f"c=biws,r={nonce}"
    auth_msg = f"{state['bare']},{server_first},{wo_proof}".encode()
    proof = xor(ckey, hm(h(ckey), auth_msg))
    state = dict(state, server_key=hm(salted, b"Server Key"),
                 auth_msg=auth_msg)
    return wo_proof + ",p=" + base64.b64encode(proof).decode(), state


def client_check(state: dict, server_final: str) -> bool:
    """Verify the server signature (mutual auth)."""
    v = scram_attrs(server_final).get("v", "")
    want = hm(state["server_key"], state["auth_msg"])
    try:
        return _hmac.compare_digest(base64.b64decode(v), want)
    except ValueError:
        return False


def server_first(ver: dict, first: str) -> tuple[str, dict]:
    """-> (server-first-message, state); raises on malformed input or
    channel binding (not supported)."""
    if first.startswith(("n,,", "y,,")):
        gs2, bare = first[:3], first[3:]
    else:
        raise ValueError("channel binding not supported")
    cnonce = scram_attrs(bare).get("r")
    if not cnonce:
        raise ValueError("malformed client-first-message")
    nonce = cnonce + secrets.token_urlsafe(18)
    sf = (f"r={nonce},s={base64.b64encode(ver['salt']).decode()},"
          f"i={ver['iterations']}")
    return sf, {"gs2": gs2, "bare": bare, "nonce": nonce,
                "server_first": sf}


def server_verify(ver: dict, state: dict,
                  final: str) -> tuple[bool, str]:
    """-> (client_proof_ok, server-final-message)."""
    attrs = scram_attrs(final)
    if attrs.get("r") != state["nonce"]:
        return False, ""
    if attrs.get("c") != base64.b64encode(state["gs2"].encode()).decode():
        return False, ""
    try:
        proof = base64.b64decode(attrs.get("p", ""))
    except ValueError:
        return False, ""
    if ",p=" not in final:
        return False, ""
    without_proof = final[:final.rindex(",p=")]
    auth_msg = (f"{state['bare']},{state['server_first']},"
                f"{without_proof}").encode()
    client_sig = hm(ver["stored_key"], auth_msg)
    recovered = xor(proof, client_sig)
    ok = _hmac.compare_digest(h(recovered), ver["stored_key"])
    server_sig = base64.b64encode(hm(ver["server_key"], auth_msg)).decode()
    return ok, "v=" + server_sig
