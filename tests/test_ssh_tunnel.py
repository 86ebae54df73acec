"""SSH-2 tunnel transport (sources/ssh_tunnel.py): RFC 4253 kex +
encryption + integrity, RFC 4252 password auth, RFC 4254 direct-tcpip
forwarding — the CREATE CONNECTION ... TO SSH TUNNEL substrate."""

import os
import socket
import threading

import pytest

from materialize_spark.sources.ssh_tunnel import (
    SshTunnelClient, SshTunnelServer, tunnel_dialer,
)


@pytest.fixture()
def echo_server():
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)

    def accept_loop():
        while True:
            try:
                c, _ = srv.accept()
            except OSError:
                return

            def handle(c=c):
                while True:
                    d = c.recv(65536)
                    if not d:
                        break
                    c.sendall(d)
                c.close()
            threading.Thread(target=handle, daemon=True).start()
    threading.Thread(target=accept_loop, daemon=True).start()
    yield srv.getsockname()
    srv.close()


def test_forward_roundtrip_large_payload(echo_server):
    """300 kB through kex->auth->direct-tcpip and back, bit-exact —
    exercising packet chunking (max packet 32 kB) both directions."""
    host, port = echo_server
    with SshTunnelServer({"mz": "pw"}) as srv:
        cli = SshTunnelClient(srv.host, srv.port, user="mz",
                              password="pw",
                              host_key=srv.host_public_key)
        ch = cli.open_direct_tcpip(host, port)
        payload = os.urandom(300_000)
        ch.sendall(payload)
        got = b""
        while len(got) < len(payload):
            got += ch.recv(65536)
        assert got == payload
        ch.close()
        cli.close()


def test_wrong_password_rejected():
    with SshTunnelServer({"mz": "pw"}) as srv:
        with pytest.raises(PermissionError):
            SshTunnelClient(srv.host, srv.port, user="mz",
                            password="nope")


def test_host_key_pinning_detects_mitm():
    """A pinned host key that does not match the server's ed25519 key
    aborts BEFORE auth — the known_hosts defense."""
    with SshTunnelServer({"mz": "pw"}) as srv:
        with pytest.raises(ConnectionError, match="host key mismatch"):
            SshTunnelClient(srv.host, srv.port, user="mz",
                            password="pw", host_key=b"\x00" * 32)


def test_forward_allowlist_enforced(echo_server):
    """The server's allow-set rejects channels to other destinations
    (administratively prohibited), like sshd's permitopen."""
    host, port = echo_server
    with SshTunnelServer({"mz": "pw"},
                         allow={(host, port)}) as srv:
        cli = SshTunnelClient(srv.host, srv.port, user="mz",
                              password="pw")
        ch = cli.open_direct_tcpip(host, port)  # allowed
        ch.sendall(b"ping")
        assert ch.recv(4) == b"ping"
        with pytest.raises(ConnectionError,
                           match="administratively prohibited"):
            cli.open_direct_tcpip("127.0.0.1", 1)
        cli.close()


def test_two_channels_one_transport(echo_server):
    """Two concurrent direct-tcpip channels multiplex one transport."""
    host, port = echo_server
    with SshTunnelServer({"mz": "pw"}) as srv:
        cli = SshTunnelClient(srv.host, srv.port, user="mz",
                              password="pw")
        a = cli.open_direct_tcpip(host, port)
        b = cli.open_direct_tcpip(host, port)
        a.sendall(b"aaaa")
        b.sendall(b"bbbb")
        assert b.recv(4) == b"bbbb"
        assert a.recv(4) == b"aaaa"
        cli.close()


def test_tunnel_dialer_conf(echo_server):
    host, port = echo_server
    with SshTunnelServer({"u": "s3cret"}) as srv:
        dial = tunnel_dialer({"host": srv.host, "port": srv.port,
                              "user": "u", "password": "s3cret"})
        ch = dial(host, port)
        ch.sendall(b"via-conf")
        assert ch.recv(8) == b"via-conf"
        ch.close()
