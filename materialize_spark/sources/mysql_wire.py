"""MySQL client/server wire protocol for binlog streaming, dependency-free.

Reference: the reference's MySQL source connects as a replica and issues
COM_BINLOG_DUMP, consuming the event stream that
sources/mysql_binlog.py already decodes from the public event format
(/root/reference/src/storage/src/source/mysql/replication.rs drives the
dump; events.rs decodes). This module adds the NETWORK layer from the
public protocol (dev.mysql.com/doc/dev/mysql-server → client/server
protocol): 3-byte little-endian packet framing, initial handshake,
handshake response 41, COM_BINLOG_DUMP (0x12) with the NON_BLOCK flag
(bounded catch-up → EOF), each event packet = 0x00 OK byte + raw event.

- ``MySQLBinlogClient``: handshake + dump request + event drain.
- ``MiniMySQL``: loopback server replaying a canned binlog (encode
  events with mysql_binlog.encode_* / with_crc32).
- ``read_mysql_binlog``: wire drain → (pos, event) DataFrame for
  decode_binlog_stream → binlog_to_diff → apply_cdc, all distributed.
"""

from __future__ import annotations

import socket
import struct
import threading

CLIENT_PROTOCOL_41 = 0x00000200
BINLOG_DUMP_NON_BLOCK = 0x01
COM_BINLOG_DUMP = 0x12



def _native_password_token(password: str, scramble: bytes) -> bytes:
    """mysql_native_password proof (public algorithm, MySQL internals
    manual "Secure Password Authentication"):
    SHA1(pw) XOR SHA1(scramble + SHA1(SHA1(pw)))."""
    import hashlib
    s1 = hashlib.sha1(password.encode()).digest()
    s2 = hashlib.sha1(s1).digest()
    mix = hashlib.sha1(scramble + s2).digest()
    return bytes(a ^ b for a, b in zip(s1, mix))


def _native_password_check(token: bytes, scramble: bytes,
                           stored2: bytes) -> bool:
    """Server side: stored2 = SHA1(SHA1(pw)) (what mysql.user holds);
    recover SHA1(pw) from the proof and re-hash."""
    import hashlib
    import hmac as _hmac
    if len(token) != 20:
        return False
    mix = hashlib.sha1(scramble + stored2).digest()
    s1 = bytes(a ^ b for a, b in zip(token, mix))
    return _hmac.compare_digest(hashlib.sha1(s1).digest(), stored2)


class _Conn:
    def __init__(self, sock: socket.socket):
        self.sock = sock
        self.seq = 0

    def read_packet(self) -> bytes:
        hdr = self._recv(4)
        size = int.from_bytes(hdr[:3], "little")
        self.seq = hdr[3] + 1
        return self._recv(size)

    def send_packet(self, payload: bytes) -> None:
        self.sock.sendall(len(payload).to_bytes(3, "little")
                          + bytes([self.seq % 256]) + payload)
        self.seq += 1

    def _recv(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("peer closed")
            buf += chunk
        return bytes(buf)


class MySQLBinlogClient:
    """Replica-side client: handshake then COM_BINLOG_DUMP drain."""

    def __init__(self, host: str, port: int, *, user: str = "repl",
                 password: str | None = None, server_id: int = 4242,
                 ssl_context=None, dialer=None):
        self.server_id = server_id
        # dialer(host, port) -> socket-like: the SSH TUNNEL path
        # (sources/ssh_tunnel.py) forwards the replica wire through a
        # direct-tcpip channel
        if dialer is not None:
            if ssl_context is not None:
                raise NotImplementedError(
                    "TLS over an SSH tunnel is redundant and not "
                    "supported: the tunnel already encrypts the hop")
            sock = dialer(host, port)
        else:
            sock = socket.create_connection((host, port), timeout=10)
        if ssl_context is not None:
            # TLS listener mode (a real server upgrades via the in-
            # protocol SSLRequest after the greeting; the mini peer
            # exposes a TLS-from-connect listener instead)
            sock = ssl_context.wrap_socket(sock, server_hostname=host)
        self.conn = _Conn(sock)
        greet = self.conn.read_packet()
        if greet[0] == 0xFF:
            raise ValueError(f"server error on connect: {greet!r}")
        nul = greet.index(0, 1)
        self.server_version = greet[1:nul].decode()
        # protocol-10 greeting: thread id u32, auth-data part 1 (8) NUL,
        # caps u16, charset u8, status u16, caps u16, auth len u8,
        # 10 reserved, auth-data part 2 (12) NUL
        p1 = greet[nul + 5:nul + 13]
        p2_off = nul + 13 + 1 + 2 + 1 + 2 + 2 + 1 + 10
        p2 = greet[p2_off:p2_off + 12]
        scramble = p1 + p2
        if password is not None:
            token = _native_password_token(password, scramble)
            auth = bytes([len(token)]) + token
        else:
            auth = bytes([0])  # trust
        resp = (struct.pack("<IIB", CLIENT_PROTOCOL_41, 1 << 24, 33)
                + bytes(23) + user.encode() + b"\0" + auth)
        self.conn.send_packet(resp)
        ok = self.conn.read_packet()
        if ok[0:1] != b"\x00":
            raise ValueError(f"authentication failed: {ok[1:][:60]!r}")

    def close(self) -> None:
        try:
            self.conn.sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def binlog_dump(self, filename: str = "", pos: int = 4,
                    ) -> list[tuple[int, bytes]]:
        """COM_BINLOG_DUMP (non-blocking) → [(log_pos, event_bytes)].
        log_pos comes from each event's own header, the stream's
        progress frontier (replication.rs tracks the same)."""
        self.conn.seq = 0
        req = (bytes([COM_BINLOG_DUMP])
               + struct.pack("<IHI", pos, BINLOG_DUMP_NON_BLOCK,
                             self.server_id)
               + filename.encode())
        self.conn.send_packet(req)
        out: list[tuple[int, bytes]] = []
        while True:
            pkt = self.conn.read_packet()
            first = pkt[0]
            if first == 0xFE and len(pkt) < 9:  # EOF: caught up
                return out
            if first == 0xFF:
                raise ValueError(f"dump error: {pkt[1:]!r}")
            if first != 0x00:
                raise ValueError(f"unexpected packet lead {first:#x}")
            event = pkt[1:]
            (log_pos,) = struct.unpack_from("<I", event, 13)
            out.append((log_pos, event))


class MiniMySQL:
    """Loopback server: trust handshake + canned binlog replay.

    ``events``: raw event byte strings in stream order (include a
    FORMAT_DESCRIPTION first and with_crc32-wrapped events to exercise
    the checksum path end-to-end)."""

    def __init__(self, events: list[bytes], host: str = "127.0.0.1",
                 port: int = 0, checksum: str = "crc32", *,
                 ssl_context=None, auth: tuple[str, str] | None = None):
        self._ssl_ctx = ssl_context
        # mysql_native_password mode: only SHA1(SHA1(pw)) is stored,
        # like mysql.user (auth = (user, password))
        self._auth_user = auth[0] if auth else None
        if auth:
            import hashlib
            self._auth_stored2 = hashlib.sha1(
                hashlib.sha1(auth[1].encode()).digest()).digest()
        self.events = list(events)
        self.checksum = checksum
        self.dump_requests: list[tuple[str, int]] = []
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(8)
        self.host, self.port = self._srv.getsockname()
        self._stop = threading.Event()
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def close(self) -> None:
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve_raw, args=(conn,),
                             daemon=True).start()

    def _serve_raw(self, sock: socket.socket) -> None:
        if self._ssl_ctx is not None:
            try:
                sock = self._ssl_ctx.wrap_socket(sock, server_side=True)
            except (OSError, ValueError):
                return
        self._serve(_Conn(sock))

    def _serve(self, conn: _Conn) -> None:
        try:
            # initial handshake: protocol 10, version, thread id,
            # auth-data part 1 (8) + NUL, caps, charset, status, caps,
            # auth len, 10 reserved, auth-data part 2 (12) + NUL
            import secrets as _secrets
            scramble = _secrets.token_bytes(20)
            greet = (bytes([10]) + b"8.0.36-mini\0"
                     + struct.pack("<I", 7) + scramble[:8] + b"\0"
                     + struct.pack("<HBH", CLIENT_PROTOCOL_41 & 0xFFFF, 33,
                                   2)
                     + struct.pack("<H", 0) + bytes([21]) + bytes(10)
                     + scramble[8:] + b"\0")
            conn.send_packet(greet)
            resp = conn.read_packet()  # handshake response
            if self._auth_user is not None:
                # caps u32, max_packet u32, charset u8, 23 zero, user NUL,
                # auth-len u8, token
                unul = resp.index(0, 32)
                user = resp[32:unul].decode()
                alen = resp[unul + 1] if unul + 1 < len(resp) else 0
                token = resp[unul + 2:unul + 2 + alen]
                if user != self._auth_user or not _native_password_check(
                        token, scramble, self._auth_stored2):
                    conn.send_packet(
                        b"\xff" + struct.pack("<H", 1045)
                        + b"#28000Access denied")
                    return
            conn.send_packet(b"\x00\x00\x00\x02\x00\x00\x00")  # OK
            while True:
                cmd = conn.read_packet()
                if not cmd:
                    return
                if cmd[0] == COM_BINLOG_DUMP:
                    pos, _flags, _sid = struct.unpack_from("<IHI", cmd, 1)
                    fname = cmd[11:].decode()
                    self.dump_requests.append((fname, pos))
                    conn.seq = 1
                    running = 4
                    for ev in self.events:
                        # rewrite header log_pos to the running stream
                        # position (real servers do the same bookkeeping:
                        # the checksum covers the FINAL header, so the
                        # CRC32 trailer is recomputed after patching)
                        running += len(ev)
                        patched = (ev[:13]
                                   + struct.pack("<I", running) + ev[17:])
                        if self.checksum == "crc32":
                            import zlib
                            patched = patched[:-4] + struct.pack(
                                "<I", zlib.crc32(patched[:-4]) & 0xFFFFFFFF)
                        if running > pos:
                            conn.send_packet(b"\x00" + patched)
                    conn.send_packet(b"\xfe\x00\x00\x02\x00")  # EOF
                elif cmd[0] == 0x01:  # COM_QUIT
                    return
                else:
                    conn.seq = 1
                    conn.send_packet(b"\xff\x15\x04unsupported")
        except (ConnectionError, OSError):
            pass
        finally:
            try:
                conn.sock.close()
            except OSError:
                pass


def read_mysql_binlog(spark, host: str, port: int, *,
                      filename: str = "", pos: int = 4,
                      user: str = "repl", password: str | None = None,
                      ssl_conf: dict | None = None, dialer=None):
    """Wire drain → (pos, event) DataFrame for decode_binlog_stream."""
    from materialize_spark.sources.tlsconf import client_context
    with MySQLBinlogClient(host, port, user=user, password=password,
                           ssl_context=client_context(ssl_conf),
                           dialer=dialer) as c:
        events = c.binlog_dump(filename, pos)
    return spark.createDataFrame(
        [(p, bytearray(e)) for p, e in events],
        "pos long, event binary")
