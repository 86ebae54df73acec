"""SQL Server TDS wire protocol (minimal subset), dependency-free.

Reference: the reference's SQL Server source connects over TDS and reads
CDC change tables with plain SELECTs
(/root/reference/src/sql-server-util — client setup; cdc.rs reads
`cdc.<capture_instance>_CT`). sources/sqlserver_cdc.py already decodes
change-table FRAMES; this module adds the NETWORK layer from the public
[MS-TDS] specification, the same pattern as kafka_wire/pg_replication/
mysql_wire:

- packet framing (8-byte header), PRELOGIN (encryption declined),
  LOGIN7 (trust — LOGINACK + DONE), SQL_BATCH (UCS-2LE text) →
  token-stream response: COLMETADATA (0x81) / ROW (0xD1) / DONE (0xFD).
- types carried: BIGINTTYPE (0x7F), INTNTYPE (0x26), NVARCHARTYPE
  (0xE7), BIGVARBINTYPE (0xA5) — enough for CDC change tables
  (binary(10) LSNs, int operation codes, data columns).
- ``MiniSqlServer``: loopback server holding named relations; any
  SQL_BATCH of the form ``SELECT * FROM <name>`` streams that relation.
- ``read_sqlserver_ct``: drain ``cdc.<instance>_CT`` over the wire into
  the change-table DataFrame that changes_to_diff/apply_cdc consume.

Scale: like the reference, the change table is consumed by query — the
wire drain is a bounded read; decode and state-folding run distributed.
"""

from __future__ import annotations

import socket
import struct
import threading

PKT_SQL_BATCH, PKT_RESPONSE, PKT_LOGIN7, PKT_PRELOGIN = 0x01, 0x04, 0x10, 0x12

T_BIGINT, T_INTN, T_NVARCHAR, T_BIGVARBIN = 0x7F, 0x26, 0xE7, 0xA5
TOK_COLMETADATA, TOK_ROW, TOK_DONE, TOK_LOGINACK = 0x81, 0xD1, 0xFD, 0xAD
TOK_ERROR = 0xAA


def _ucs2(s: str) -> bytes:
    return s.encode("utf-16-le")



def _tds_password(pw: str) -> bytes:
    """LOGIN7 password obfuscation (MS-TDS 2.2.6.4): per UCS-2 byte,
    swap nibbles then XOR 0xA5. Self-inverse modulo the XOR order."""
    out = bytearray()
    for b in _ucs2(pw):
        out.append((((b & 0x0F) << 4) | ((b & 0xF0) >> 4)) ^ 0xA5)
    return bytes(out)


def _tds_password_decode(raw: bytes) -> str:
    b = bytearray()
    for x in raw:
        y = x ^ 0xA5
        b.append(((y & 0x0F) << 4) | ((y & 0xF0) >> 4))
    return bytes(b).decode("utf-16-le", "replace")


class _Framed:
    """TDS packet framing: messages may span packets; EOM bit terminates."""

    def __init__(self, sock: socket.socket, packet_size: int = 4096):
        self.sock = sock
        # negotiated packet size: messages larger than one packet are
        # split, EOM set only on the last (MS-TDS packet framing)
        self.packet_size = packet_size

    def send(self, ptype: int, payload: bytes) -> None:
        cap = self.packet_size - 8
        chunks = ([payload[i:i + cap]
                   for i in range(0, len(payload), cap)] or [b""])
        for idx, ch in enumerate(chunks):
            status = 0x01 if idx == len(chunks) - 1 else 0x00
            self.sock.sendall(struct.pack(
                ">BBHHBB", ptype, status, 8 + len(ch), 0,
                (idx % 255) + 1, 0) + ch)

    def recv(self) -> tuple[int, bytes]:
        out = bytearray()
        while True:
            hdr = self._recv_exact(8)
            ptype, status, length, _spid, _pid, _win = struct.unpack(
                ">BBHHBB", hdr)
            out += self._recv_exact(length - 8)
            if status & 0x01:  # EOM
                return ptype, bytes(out)

    def _recv_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("peer closed")
            buf += chunk
        return bytes(buf)


# --------------------------------------------------------------------------
# client
class SqlServerWireClient:
    """PRELOGIN + LOGIN7 (trust) + SQL_BATCH query client."""

    def __init__(self, host: str, port: int, *, user: str = "mz",
                 password: str | None = None,
                 database: str = "db", ssl_context=None):
        sock = socket.create_connection((host, port), timeout=10)
        if ssl_context is not None:
            # TLS listener mode (real TDS negotiates TLS inside
            # PRELOGIN; the mini peer exposes a TLS-from-connect
            # listener instead)
            sock = ssl_context.wrap_socket(sock, server_hostname=host)
        self.conn = _Framed(sock)
        # PRELOGIN: VERSION + ENCRYPTION(not supported) + TERMINATOR
        opts = [(0x00, bytes([16, 0, 0, 0, 0, 0])), (0x01, bytes([2]))]
        off = 5 * len(opts) + 1
        head, body = bytearray(), bytearray()
        for token, data in opts:
            head += struct.pack(">BHH", token, off, len(data))
            body += data
            off += len(data)
        head.append(0xFF)
        self.conn.send(PKT_PRELOGIN, bytes(head + body))
        self.conn.recv()  # prelogin response (encryption negotiated off)
        # LOGIN7: fixed header + offset/length table for the variable part
        uname = _ucs2(user)
        pw = _tds_password(password) if password else b""
        db = _ucs2(database)
        var = uname + pw + db
        fixed = struct.pack("<IIIIII", 0, 0x74000004, 4096, 7, 0, 0)
        fixed += struct.pack("<BBBB", 0, 0, 0, 0)
        fixed += struct.pack("<ii", 0, 0)  # timezone, lcid
        # 9 offset-table entries of 4 bytes each precede ClientID(6)
        # + SSPI(4); the old "4 * 2 * 9" double-counted entry width,
        # harmless only while the trust-mode peer ignored offsets
        base = 4 + len(fixed) + 4 * 9 + 6 + 4
        offtab = struct.pack("<HH", base, 0)                       # hostname
        offtab += struct.pack("<HH", base, len(uname) // 2)        # username
        offtab += struct.pack("<HH", base + len(uname),
                              len(pw) // 2)                        # password
        offtab += struct.pack("<HH", base, 0) * 4  # appname..unused
        offtab += struct.pack("<HH", base + len(uname) + len(pw),
                              len(db) // 2)
        offtab += struct.pack("<HH", base, 0)
        payload = fixed + offtab + bytes(6) + struct.pack("<I", 0) + var
        self.conn.send(PKT_LOGIN7,
                       struct.pack("<I", 4 + len(payload)) + payload)
        _ptype, resp = self.conn.recv()
        if not resp or resp[0] != TOK_LOGINACK:
            if resp and resp[0] == 0xAA:  # TOK_ERROR
                raise ValueError("login failed: access denied")
            raise ValueError(f"login rejected: {resp[:16]!r}")

    def close(self) -> None:
        try:
            self.conn.sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def query(self, sql: str) -> tuple[list[str], list[list]]:
        """SQL_BATCH → (column names, rows). Token-stream decode for the
        type subset above."""
        self.conn.send(PKT_SQL_BATCH, _ucs2(sql))
        _ptype, buf = self.conn.recv()
        pos = 0
        cols: list[tuple[str, int]] = []
        names: list[str] = []
        rows: list[list] = []
        while pos < len(buf):
            tok = buf[pos]
            pos += 1
            if tok == TOK_COLMETADATA:
                (n,) = struct.unpack_from("<H", buf, pos)
                pos += 2
                cols, names = [], []
                for _ in range(n):
                    pos += 4 + 2  # usertype u32, flags u16
                    t = buf[pos]
                    pos += 1
                    if t == T_BIGINT:
                        pass
                    elif t == T_INTN:
                        pos += 1  # max length
                    elif t == T_NVARCHAR:
                        pos += 2 + 5  # maxlen + collation
                    elif t == T_BIGVARBIN:
                        pos += 2
                    else:
                        raise ValueError(f"unsupported col type {t:#x}")
                    ln = buf[pos]
                    pos += 1
                    name = buf[pos:pos + 2 * ln].decode("utf-16-le")
                    pos += 2 * ln
                    cols.append((name, t))
                    names.append(name)
            elif tok == TOK_ROW:
                row = []
                for _name, t in cols:
                    if t == T_BIGINT:
                        (v,) = struct.unpack_from("<q", buf, pos)
                        pos += 8
                        row.append(v)
                    elif t == T_INTN:
                        ln = buf[pos]
                        pos += 1
                        if ln == 0:
                            row.append(None)
                        else:
                            row.append(int.from_bytes(
                                buf[pos:pos + ln], "little", signed=True))
                            pos += ln
                    elif t == T_NVARCHAR:
                        (ln,) = struct.unpack_from("<H", buf, pos)
                        pos += 2
                        if ln == 0xFFFF:
                            row.append(None)
                        else:
                            row.append(
                                buf[pos:pos + ln].decode("utf-16-le"))
                            pos += ln
                    elif t == T_BIGVARBIN:
                        (ln,) = struct.unpack_from("<H", buf, pos)
                        pos += 2
                        if ln == 0xFFFF:
                            row.append(None)
                        else:
                            row.append(buf[pos:pos + ln])
                            pos += ln
                rows.append(row)
            elif tok == TOK_DONE:
                pos += 12  # status u16, curcmd u16, rowcount u64
            elif tok == TOK_LOGINACK:
                (ln,) = struct.unpack_from("<H", buf, pos)
                pos += 2 + ln
            elif tok == TOK_ERROR:
                (ln,) = struct.unpack_from("<H", buf, pos)
                body = buf[pos + 2:pos + 2 + ln]
                # Number u32, State u8, Class u8, MsgText us_varchar
                (mlen,) = struct.unpack_from("<H", body, 6)
                msg = body[8:8 + 2 * mlen].decode("utf-16-le")
                raise ValueError(f"server error: {msg}")
            else:
                raise ValueError(f"unsupported token {tok:#x}")
        return names, rows


# --------------------------------------------------------------------------
# server
class MiniSqlServer:
    """Loopback TDS server over named relations.

    ``tables``: {name: (schema, rows)} where schema is a list of
    (colname, type_tag) with type_tag in {'bigint', 'int', 'nvarchar',
    'varbinary'} and rows are python tuples. Any ``SELECT ... FROM
    <name>`` batch streams the named relation (the reference's CDC
    reads are exactly such SELECTs against cdc.<instance>_CT)."""

    _TAGS = {"bigint": T_BIGINT, "int": T_INTN,
             "nvarchar": T_NVARCHAR, "varbinary": T_BIGVARBIN}

    def __init__(self, tables: dict, host: str = "127.0.0.1",
                 port: int = 0, packet_size: int = 4096, *,
                 ssl_context=None, auth: tuple[str, str] | None = None):
        self._ssl_ctx = ssl_context
        self._auth = auth  # (user, password) — LOGIN7-verified when set
        self.tables = dict(tables)
        # small packet_size forces MULTI-PACKET responses (spanning
        # token streams), exercising the client's EOM reassembly
        self.packet_size = packet_size
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
        self._serve(_Framed(sock, self.packet_size))

    def _login_ok(self, payload: bytes) -> bool:
        """Verify LOGIN7's username + obfuscated password against the
        configured credential (offset table entries 1 and 2)."""
        try:
            # offset table starts after the 4-byte length + 36-byte fixed
            tab = 4 + 36
            uoff, ulen = struct.unpack_from("<HH", payload, tab + 4)
            poff, plen = struct.unpack_from("<HH", payload, tab + 8)
            user = payload[uoff:uoff + 2 * ulen].decode("utf-16-le")
            pw = _tds_password_decode(payload[poff:poff + 2 * plen])
        except (struct.error, IndexError):
            return False
        import hmac as _hmac
        want_u, want_p = self._auth
        return (_hmac.compare_digest(user.encode(), want_u.encode())
                and _hmac.compare_digest(pw.encode(), want_p.encode()))

    def _serve(self, conn: _Framed) -> None:
        try:
            while True:
                ptype, payload = conn.recv()
                if ptype == PKT_PRELOGIN:
                    # echo VERSION + ENCRYPT_NOT_SUP
                    opts = [(0x00, bytes([16, 0, 0, 0, 0, 0])),
                            (0x01, bytes([2]))]
                    off = 5 * len(opts) + 1
                    head, body = bytearray(), bytearray()
                    for token, data in opts:
                        head += struct.pack(">BHH", token, off, len(data))
                        body += data
                        off += len(data)
                    head.append(0xFF)
                    conn.send(PKT_RESPONSE, bytes(head + body))
                elif ptype == PKT_LOGIN7:
                    if self._auth is not None and not self._login_ok(
                            payload):
                        err_body = (struct.pack("<IB", 18456, 1)
                                    + bytes([14])
                                    + struct.pack("<H", 13)
                                    + _ucs2("Login failed."))
                        err = (bytes([0xAA])
                               + struct.pack("<H", len(err_body))
                               + err_body)
                        done = bytes([TOK_DONE]) + struct.pack(
                            "<HHQ", 0, 0, 0)
                        conn.send(PKT_RESPONSE, err + done)
                        return
                    ack_body = (bytes([1])
                                + struct.pack("<I", 0x74000004)
                                + bytes([10]) + _ucs2("mini-tds.."))
                    ack_body += struct.pack("<I", 0x10000000)
                    ack = (bytes([TOK_LOGINACK])
                           + struct.pack("<H", len(ack_body)) + ack_body)
                    done = bytes([TOK_DONE]) + struct.pack("<HHQ", 0, 0, 0)
                    conn.send(PKT_RESPONSE, ack + done)
                elif ptype == PKT_SQL_BATCH:
                    sql = payload.decode("utf-16-le", "ignore")
                    conn.send(PKT_RESPONSE, self._run(sql))
                else:
                    return
        except (ConnectionError, OSError):
            pass
        finally:
            try:
                conn.sock.close()
            except OSError:
                pass

    def _run(self, sql: str) -> bytes:
        import re
        m = re.search(r"FROM\s+([\w.\[\]$]+)", sql, re.I)
        name = m.group(1).strip("[]") if m else ""
        rel = self.tables.get(name)
        if rel is None:
            msg = _ucs2(f"invalid object name {name!r}")
            body = (struct.pack("<IBB", 208, 1, 16)
                    + struct.pack("<H", len(msg) // 2) + msg
                    + bytes([0]) + struct.pack("<H", 0) + bytes([0, 0, 0, 0]))
            return (bytes([TOK_ERROR]) + struct.pack("<H", len(body))
                    + body + bytes([TOK_DONE])
                    + struct.pack("<HHQ", 0x0002, 0, 0))
        schema, rows = rel
        out = bytearray([TOK_COLMETADATA])
        out += struct.pack("<H", len(schema))
        for cname, tag in schema:
            t = self._TAGS[tag]
            out += struct.pack("<IH", 0, 0x0009)  # usertype, flags
            out += bytes([t])
            if t == T_INTN:
                out += bytes([4])
            elif t == T_NVARCHAR:
                out += struct.pack("<H", 8000) + bytes(5)
            elif t == T_BIGVARBIN:
                out += struct.pack("<H", 8000)
            raw = _ucs2(cname)
            out += bytes([len(raw) // 2]) + raw
        for row in rows:
            out += bytes([TOK_ROW])
            for (cname, tag), v in zip(schema, row):
                t = self._TAGS[tag]
                if t == T_BIGINT:
                    out += struct.pack("<q", int(v))
                elif t == T_INTN:
                    if v is None:
                        out += bytes([0])
                    else:
                        out += bytes([4]) + int(v).to_bytes(
                            4, "little", signed=True)
                elif t == T_NVARCHAR:
                    if v is None:
                        out += struct.pack("<H", 0xFFFF)
                    else:
                        raw = _ucs2(str(v))
                        out += struct.pack("<H", len(raw)) + raw
                elif t == T_BIGVARBIN:
                    if v is None:
                        out += struct.pack("<H", 0xFFFF)
                    else:
                        raw = bytes(v)
                        out += struct.pack("<H", len(raw)) + raw
        out += bytes([TOK_DONE]) + struct.pack("<HHQ", 0x0010, 0xC1,
                                               len(rows))
        return bytes(out)


# --------------------------------------------------------------------------
def read_sqlserver_ct(spark, host: str, port: int, instance: str,
                      ssl_conf: dict | None = None, *,
                      user: str = "mz", password: str | None = None):
    """Drain ``cdc.<instance>_CT`` over TDS → the change-table DataFrame
    (``__$start_lsn``, ``__$seqval``, ``__$operation``, data columns)
    that sqlserver_cdc.changes_to_diff consumes."""
    from materialize_spark.sources.tlsconf import client_context
    with SqlServerWireClient(host, port, user=user, password=password,
                             ssl_context=client_context(ssl_conf)) as c:
        names, rows = c.query(
            f"SELECT * FROM cdc.{instance}_CT ORDER BY __$start_lsn")
    fields = []
    for i, n in enumerate(names):
        sample = next((r[i] for r in rows if r[i] is not None), None)
        if isinstance(sample, (bytes, bytearray)):
            t = "binary"
        elif n == "__$operation" or isinstance(sample, int) and not \
                isinstance(sample, bool):
            t = "long" if n not in ("__$operation",) else "int"
        else:
            t = "string"
        fields.append(f"`{n}` {t}")
    norm = [tuple(bytearray(v) if isinstance(v, bytes) else v for v in r)
            for r in rows]
    return spark.createDataFrame(norm, ", ".join(fields))
