"""pgwire server front-end: serve MzSession over the PG wire protocol.

Reference: the reference speaks the PostgreSQL wire protocol to clients
(/root/reference/src/pgwire/src/protocol.rs — startup, simple query,
RowDescription/DataRow/CommandComplete, ErrorResponse), which is how
psql/BI tools connect. This module implements the SIMPLE query protocol
(protocol 3.0) from the public spec (postgresql.org/docs/current/
protocol-flow.html) over :class:`MzSession`:

- startup (SSLRequest politely declined with 'N', trust auth),
  ParameterStatus (server_version etc.), BackendKeyData, ReadyForQuery;
- 'Q' simple query: statements split token-aware, executed through the
  full engine surface (DDL, DML, SELECT/peek, SHOW, SUBSCRIBE, RBAC —
  everything MzSession.execute handles); result relations render as
  RowDescription (type OIDs from the Spark schema) + text-format
  DataRows + CommandComplete; DDL returns its command tag;
- errors → ErrorResponse with the Python message, then ReadyForQuery
  (the session survives, like a real server);
- the extended protocol (Parse/Bind/Execute) is declined with a clear
  error — PREPARE/EXECUTE are available as SQL statements instead.

A matching minimal client (``PgWireClient``) is included for tests and
tooling, reusing the same public protocol (it is NOT needed to talk to
the server — any PG simple-protocol client works).

Scale note: the server is a serving-layer veneer — each query executes
through exactly the same Spark plans as the Python API; rendering
streams the collected result (peeks are the reference's serving path
too, coord/peek.rs).
"""

from __future__ import annotations

import socket
import struct
import threading

from materialize_spark.plans.sqlfront import MzSession

# Spark simpleString -> PG type OID (text format); default 25 (text)
_OIDS = {
    "boolean": 16, "bigint": 20, "smallint": 21, "int": 23,
    "string": 25, "float": 700, "double": 701, "date": 1082,
    "timestamp": 1114, "timestamp_ntz": 1114, "binary": 17,
}


def _cstr(s: str) -> bytes:
    return s.encode() + b"\0"


def _render(v) -> bytes | None:
    """Text-format cell rendering (PG conventions)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return b"t" if v else b"f"
    if isinstance(v, (bytes, bytearray)):
        return b"\\x" + bytes(v).hex().encode()
    return str(v).encode()


class MzPgServer:
    """Threaded pgwire server over one MzSession (session state —
    catalog, roles, variables — is shared across connections, like one
    environment in the reference)."""

    def __init__(self, session: MzSession, host: str = "127.0.0.1",
                 port: int = 0):
        self.session = session
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(16)
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

    # -- wire ----------------------------------------------------------------
    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,),
                             daemon=True).start()

    @staticmethod
    def _recv_exact(conn: socket.socket, n: int) -> bytes | None:
        buf = bytearray()
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return bytes(buf)

    @staticmethod
    def _msg(tag: bytes, payload: bytes = b"") -> bytes:
        return tag + struct.pack(">i", 4 + len(payload)) + payload

    def _serve(self, conn: socket.socket) -> None:
        try:
            while True:  # startup may retry after SSLRequest
                raw = self._recv_exact(conn, 4)
                if raw is None:
                    return
                (size,) = struct.unpack(">i", raw)
                body = self._recv_exact(conn, size - 4)
                if body is None:
                    return
                (code,) = struct.unpack_from(">i", body, 0)
                if code in (80877103, 80877104):  # SSL/GSSENC request
                    conn.sendall(b"N")
                    continue
                if code != 196608:
                    conn.sendall(self._msg(
                        b"E", b"SFATAL\0C0A000\0"
                              b"Munsupported protocol version\0\0"))
                    return
                break
            conn.sendall(self._msg(b"R", struct.pack(">i", 0)))  # AuthOk
            for k, v in (("server_version", "9.5.0"),
                         ("client_encoding", "UTF8"),
                         ("DateStyle", "ISO, MDY"),
                         ("TimeZone", "UTC"),
                         ("integer_datetimes", "on")):
                conn.sendall(self._msg(b"S", _cstr(k) + _cstr(v)))
            conn.sendall(self._msg(b"K", struct.pack(">ii", 1, 1)))
            conn.sendall(self._msg(b"Z", b"I"))
            while True:
                tag = self._recv_exact(conn, 1)
                if tag is None:
                    return
                (sz,) = struct.unpack(">i", self._recv_exact(conn, 4))
                payload = self._recv_exact(conn, sz - 4)
                if tag == b"X":
                    return
                if tag == b"Q":
                    self._simple_query(conn, payload.rstrip(b"\0").decode())
                elif tag in (b"P", b"B", b"E", b"D", b"C", b"S"):
                    conn.sendall(self._msg(
                        b"E", b"SERROR\0C0A000\0Mextended protocol not "
                              b"supported; use simple queries (PREPARE/"
                              b"EXECUTE are available as SQL)\0\0"))
                    conn.sendall(self._msg(b"Z", b"I"))
        except (ConnectionError, OSError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _simple_query(self, conn: socket.socket, sql: str) -> None:
        from materialize_spark.plans.lexer import split_statements
        try:
            stmts = split_statements(sql)
        except Exception as ex:
            self._send_error(conn, str(ex))
            conn.sendall(self._msg(b"Z", b"I"))
            return
        if not stmts:
            conn.sendall(self._msg(b"I"))  # EmptyQueryResponse
            conn.sendall(self._msg(b"Z", b"I"))
            return
        for stmt in stmts:
            try:
                out = self.session.execute(stmt)
            except Exception as ex:
                self._send_error(conn, str(ex))
                break
            if out is None:
                head = stmt.lstrip().split(None, 2)
                tag = " ".join(head[:2]).upper() if head else "OK"
                conn.sendall(self._msg(b"C", _cstr(tag)))
                continue
            fields = out.schema.fields
            desc = struct.pack(">h", len(fields))
            for f in fields:
                simple = f.dataType.simpleString()
                oid = _OIDS.get(
                    "decimal" if simple.startswith("decimal") else simple,
                    25)
                oid = 1700 if simple.startswith("decimal") else oid
                desc += (_cstr(f.name)
                         + struct.pack(">ihihih", 0, 0, oid, -1, -1, 0))
            conn.sendall(self._msg(b"T", desc))
            n = 0
            for row in out.collect():
                cells = struct.pack(">h", len(fields))
                for v in row:
                    r = _render(v)
                    if r is None:
                        cells += struct.pack(">i", -1)
                    else:
                        cells += struct.pack(">i", len(r)) + r
                conn.sendall(self._msg(b"D", cells))
                n += 1
            conn.sendall(self._msg(b"C", _cstr(f"SELECT {n}")))
        conn.sendall(self._msg(b"Z", b"I"))

    def _send_error(self, conn: socket.socket, message: str) -> None:
        payload = (b"SERROR\0CXX000\0M"
                   + message.encode("utf-8", "replace") + b"\0\0")
        conn.sendall(self._msg(b"E", payload))


# --------------------------------------------------------------------------
# minimal simple-protocol client (tests/tooling; any PG client also works)
class PgWireClient:
    def __init__(self, host: str, port: int, *, user: str = "materialize",
                 database: str = "materialize"):
        self.sock = socket.create_connection((host, port), timeout=10)
        params = (_cstr("user") + _cstr(user)
                  + _cstr("database") + _cstr(database) + b"\0")
        self.sock.sendall(struct.pack(">ii", 8 + len(params), 196608)
                          + params)
        self.parameters: dict[str, str] = {}
        while True:
            tag, payload = self._recv_msg()
            if tag == b"R":
                (code,) = struct.unpack_from(">i", payload, 0)
                if code != 0:
                    raise ValueError(f"unsupported auth {code}")
            elif tag == b"S":
                k, _, v = payload.rstrip(b"\0").partition(b"\0")
                self.parameters[k.decode()] = v.decode()
            elif tag == b"E":
                raise ValueError(f"startup error: {payload!r}")
            elif tag == b"Z":
                break

    def close(self) -> None:
        try:
            self.sock.sendall(b"X" + struct.pack(">i", 4))
        except OSError:
            pass
        try:
            self.sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _recv_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("server closed connection")
            buf += chunk
        return bytes(buf)

    def _recv_msg(self) -> tuple[bytes, bytes]:
        tag = self._recv_exact(1)
        (size,) = struct.unpack(">i", self._recv_exact(4))
        return tag, self._recv_exact(size - 4)

    def query(self, sql: str) -> list[dict]:
        """Run a simple query; returns one result-set dict per statement:
        {"columns": [(name, oid)], "rows": [[str|None]], "tag": str} —
        raises on the first ErrorResponse."""
        body = _cstr(sql)
        self.sock.sendall(b"Q" + struct.pack(">i", 4 + len(body)) + body)
        results: list[dict] = []
        cur: dict | None = None
        err: str | None = None
        while True:
            tag, payload = self._recv_msg()
            if tag == b"T":
                (n,) = struct.unpack_from(">h", payload, 0)
                pos = 2
                cols = []
                for _ in range(n):
                    end = payload.index(0, pos)
                    name = payload[pos:end].decode()
                    pos = end + 1
                    _tbl, _att, oid, _sz, _mod, _fmt = struct.unpack_from(
                        ">ihihih", payload, pos)
                    pos += 18
                    cols.append((name, oid))
                cur = {"columns": cols, "rows": [], "tag": ""}
            elif tag == b"D":
                assert cur is not None
                (n,) = struct.unpack_from(">h", payload, 0)
                pos = 2
                row = []
                for _ in range(n):
                    (ln,) = struct.unpack_from(">i", payload, pos)
                    pos += 4
                    if ln < 0:
                        row.append(None)
                    else:
                        row.append(payload[pos:pos + ln].decode())
                        pos += ln
                cur["rows"].append(row)
            elif tag == b"C":
                tag_s = payload.rstrip(b"\0").decode()
                if cur is None:
                    cur = {"columns": [], "rows": [], "tag": tag_s}
                else:
                    cur["tag"] = tag_s
                results.append(cur)
                cur = None
            elif tag == b"E":
                fields = payload.split(b"\0")
                msg = next((f[1:].decode() for f in fields
                            if f.startswith(b"M")), "unknown error")
                err = msg
            elif tag == b"I":  # EmptyQueryResponse
                pass
            elif tag == b"Z":
                if err is not None:
                    raise ValueError(err)
                return results
