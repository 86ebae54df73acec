"""MySQL binlog row-event CDC decode, without a MySQL client library.

Reference: the reference's MySQL source tails the binlog and turns
WRITE/UPDATE/DELETE_ROWS events into (row, diff) updates — each row a
(before, after) pair; table identity from the preceding TABLE_MAP event;
column names resolved out-of-band from information_schema because the
binlog itself does not carry them unless full row metadata is enabled
(/root/reference/src/storage/src/source/mysql/replication/events.rs:
311-360 and schemas.rs). This module implements that decode Spark-first
from the PUBLIC binlog event format (dev.mysql.com/doc/dev/mysql-server
→ binary log formats; v4 event header + ROWS_EVENT v2), the same split
as sources/pgoutput.py:

- TABLE_MAP events are METADATA: tiny, one per table per binlog section,
  harvested driver-side (K-row collect) and broadcast into the decode.
- ROWS events are DATA: decoded in Arrow-batched mapInPandas. Values are
  native binary (not text like pgoutput), decoded per the TABLE_MAP's
  column-type array + per-type metadata, emitted as JSON and projected
  to typed columns JVM-side via from_json(struct).

Column-type subset (the common CDC shapes): TINY, SHORT, INT24, LONG,
LONGLONG, FLOAT, DOUBLE, VARCHAR/VAR_STRING, BLOB. Signedness is not in
the binlog (it lives in the table DDL), so integers decode signed — the
reference reads the same fact from information_schema; callers with
unsigned columns adjust in the typed schema.

Event framing: v4 header (timestamp u32, type u8, server_id u32,
event_size u32, log_pos u32, flags u16 — all LE), no CRC32 trailer
(checksum NONE, as a FORMAT_DESCRIPTION with checksum off declares).
Encoders for TABLE_MAP and ROWS events are included for tests/emulation
(no MySQL server in the sandbox).
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

# event types (v4)
FORMAT_DESCRIPTION_EVENT = 15
TABLE_MAP_EVENT = 19
WRITE_ROWS_V2 = 30
UPDATE_ROWS_V2 = 31
DELETE_ROWS_V2 = 32

# binlog_checksum algorithms (FORMAT_DESCRIPTION trailer byte)
CHECKSUM_NONE, CHECKSUM_CRC32 = 0, 1
# key under which the stream's checksum mode rides in the table_maps
# dict (table ids are ints, so a string key cannot collide)
_CHECKSUM_KEY = "checksum"

# column types
T_TINY, T_SHORT, T_LONG, T_FLOAT, T_DOUBLE = 1, 2, 3, 4, 5
T_LONGLONG, T_INT24 = 8, 9
T_VARCHAR, T_BLOB, T_VAR_STRING = 15, 252, 253

_FIXED = {T_TINY: 1, T_SHORT: 2, T_INT24: 3, T_LONG: 4,
          T_LONGLONG: 8, T_FLOAT: 4, T_DOUBLE: 8}


# --------------------------------------------------------------------------
# wire-level helpers
def _lenenc(buf: bytes, pos: int) -> tuple[int, int]:
    """MySQL length-encoded integer."""
    b = buf[pos]
    if b < 0xFB:
        return b, pos + 1
    if b == 0xFC:
        return struct.unpack_from("<H", buf, pos + 1)[0], pos + 3
    if b == 0xFD:
        return int.from_bytes(buf[pos + 1:pos + 4], "little"), pos + 4
    return struct.unpack_from("<Q", buf, pos + 1)[0], pos + 9


def _lenenc_bytes(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n <= 0xFFFF:
        return b"\xfc" + struct.pack("<H", n)
    if n <= 0xFFFFFF:
        return b"\xfd" + n.to_bytes(3, "little")
    return b"\xfe" + struct.pack("<Q", n)


def _signed(raw: bytes) -> int:
    return int.from_bytes(raw, "little", signed=True)


def parse_header(buf: bytes) -> dict:
    ts, etype, server_id, size, log_pos, flags = struct.unpack_from(
        "<IBIIIH", buf, 0)
    return {"timestamp": ts, "type": etype, "server_id": server_id,
            "event_size": size, "log_pos": log_pos, "flags": flags}


def parse_table_map(buf: bytes) -> dict:
    """TABLE_MAP: table_id u48, flags u16; schema len u8 + name + NUL;
    table len u8 + name + NUL; col count lenenc; col types; metadata
    block (lenenc length); null-allowed bitmap."""
    pos = 19
    table_id = int.from_bytes(buf[pos:pos + 6], "little"); pos += 6
    pos += 2  # flags
    slen = buf[pos]; pos += 1
    schema = buf[pos:pos + slen].decode(); pos += slen + 1
    tlen = buf[pos]; pos += 1
    table = buf[pos:pos + tlen].decode(); pos += tlen + 1
    ncols, pos = _lenenc(buf, pos)
    col_types = list(buf[pos:pos + ncols]); pos += ncols
    meta_len, pos = _lenenc(buf, pos)
    meta_raw = buf[pos:pos + meta_len]; pos += meta_len
    metadata: list[int] = []
    mp = 0
    for t in col_types:
        if t in (T_VARCHAR, T_VAR_STRING):
            metadata.append(struct.unpack_from("<H", meta_raw, mp)[0])
            mp += 2
        elif t in (T_FLOAT, T_DOUBLE, T_BLOB):
            metadata.append(meta_raw[mp]); mp += 1
        else:
            metadata.append(0)
    return {"table_id": table_id, "schema": schema, "table": table,
            "column_types": col_types, "metadata": metadata}


def _read_value(buf: bytes, pos: int, ctype: int, meta: int):
    if ctype in _FIXED and ctype not in (T_FLOAT, T_DOUBLE):
        n = _FIXED[ctype]
        return _signed(buf[pos:pos + n]), pos + n
    if ctype == T_FLOAT:
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if ctype == T_DOUBLE:
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ctype in (T_VARCHAR, T_VAR_STRING):
        if meta < 256:
            ln = buf[pos]; pos += 1
        else:
            ln = struct.unpack_from("<H", buf, pos)[0]; pos += 2
        return buf[pos:pos + ln].decode("utf-8"), pos + ln
    if ctype == T_BLOB:
        ln = int.from_bytes(buf[pos:pos + meta], "little"); pos += meta
        return buf[pos:pos + ln].hex(), pos + ln
    raise ValueError(f"unsupported column type {ctype}")


def _read_row(buf: bytes, pos: int, tme: dict, present: list[bool],
              ) -> tuple[list, int]:
    n_present = sum(present)
    null_bits = buf[pos:pos + (n_present + 7) // 8]
    pos += (n_present + 7) // 8
    vals: list = []
    vi = 0
    for i, (ctype, meta) in enumerate(
            zip(tme["column_types"], tme["metadata"])):
        if not present[i]:
            vals.append(None)
            continue
        if null_bits[vi // 8] & (1 << (vi % 8)):
            vals.append(None)
        else:
            v, pos = _read_value(buf, pos, ctype, meta)
            vals.append(v)
        vi += 1
    return vals, pos


def parse_format_description(buf: bytes) -> dict:
    """FORMAT_DESCRIPTION: binlog_version u16, server_version 50 bytes,
    create_ts u32, header_len u8, post-header length array, then (since
    5.6.1) a 1-byte checksum algorithm + the event's own CRC32. The
    algorithm byte sits at event_size - 5 — it declares the checksum
    mode for EVERY following event (real servers default to CRC32)."""
    hdr = parse_header(buf)
    (binlog_version,) = struct.unpack_from("<H", buf, 19)
    server_version = buf[21:71].split(b"\0", 1)[0].decode()
    alg = buf[hdr["event_size"] - 5]
    return {"binlog_version": binlog_version,
            "server_version": server_version,
            "checksum": "crc32" if alg == CHECKSUM_CRC32 else "none"}


def _event_end(buf: bytes, table_maps: dict) -> int:
    """Body end: trim (and verify) the 4-byte CRC32 trailer when the
    FORMAT_DESCRIPTION declared binlog_checksum=CRC32. Real MySQL
    servers default to CRC32 since 5.6 — decoding the trailer as row
    data would silently misparse."""
    if table_maps.get(_CHECKSUM_KEY) != "crc32":
        return len(buf)
    (want,) = struct.unpack_from("<I", buf, len(buf) - 4)
    got = zlib.crc32(buf[:-4]) & 0xFFFFFFFF
    if want != got:
        raise ValueError(
            f"binlog CRC32 mismatch: event declares {want:#x}, "
            f"computed {got:#x}")
    return len(buf) - 4


def parse_rows_event(buf: bytes, table_maps: dict[int, dict],
                     ) -> list[dict] | None:
    """WRITE/UPDATE/DELETE_ROWS v2 → list of envelope dicts (one per
    row; update rows are (before, after) pairs — events.rs:360).
    FORMAT_DESCRIPTION events set the stream's checksum mode (CRC32
    trailers are verified and trimmed from every subsequent event)."""
    hdr = parse_header(buf)
    etype = hdr["type"]
    if etype == FORMAT_DESCRIPTION_EVENT:
        fd = parse_format_description(buf)
        table_maps[_CHECKSUM_KEY] = fd["checksum"]
        return None
    if etype == TABLE_MAP_EVENT:
        _event_end(buf, table_maps)  # verify trailer if CRC32 on
        tme = parse_table_map(buf)
        table_maps[tme["table_id"]] = tme
        return None
    if etype not in (WRITE_ROWS_V2, UPDATE_ROWS_V2, DELETE_ROWS_V2):
        return None  # gtid / xid framing
    pos = 19
    table_id = int.from_bytes(buf[pos:pos + 6], "little"); pos += 6
    pos += 2  # flags
    extra_len = struct.unpack_from("<H", buf, pos)[0]
    pos += extra_len  # extra_len includes its own 2 bytes
    tme = table_maps.get(table_id)
    if tme is None:
        return None  # rows for unmapped table: skip, like rel-less pgoutput
    ncols, pos = _lenenc(buf, pos)
    nbytes = (ncols + 7) // 8
    bm1 = buf[pos:pos + nbytes]; pos += nbytes
    present1 = [bool(bm1[i // 8] & (1 << (i % 8))) for i in range(ncols)]
    present2 = present1
    if etype == UPDATE_ROWS_V2:
        bm2 = buf[pos:pos + nbytes]; pos += nbytes
        present2 = [bool(bm2[i // 8] & (1 << (i % 8))) for i in range(ncols)]
    out: list[dict] = []
    rel = f"{tme['schema']}.{tme['table']}"
    end = _event_end(buf, table_maps)
    while pos < end:
        if etype == WRITE_ROWS_V2:
            vals, pos = _read_row(buf, pos, tme, present1)
            out.append({"relation": rel, "op": "insert",
                        "before": None, "after": vals})
        elif etype == DELETE_ROWS_V2:
            vals, pos = _read_row(buf, pos, tme, present1)
            out.append({"relation": rel, "op": "delete",
                        "before": vals, "after": None})
        else:
            before, pos = _read_row(buf, pos, tme, present1)
            after, pos = _read_row(buf, pos, tme, present2)
            out.append({"relation": rel, "op": "update",
                        "before": before, "after": after})
    if pos != end:
        # the last row decode must land exactly on the body end — an
        # overshoot means the trailer was misparsed as row data
        # (checksum-mode mismatch) or the event is corrupt
        raise ValueError(
            f"rows event decode overran body: pos={pos} end={end} — "
            "checksum mode mismatch or corrupt event")
    return out


# --------------------------------------------------------------------------
# Spark-side decode
ENVELOPE_SCHEMA = StructType([
    StructField("pos", LongType()),
    # per-row sequence within the decode task: multi-row events share one
    # binlog pos, so (pos, seq) totally orders rows — like __$seqval.
    StructField("seq", LongType()),
    StructField("relation", StringType()),
    StructField("op", StringType()),
    StructField("before", StringType()),  # JSON {col: value}, typed values
    StructField("after", StringType()),
])


_CHECKSUM_BREAKS = "checksum_breaks"


def collect_table_maps(df: DataFrame, event_col: str = "event",
                       pos_col: str = "pos") -> dict[int, dict]:
    """Driver-side TABLE_MAP + FORMAT_DESCRIPTION harvest (metadata; K
    rows — one per table plus one FD per binlog file). Event type is
    header byte 5, so the filter pushes to the scan as a 1-byte
    substring compare — data events never reach the driver.

    Checksum tracking: a FORMAT_DESCRIPTION can flip binlog_checksum
    MID-STREAM (server restart with changed config), so the harvest is
    one ORDERED pass — each table map's trailer verifies with the mode
    in effect at its own position — and the returned dict carries the
    full (position → mode) break list under ``checksum_breaks``, so a
    decode task that starts past a flip (multi-partition frames) picks
    the mode for ITS events' positions instead of the final one."""
    type_byte = F.substring(F.col(event_col), 5, 1)
    cols = ([pos_col, event_col] if pos_col in df.columns
            else [event_col])
    rows = (
        df.filter(type_byte.isin(
            F.lit(bytes([TABLE_MAP_EVENT])),
            F.lit(bytes([FORMAT_DESCRIPTION_EVENT]))))
        .select(*cols).collect()
    )
    maps: dict[int, dict] = {}
    breaks: list[tuple[int, str]] = []
    for r in rows:
        raw = bytes(r[event_col])
        pos = int(r[pos_col]) if pos_col in r.__fields__ else 0
        if raw[4] == FORMAT_DESCRIPTION_EVENT:
            mode = parse_format_description(raw)["checksum"]
            maps[_CHECKSUM_KEY] = mode
            breaks.append((pos, mode))
        elif raw[4] == TABLE_MAP_EVENT:
            _event_end(raw, maps)
            tme = parse_table_map(raw)
            maps[tme["table_id"]] = tme
    maps[_CHECKSUM_BREAKS] = breaks
    return maps


def _mode_at(breaks: list[tuple[int, str]], pos: int) -> str | None:
    """Checksum mode in effect at binlog position ``pos`` (last FD at or
    before it), or None if no FD precedes it."""
    mode = None
    for p, m in breaks:
        if p <= pos:
            mode = m
        else:
            break
    return mode


def decode_binlog_stream(df: DataFrame, event_col: str = "event",
                         pos_col: str = "pos",
                         table_maps: dict[int, dict] | None = None,
                         columns: dict[str, list[str]] | None = None,
                         ) -> DataFrame:
    """(pos, event binary) frame → envelope frame. ``columns`` names the
    columns per "schema.table" (binlog rows are positional; names come
    from information_schema out-of-band — events.rs:354-357's
    has_full_metadata fallback). Without names, columns are c0..cN."""
    maps = table_maps if table_maps is not None else collect_table_maps(
        df, event_col)
    col_names = columns or {}

    # Cross-task same-pos ordering via a deterministic wire position —
    # see pgoutput.decode_pgoutput_stream for why this must be computed
    # on the input (monotonically_increasing_id) rather than derived
    # from TaskContext in the decode task.
    streaming = df.isStreaming
    cols = [pos_col, event_col]
    src = (df.select(*cols) if streaming else
           df.select(*cols,
                     F.monotonically_increasing_id().alias("_wirepos")))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        local = dict(maps)
        breaks = local.get(_CHECKSUM_BREAKS) or []
        ctx = TaskContext.get()
        task_seq = (ctx.partitionId() if ctx is not None else 0) << 40
        for pdf in batches:
            out = {k: [] for k in ("pos", "seq", "relation", "op",
                                   "before", "after")}
            poss = (pdf["_wirepos"] if "_wirepos" in pdf.columns
                    else [None] * len(pdf))
            for pos_v, raw, wpos in zip(pdf[pos_col], pdf[event_col], poss):
                # a task may start PAST a checksum flip without having
                # seen the FD event: pick the mode for this position
                mode = _mode_at(breaks, int(pos_v))
                if mode is not None:
                    local[_CHECKSUM_KEY] = mode
                if wpos is None:
                    task_seq += 1
                    base_seq = task_seq << 12
                else:
                    # room for 4096 rows per rows-event
                    base_seq = int(wpos) << 12
                envs = parse_rows_event(bytes(raw), local)
                if not envs:
                    continue
                for j, env in enumerate(envs):
                    names = col_names.get(env["relation"])

                    def named(vals):
                        if vals is None:
                            return None
                        ns = names or [f"c{i}" for i in range(len(vals))]
                        return json.dumps(dict(zip(ns, vals)))

                    out["pos"].append(int(pos_v))
                    out["seq"].append(base_seq + j)
                    out["relation"].append(env["relation"])
                    out["op"].append(env["op"])
                    out["before"].append(named(env["before"]))
                    out["after"].append(named(env["after"]))
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=ENVELOPE_SCHEMA)


def binlog_to_diff(env: DataFrame, relation: str, row_ddl: str,
                   ) -> DataFrame:
    """Envelope frame (one table) → (payload, diff) update frame; JSON
    values are already typed, so from_json with the declared struct is
    the whole projection. Same contract as pgoutput_to_diff /
    debezium_decode → shared IVM downstream."""
    mine = env.filter(F.col("relation") == relation)
    pos_cols = ["pos", "seq"] if "seq" in env.columns else ["pos"]
    # ``upd`` marks both halves of an UPDATE_ROWS pair: row-based
    # replication applies an update only to a row that exists (a missing
    # row is skipped under slave_exec_mode=IDEMPOTENT, an error under
    # STRICT — never an insert), so apply_cdc must not materialize the
    # after-image of an update whose key is absent. WRITE/DELETE rows
    # keep upd=false and establish presence as before.
    additions = (
        mine.filter(F.col("op").isin("insert", "update"))
        .select(F.from_json("after", row_ddl).alias("r"), *pos_cols,
                (F.col("op") == "update").alias("upd"))
        .select("r.*", *pos_cols, "upd").withColumn("diff", F.lit(1))
    )
    retractions = (
        mine.filter(F.col("op").isin("delete", "update"))
        .select(F.from_json("before", row_ddl).alias("r"), *pos_cols,
                (F.col("op") == "update").alias("upd"))
        .select("r.*", *pos_cols, "upd").withColumn("diff", F.lit(-1))
    )
    return additions.unionByName(retractions).withColumnRenamed(
        "pos", "lsn")


# --------------------------------------------------------------------------
# encoders (tests / emulation)
def _header(etype: int, body_len: int, timestamp: int = 1_700_000_000,
            log_pos: int = 0) -> bytes:
    return struct.pack("<IBIIIH", timestamp, etype, 1, 19 + body_len,
                       log_pos, 0)


def with_crc32(event: bytes) -> bytes:
    """Append the binlog_checksum=CRC32 trailer: event_size grows by 4
    and the CRC covers header+body with the grown size (how the server
    writes it — the checksum is of the event as it appears on the wire
    minus the checksum itself)."""
    hdr = parse_header(event)
    patched = (event[:9] + struct.pack("<I", hdr["event_size"] + 4)
               + event[13:])
    return patched + struct.pack("<I", zlib.crc32(patched) & 0xFFFFFFFF)


def encode_format_description(checksum: str = "crc32",
                              server_version: str = "8.0.36-log",
                              timestamp: int = 1_700_000_000) -> bytes:
    """FORMAT_DESCRIPTION with the given binlog_checksum mode. The FD
    event itself always carries the algorithm byte + 4-byte trailer
    (post-5.6.1 servers)."""
    body = bytearray()
    body += struct.pack("<H", 4)  # binlog_version
    body += server_version.encode().ljust(50, b"\0")
    body += struct.pack("<I", timestamp)
    body += bytes([19])  # common header length
    body += bytes(40)  # post-header length array (unused by this decoder)
    alg = CHECKSUM_CRC32 if checksum == "crc32" else CHECKSUM_NONE
    body += bytes([alg])
    ev = _header(FORMAT_DESCRIPTION_EVENT, len(body) + 4,
                 timestamp) + bytes(body)
    # FD trailer: 4-byte CRC of everything so far (size already counts it)
    return ev + struct.pack("<I", zlib.crc32(ev) & 0xFFFFFFFF)


def encode_table_map(table_id: int, schema: str, table: str,
                     col_types: list[int], metadata: list[int],
                     timestamp: int = 1_700_000_000) -> bytes:
    body = bytearray()
    body += table_id.to_bytes(6, "little") + b"\0\0"
    body += bytes([len(schema)]) + schema.encode() + b"\0"
    body += bytes([len(table)]) + table.encode() + b"\0"
    body += _lenenc_bytes(len(col_types)) + bytes(col_types)
    meta = bytearray()
    for t, m in zip(col_types, metadata):
        if t in (T_VARCHAR, T_VAR_STRING):
            meta += struct.pack("<H", m)
        elif t in (T_FLOAT, T_DOUBLE, T_BLOB):
            meta += bytes([m])
    body += _lenenc_bytes(len(meta)) + bytes(meta)
    body += b"\xff" * ((len(col_types) + 7) // 8)  # null-allowed bitmap
    return _header(TABLE_MAP_EVENT, len(body), timestamp) + bytes(body)


def _encode_value(v, ctype: int, meta: int) -> bytes:
    if ctype in (T_TINY, T_SHORT, T_INT24, T_LONG, T_LONGLONG):
        return int(v).to_bytes(_FIXED[ctype], "little", signed=True)
    if ctype == T_FLOAT:
        return struct.pack("<f", v)
    if ctype == T_DOUBLE:
        return struct.pack("<d", v)
    if ctype in (T_VARCHAR, T_VAR_STRING):
        raw = str(v).encode("utf-8")
        pre = (bytes([len(raw)]) if meta < 256
               else struct.pack("<H", len(raw)))
        return pre + raw
    if ctype == T_BLOB:
        raw = bytes.fromhex(v) if isinstance(v, str) else bytes(v)
        return len(raw).to_bytes(meta, "little") + raw
    raise ValueError(f"unsupported column type {ctype}")


def _encode_row(vals: list, col_types: list[int], metadata: list[int],
                ) -> bytes:
    n = len(vals)
    null_bits = bytearray((n + 7) // 8)
    body = bytearray()
    for i, v in enumerate(vals):
        if v is None:
            null_bits[i // 8] |= 1 << (i % 8)
        else:
            body += _encode_value(v, col_types[i], metadata[i])
    return bytes(null_bits) + bytes(body)


def encode_rows_event(etype: int, table_id: int, rows: list,
                      col_types: list[int], metadata: list[int],
                      timestamp: int = 1_700_000_000) -> bytes:
    """rows: list of value-lists for WRITE/DELETE, list of
    (before, after) pairs for UPDATE."""
    n = len(col_types)
    body = bytearray()
    body += table_id.to_bytes(6, "little") + b"\0\0"
    body += struct.pack("<H", 2)  # extra_data_len (just itself)
    body += _lenenc_bytes(n)
    full = bytes([0xFF] * ((n + 7) // 8))
    body += full
    if etype == UPDATE_ROWS_V2:
        body += full
        for before, after in rows:
            body += _encode_row(before, col_types, metadata)
            body += _encode_row(after, col_types, metadata)
    else:
        for vals in rows:
            body += _encode_row(vals, col_types, metadata)
    return _header(etype, len(body), timestamp) + bytes(body)
