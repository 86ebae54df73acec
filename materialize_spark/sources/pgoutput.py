"""PostgreSQL logical-replication (pgoutput) CDC decode, without libpq.

Reference: the reference's Postgres CDC source consumes a replication
slot's pgoutput stream and turns Insert/Update/Delete/Relation messages
into (row, diff) updates
(/root/reference/src/storage/src/source/postgres/replication.rs:897-1076
dispatches the message enum; :920-996 maps Insert → +1, Update →
retract old / insert new, Delete → -1). This module implements the same
decode Spark-first from the PUBLIC wire format
(postgresql.org/docs/current/protocol-logicalrep-message-formats.html):
no psycopg/libpq in the sandbox, so the binary messages themselves are
parsed here, exactly like sources/avro.py and sources/protobuf.py do for
their formats.

Shape of the decode (scales to a real slot):
- Relation ('R') messages are METADATA — a handful of tiny records per
  table, by protocol guaranteed to precede the first data message that
  references their OID. They are collected driver-side (K-row collect,
  same budget class as IVF centroids) and broadcast into the data decode.
- Insert/Update/Delete ('I'/'U'/'D') messages are DATA — decoded in
  Arrow-batched mapInPandas, one Python loop per batch, never per-row
  UDFs. Output is a generic envelope frame
  (lsn, relation, op, before/after as JSON {col: text-value}):
  pgoutput ships column values in Postgres TEXT format, so the typed
  projection happens JVM-side via element_at + cast
  (``typed_projection``), keeping type conversion out of Python.
- ``pgoutput_to_diff`` turns the envelope into the (payload, diff ∈
  {+1,-1}) update frame the IVM operators consume — the same contract as
  envelopes.debezium_decode, so everything downstream (MaterializedView,
  RetractionAwareAgg, upsert merge) is shared.

Messages handled: B(egin), C(ommit), R(elation), I(nsert), U(pdate),
D(elete), T(runcate), O(rigin), Y(Type), M(essage). Update without an
old tuple (REPLICA IDENTITY DEFAULT, key unchanged) retracts by key
columns only — flagged via ``key_only_before`` so callers can join state
if they maintain it, matching replication.rs:933-971's old_tuple()
handling.

An encoder for every message type is included for tests/emulation (the
sandbox has no Postgres server; same pattern as avro.encode_record).
"""

from __future__ import annotations

import json
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

# Postgres epoch (2000-01-01) in micros since Unix epoch.
_PG_EPOCH_US = 946_684_800_000_000

# Common type OIDs (pg_catalog) → Spark cast targets for typed_projection.
PG_TYPE_OIDS = {
    16: "boolean",    # bool
    20: "bigint",     # int8
    21: "smallint",   # int2
    23: "int",        # int4
    25: "string",     # text
    700: "float",     # float4
    701: "double",    # float8
    1042: "string",   # bpchar
    1043: "string",   # varchar
    1082: "date",     # date
    1114: "timestamp",  # timestamp
    1184: "timestamp",  # timestamptz (rendered in slot's tz)
    1700: "decimal(38,9)",  # numeric
}


# --------------------------------------------------------------------------
# wire-level helpers
def _cstr(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(0, pos)
    return buf[pos:end].decode("utf-8"), end + 1


def _tuple_data(buf: bytes, pos: int) -> tuple[list, int]:
    """TupleData: int16 ncols, then per column a 1-byte kind:
    'n' NULL | 'u' unchanged-TOAST | 't' text (int32 len + bytes) |
    'b' binary (int32 len + bytes)."""
    (ncols,) = struct.unpack_from(">h", buf, pos)
    pos += 2
    out: list = []
    for _ in range(ncols):
        kind = buf[pos:pos + 1]
        pos += 1
        if kind == b"n":
            out.append(None)
        elif kind == b"u":
            out.append(None)  # unchanged TOAST: value not shipped
        elif kind in (b"t", b"b"):
            (ln,) = struct.unpack_from(">i", buf, pos)
            pos += 4
            raw = buf[pos:pos + ln]
            pos += ln
            out.append(raw.decode("utf-8") if kind == b"t"
                       else raw.hex())  # binary mode: hex-render
        else:
            raise ValueError(f"bad TupleData kind {kind!r}")
    return out, pos


def parse_relation(buf: bytes) -> dict:
    """'R': oid int32, namespace cstr, relname cstr, replident int8,
    ncols int16, per col (flags int8, name cstr, type_oid int32,
    typmod int32). flags bit 0 = part of the key."""
    assert buf[0:1] == b"R"
    (oid,) = struct.unpack_from(">i", buf, 1)
    pos = 5
    ns, pos = _cstr(buf, pos)
    name, pos = _cstr(buf, pos)
    replident = chr(buf[pos]); pos += 1
    (ncols,) = struct.unpack_from(">h", buf, pos)
    pos += 2
    cols = []
    for _ in range(ncols):
        flags = buf[pos]; pos += 1
        cname, pos = _cstr(buf, pos)
        type_oid, _typmod = struct.unpack_from(">ii", buf, pos)
        pos += 8
        cols.append({"name": cname, "type_oid": type_oid,
                     "is_key": bool(flags & 1)})
    return {"oid": oid, "namespace": ns, "name": name,
            "replica_identity": replident, "columns": cols}


def parse_message(buf: bytes, relations: dict[int, dict]) -> dict | None:
    """One pgoutput message → envelope dict, or None for non-data
    messages (B/C/O/Y/M are transaction framing / metadata)."""
    tag = buf[0:1]
    if tag in (b"B", b"C", b"O", b"Y", b"M"):
        return None
    if tag == b"R":
        rel = parse_relation(buf)
        relations[rel["oid"]] = rel
        return None
    if tag == b"T":  # Truncate: int32 nrels, int8 options, oids
        (nrels,) = struct.unpack_from(">i", buf, 1)
        oids = struct.unpack_from(f">{nrels}i", buf, 6)
        return {"op": "truncate", "relations":
                [relations[o]["name"] for o in oids if o in relations]}
    (rel_oid,) = struct.unpack_from(">i", buf, 1)
    rel = relations.get(rel_oid)
    if rel is None:
        return None  # data before Relation: ignored (replication.rs:916-919)
    names = [c["name"] for c in rel["columns"]]

    def as_map(vals):
        return {n: v for n, v in zip(names, vals)}

    pos = 5
    if tag == b"I":  # 'N' + TupleData
        assert buf[pos:pos + 1] == b"N"
        vals, _ = _tuple_data(buf, pos + 1)
        return {"op": "insert", "relation": rel["name"],
                "before": None, "after": as_map(vals),
                "key_only_before": False}
    if tag == b"U":
        before = None
        key_only = False
        marker = buf[pos:pos + 1]
        if marker in (b"K", b"O"):  # old tuple present (K = key cols only)
            vals, pos2 = _tuple_data(buf, pos + 1)
            before = as_map(vals)
            key_only = marker == b"K"
            pos = pos2
            marker = buf[pos:pos + 1]
        assert marker == b"N"
        new_vals, _ = _tuple_data(buf, pos + 1)
        return {"op": "update", "relation": rel["name"],
                "before": before, "after": as_map(new_vals),
                "key_only_before": key_only}
    if tag == b"D":
        marker = buf[pos:pos + 1]
        assert marker in (b"K", b"O")
        vals, _ = _tuple_data(buf, pos + 1)
        return {"op": "delete", "relation": rel["name"],
                "before": as_map(vals), "after": None,
                "key_only_before": marker == b"K"}
    raise ValueError(f"unknown pgoutput tag {tag!r}")


# --------------------------------------------------------------------------
# Spark-side decode
ENVELOPE_SCHEMA = StructType([
    StructField("lsn", LongType()),
    # per-message sequence within the decode task: orders messages that
    # share an LSN (multi-row transactions), like SQL Server's __$seqval.
    StructField("seq", LongType()),
    StructField("relation", StringType()),
    StructField("op", StringType()),
    # JSON-rendered {col: text-value}: Arrow ships plain strings (maps in
    # Pandas-UDF output trip Spark 4's converter), and the JVM parses them
    # once via from_json — same shape as envelopes.debezium_decode.
    StructField("before", StringType()),
    StructField("after", StringType()),
    StructField("key_only_before", StringType()),
])


_REL_BREAKS = "relation_breaks"


def collect_relations(df: DataFrame, message_col: str = "message",
                      lsn_col: str = "lsn") -> dict[int, dict]:
    """Driver-side Relation-message harvest. 'R' messages are one tiny
    record per replicated table (metadata, not data) — the collect is
    K rows where K = table count, the same budget class as IVF
    centroids. The filter pushes to the scan: first byte == 'R'.

    A relation can be RE-declared mid-stream with a new schema (ALTER
    TABLE on the publisher sends a fresh 'R'), so alongside the
    last-wins map the harvest returns the full (lsn → relation) version
    list under ``relation_breaks``: a decode task that covers only a
    pre-alter slice of a multi-partition frame resolves each message
    against the version in effect at ITS lsn, not the final one."""
    cols = ([lsn_col, message_col] if lsn_col in df.columns
            else [message_col])
    rel_rows = (
        df.filter(F.substring(F.col(message_col), 1, 1) == F.lit(b"R"))
        .select(*cols).collect()
    )
    relations: dict[int, dict] = {}
    breaks: list[tuple[int, int, dict]] = []
    for r in rel_rows:
        rel = parse_relation(bytes(r[message_col]))
        lsn = int(r[lsn_col]) if lsn_col in r.__fields__ else 0
        relations[rel["oid"]] = rel
        breaks.append((lsn, rel["oid"], rel))
    relations[_REL_BREAKS] = breaks
    return relations


def decode_pgoutput_stream(df: DataFrame, message_col: str = "message",
                           lsn_col: str = "lsn",
                           relations: dict[int, dict] | None = None,
                           ) -> DataFrame:
    """(lsn, message binary) frame → envelope frame. Data messages decode
    in Arrow-batched mapInPandas with the (broadcast) relation map;
    works on batch and readStream frames alike (pass ``relations`` from
    ``collect_relations`` for streams, where a driver collect is not
    possible mid-plan)."""
    rels = relations if relations is not None else collect_relations(
        df, message_col)

    # Same-LSN ordering must hold ACROSS tasks (a multi-partition frame
    # splits one LSN's messages over tasks whose local counters would
    # otherwise overlap — insert-then-delete at one LSN could resurrect
    # the row). seq derives from a wire position computed on the INPUT:
    # monotonically_increasing_id is partition-prefixed with the child
    # RDD's partition index, so it is (a) a total order whenever
    # partition order == wire order (true for the drained frames) and
    # (b) DETERMINISTIC across plan re-evaluations — a TaskContext-based
    # prefix is not (in a union, branch tasks get union-level partition
    # ids, so pgoutput_to_diff's +1/-1 branches would disagree on seq).
    # Streaming frames disallow the id expression; there each micro-batch
    # decodes once into state, so the per-task prefix is safe.
    streaming = df.isStreaming
    cols = [lsn_col, message_col]
    src = (df.select(*cols) if streaming else
           df.select(*cols,
                     F.monotonically_increasing_id().alias("_wirepos")))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        local = dict(rels)  # per-task copy; in-stream 'R' still honored
        # versioned relation resolution: when the harvest carries the
        # (lsn → relation) break list, start from an empty map and apply
        # versions as this task's lsns pass them — a task covering a
        # pre-alter slice then decodes with the schema in effect THERE.
        breaks = local.pop(_REL_BREAKS, None) or []
        if breaks:
            local = {k: v for k, v in local.items()
                     if not isinstance(k, int)}
        brk_i = 0
        ctx = TaskContext.get()
        task_seq = (ctx.partitionId() if ctx is not None else 0) << 40
        for pdf in batches:
            out = {k: [] for k in ("lsn", "seq", "relation", "op", "before",
                                   "after", "key_only_before")}
            poss = (pdf["_wirepos"] if "_wirepos" in pdf.columns
                    else [None] * len(pdf))
            for lsn, raw, pos in zip(pdf[lsn_col], pdf[message_col], poss):
                while brk_i < len(breaks) and breaks[brk_i][0] <= int(lsn):
                    local[breaks[brk_i][1]] = breaks[brk_i][2]
                    brk_i += 1
                if pos is None:
                    task_seq += 1
                    base_seq = task_seq << 12
                else:
                    # room for 4096 rows per message (truncate fan-out)
                    base_seq = int(pos) << 12
                env = parse_message(bytes(raw), local)
                if env is None:
                    continue
                if env["op"] == "truncate":
                    # The reference errors the source on TRUNCATE of a
                    # replicated table (it cannot be expressed as diffs
                    # without full state). Surface one envelope row per
                    # truncated relation; pgoutput_to_diff turns it into
                    # an execution-time error (or skips it on
                    # on_truncate="ignore"), like DECODING ERRORS=INLINE.
                    for j, rel_name in enumerate(env["relations"]):
                        out["lsn"].append(int(lsn))
                        out["seq"].append(base_seq + j)
                        out["relation"].append(rel_name)
                        out["op"].append("truncate")
                        out["before"].append(None)
                        out["after"].append(None)
                        out["key_only_before"].append("f")
                    continue
                out["lsn"].append(int(lsn))
                out["seq"].append(base_seq)
                out["relation"].append(env["relation"])
                out["op"].append(env["op"])
                out["before"].append(
                    None if env["before"] is None
                    else json.dumps(env["before"]))
                out["after"].append(
                    None if env["after"] is None
                    else json.dumps(env["after"]))
                out["key_only_before"].append(
                    "t" if env["key_only_before"] else "f")
            yield pd.DataFrame(out)

    return src.mapInPandas(decode, schema=ENVELOPE_SCHEMA)


def typed_projection(col: str | Column, relation: dict) -> list[Column]:
    """JSON envelope column → typed columns, JVM-side: from_json to a
    map, element_at + cast per the Relation message's type OIDs
    (text-format values cast exactly like the reference's text-mode
    decode)."""
    raw = F.col(col) if isinstance(col, str) else col
    src = F.from_json(raw, "map<string,string>")
    out = []
    for c in relation["columns"]:
        spark_t = PG_TYPE_OIDS.get(c["type_oid"], "string")
        expr = F.element_at(src, c["name"])
        if spark_t == "boolean":
            expr = expr == F.lit("t")  # PG text bools are 't'/'f'
        elif spark_t != "string":
            expr = expr.cast(spark_t)
        out.append(expr.alias(c["name"]))
    return out


def pgoutput_to_diff(env: DataFrame, relation: dict,
                     on_truncate: str = "error") -> DataFrame:
    """Envelope frame (one relation) → explicit-diff update frame:
    insert/update-after → +1, delete/update-before → -1. Identical
    contract to envelopes.debezium_decode → shared IVM downstream.
    Rows whose retraction carries key columns only (REPLICA IDENTITY
    DEFAULT) surface the non-key columns as NULL — callers holding
    upsert state resolve them by key, as the reference does.

    TRUNCATE of the relation puts the stream into an errored state, like
    the reference's Postgres source (replication.rs: a truncate of a
    replicated table is a definite error — it cannot be expressed as
    diffs). ``on_truncate="error"`` (default) raises at execution time
    via a poisoned diff expression; ``"ignore"`` drops truncate rows
    (pre-round-6 behavior, for callers that resnapshot out-of-band)."""
    name = relation["name"]
    mine = env.filter(F.col("relation") == name)
    seq = F.col("seq") if "seq" in env.columns else F.lit(0)
    add_pred = F.col("op").isin("insert", "update")
    if on_truncate == "error":
        # raise_error inside the diff column: any surviving truncate row
        # errors the job the moment it is computed, and the expression
        # cannot be pruned away (diff is always consumed downstream).
        add_diff = F.when(F.col("op") == "truncate", F.raise_error(F.concat(
            F.lit("pgoutput: TRUNCATE of replicated table "),
            F.col("relation"),
            F.lit(" — resnapshot required"))).cast("int")).otherwise(1)
        add_pred = add_pred | (F.col("op") == "truncate")
    else:
        add_diff = F.lit(1)
    additions = (
        mine.filter(add_pred)
        .select(*typed_projection("after", relation),
                F.col("lsn"), seq.alias("seq"), add_diff.alias("diff"))
    )
    retractions = (
        mine.filter(
            (F.col("op") == "delete")
            | ((F.col("op") == "update") & F.col("before").isNotNull()))
        .select(*typed_projection("before", relation),
                F.col("lsn"), seq.alias("seq"), F.lit(-1).alias("diff"))
    )
    return additions.unionByName(retractions)


def apply_cdc(base: DataFrame, diff: DataFrame, key_cols: list[str],
              ) -> DataFrame:
    """Snapshot ⊎ replication deltas → current state, the
    snapshot-then-stream handoff of the reference's Postgres source
    (snapshot.rs + replication.rs rewind): latest state per key wins;
    a key whose net diff ≤ 0 disappears.

    Distributed shape: one shuffle on the key; window + filter, no
    driver loops."""
    from pyspark.sql.window import Window

    data_cols = [c for c in base.columns]
    # the snapshot sorts before every replication LSN, whatever the LSN
    # type: long positions (pgoutput/binlog) get 0, the SQL Server
    # hex-string LSN gets "" (lexicographic floor for fixed-width hex)
    lsn_type = diff.schema["lsn"].dataType.simpleString()
    floor = F.lit("" if lsn_type == "string" else 0).cast(lsn_type)
    has_seq = "seq" in diff.columns
    tagged_base = base.select(*data_cols).withColumn(
        "lsn", floor).withColumn("diff", F.lit(1))
    pos_cols = ["lsn"]
    if has_seq:
        tagged_base = tagged_base.withColumn("seq", F.lit(0))
        pos_cols.append("seq")
    if "upd" in diff.columns:
        # Producer marked UPDATE pairs (mysql binlog_to_diff): an
        # update applies only when its key is PRESENT at that position
        # (snapshot row or a prior WRITE not deleted since) — row-based
        # replication skips updates of missing rows, it never inserts
        # them. Presence is decided by non-update events only (updates
        # preserve it; key-changing updates never arrive as 'update'
        # from our producers — key-based application would split them
        # into delete+insert upstream).
        tagged_base = tagged_base.withColumn("upd", F.lit(False))
        all_updates = tagged_base.unionByName(
            diff.select(*data_cols, *pos_cols, "diff", "upd"))
        asc = [F.col(c).asc() for c in pos_cols] + [F.col("diff").asc()]
        wseq = (Window.partitionBy(*key_cols).orderBy(*asc)
                .rowsBetween(Window.unboundedPreceding,
                             Window.currentRow))
        wall = (Window.partitionBy(*key_cols).orderBy(*asc)
                .rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing))
        pres_ev = F.when(~F.col("upd"), F.col("diff"))
        ev = all_updates.withColumn(
            "_pres", F.coalesce(F.last(pres_ev, ignorenulls=True)
                                .over(wseq), F.lit(-1))).withColumn(
            "_fp", F.coalesce(F.last(pres_ev, ignorenulls=True)
                              .over(wall), F.lit(-1)))
        order = [F.col(c).desc() for c in pos_cols] \
            + [F.col("diff").desc()]
        w = Window.partitionBy(*key_cols).orderBy(*order)
        # value rows: snapshot/WRITE after-images always; update
        # after-images only where the key was present just before
        return (ev.filter((F.col("_fp") == 1) & (F.col("diff") == 1)
                          & (~F.col("upd") | (F.col("_pres") == 1)))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "_pres", "_fp", "diff", "upd", *pos_cols))
    all_updates = tagged_base.unionByName(
        diff.select(*data_cols, *pos_cols, "diff"))
    # Order: position desc (lsn, then per-message seq when the source
    # provides one — it distinguishes insert-then-delete of one key at a
    # single LSN from an update pair), then diff desc so an in-place
    # update's (+1 after, -1 before) tie resolves to the addition.
    order = [F.col(c).desc() for c in pos_cols] + [F.col("diff").desc()]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    latest = (
        all_updates.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("diff") == 1))
        .drop("_rn", "diff", *pos_cols)
    )
    # a delete is the latest event for its key → diff == -1 row filtered
    return latest


# --------------------------------------------------------------------------
# encoders (tests / emulation; sandbox has no Postgres server)
def encode_begin(final_lsn: int, commit_ts_us: int, xid: int) -> bytes:
    return b"B" + struct.pack(">qqi", final_lsn,
                              commit_ts_us - _PG_EPOCH_US, xid)


def encode_commit(lsn: int, end_lsn: int, commit_ts_us: int) -> bytes:
    return b"C" + struct.pack(">bqqq", 0, lsn, end_lsn,
                              commit_ts_us - _PG_EPOCH_US)


def encode_relation(oid: int, namespace: str, name: str,
                    columns: list[tuple[str, int, bool]],
                    replica_identity: str = "d") -> bytes:
    out = bytearray(b"R")
    out += struct.pack(">i", oid)
    out += namespace.encode() + b"\0" + name.encode() + b"\0"
    out += replica_identity.encode()
    out += struct.pack(">h", len(columns))
    for cname, type_oid, is_key in columns:
        out += struct.pack(">b", 1 if is_key else 0)
        out += cname.encode() + b"\0"
        out += struct.pack(">ii", type_oid, -1)
    return bytes(out)


def _encode_tuple(vals: list) -> bytes:
    out = bytearray(struct.pack(">h", len(vals)))
    for v in vals:
        if v is None:
            out += b"n"
        else:
            raw = str(v).encode("utf-8")
            out += b"t" + struct.pack(">i", len(raw)) + raw
    return bytes(out)


def encode_insert(rel_oid: int, vals: list) -> bytes:
    return b"I" + struct.pack(">i", rel_oid) + b"N" + _encode_tuple(vals)


def encode_update(rel_oid: int, new_vals: list,
                  old_vals: list | None = None,
                  old_is_key_only: bool = False) -> bytes:
    out = bytearray(b"U") + struct.pack(">i", rel_oid)
    if old_vals is not None:
        out += (b"K" if old_is_key_only else b"O") + _encode_tuple(old_vals)
    out += b"N" + _encode_tuple(new_vals)
    return bytes(out)


def encode_delete(rel_oid: int, old_vals: list,
                  key_only: bool = True) -> bytes:
    return (b"D" + struct.pack(">i", rel_oid)
            + (b"K" if key_only else b"O") + _encode_tuple(old_vals))


def encode_truncate(rel_oids: list[int]) -> bytes:
    return (b"T" + struct.pack(">i", len(rel_oids)) + b"\0"
            + struct.pack(f">{len(rel_oids)}i", *rel_oids))
