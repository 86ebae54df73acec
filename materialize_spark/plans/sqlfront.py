"""MzSession: the SQL entry point (DDL + queries) over a Catalog.

Reference statement surface (src/sql-parser/src/ast/defs/statement.rs:43-117)
mapped to engine actions:

| statement                         | action                                |
|-----------------------------------|---------------------------------------|
| CREATE VIEW v AS q                | store plan (DataFrame), temp view     |
| CREATE MATERIALIZED VIEW v AS q   | maintained result table (batch:       |
|                                   | eager refresh; streaming: ivm.py)     |
| CREATE INDEX i ON obj (cols)      | arrangement: repartition+persist      |
| CREATE DEFAULT INDEX ...          | same, keyed on all columns            |
| DROP VIEW/INDEX/TABLE             | catalog drop (+unpersist)             |
| SHOW VIEWS / TABLES               | catalog listing                       |
| SELECT ...                        | dialect rewrite → spark.sql           |
| SUBSCRIBE v                       | diff stream of the MV (ivm deltas)    |

One-shot SELECTs hit Catalyst directly (the reference's "peek" path);
reads of a materialized view serve the maintained table — the fast path
(reference FastPathPlan::PeekExisting, src/adapter/src/coord/peek.rs:171).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from materialize_spark.catalog import Catalog
from materialize_spark.plans.dialect import rewrite

_CREATE_VIEW = re.compile(
    r"^\s*CREATE\s+(OR\s+REPLACE\s+)?(MATERIALIZED\s+)?VIEW\s+(\w+)\s+AS\s+(.*)$",
    re.I | re.S)
_CREATE_INDEX = re.compile(
    r"^\s*CREATE\s+(DEFAULT\s+)?INDEX\s+(\w+)?\s*ON\s+(\w+)\s*(?:\(([^)]*)\))?\s*$",
    re.I)
_DROP = re.compile(r"^\s*DROP\s+(VIEW|INDEX|TABLE|SOURCE)\s+(IF\s+EXISTS\s+)?(\w+)\s*$",
                   re.I)
_SHOW = re.compile(
    r"^\s*SHOW\s+(VIEWS|TABLES|INDEXES)(?:\s+LIKE\s+'([^']*)')?\s*$", re.I)
_CREATE_SECRET = re.compile(
    r"^\s*CREATE\s+SECRET\s+(\w+)\s+AS\s+'([^']*)'\s*$", re.I)
_CREATE_CONN = re.compile(
    r"^\s*CREATE\s+CONNECTION\s+(\w+)\s+TO\s+(\w+)\s*\((.*)\)\s*$",
    re.I | re.S)
_SHOW_SEC_CONN = re.compile(r"^\s*SHOW\s+(SECRETS|CONNECTIONS)\s*$", re.I)
_TABLE_STMT = re.compile(r"^\s*TABLE\s+(\w+)\s*$", re.I)
_SHOW_CREATE = re.compile(
    r"^\s*SHOW\s+CREATE\s+(?:MATERIALIZED\s+)?VIEW\s+(\w+)\s*$", re.I)
_SHOW_COLUMNS = re.compile(r"^\s*SHOW\s+COLUMNS\s+FROM\s+(\w+)\s*$", re.I)
_CREATE_TABLE_AS = re.compile(
    r"^\s*CREATE\s+TABLE\s+(\w+)\s+AS\s+(.*)$", re.I | re.S)
_CREATE_TABLE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(\w+)\s*\(([^)]*)\)\s*$", re.I | re.S)
_INSERT = re.compile(
    r"^\s*INSERT\s+INTO\s+(\w+)\s+(VALUES\s*.*|SELECT\s+.*)$", re.I | re.S)
_CREATE_SOURCE = re.compile(
    r"^\s*CREATE\s+SOURCE\s+(\w+)\s+FROM\s+"
    r"(?:FILE\s+'([^']+)'(?:\s+FORMAT\s+(\w+))?"
    r"|LOAD\s+GENERATOR\s+(\w+)(?:\s*\(\s*SCALE\s+FACTOR\s+([\d.]+)\s*\))?"
    r"|(WEBHOOK)(?:\s+BODY\s+FORMAT\s+(\w+))?)\s*$", re.I)
_SUBSCRIBE = re.compile(
    r"^\s*SUBSCRIBE\s+(?:TO\s+)?(\w+)"
    r"(?:\s+WITHIN\s+TIMESTAMP\s+ORDER\s+BY\s+(.+?)"
    r"|\s+ENVELOPE\s+(UPSERT|DEBEZIUM)\s*\(\s*KEY\s*\(([^)]*)\)\s*\))?\s*$",
    re.I | re.S)
_REFRESH_MV = re.compile(
    r"^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(\w+)\s*$", re.I)
_EXPLAIN = re.compile(
    r"^\s*EXPLAIN\s+(?:(RAW|OPTIMIZED|PHYSICAL)\s+)?(?:PLAN\s+FOR\s+)?"
    r"(SELECT\s+.*|WITH\s+.*)$", re.I | re.S)
_COPY = re.compile(
    r"^\s*COPY\s+(?:\((.*)\)|(\w+))\s+TO\s+'([^']+)'"
    r"(?:\s+WITH\s*\(\s*FORMAT\s+(\w+)\s*\))?\s*$", re.I | re.S)
_COPY_FROM = re.compile(
    r"^\s*COPY\s+(\w+)\s+FROM\s+'([^']+)'"
    r"(?:\s+WITH\s*\(\s*FORMAT\s+(\w+)\s*\))?\s*$", re.I)
_SHOW_EXT = re.compile(r"^\s*SHOW\s+(SOURCES|SINKS)\s*$", re.I)
_EXPLAIN_TS = re.compile(
    r"^\s*EXPLAIN\s+TIMESTAMP\s+FOR\s+(?:SELECT\s+\*\s+FROM\s+)?(\w+)\s*$",
    re.I)
_PREPARE = re.compile(r"^\s*PREPARE\s+(\w+)\s+AS\s+(.*)$", re.I | re.S)
_EXECUTE = re.compile(r"^\s*EXECUTE\s+(\w+)(?:\s*\((.*)\))?\s*$", re.I | re.S)
_DEALLOCATE = re.compile(r"^\s*DEALLOCATE\s+(?:PREPARE\s+)?(\w+|ALL)\s*$", re.I)
_DECLARE = re.compile(r"^\s*DECLARE\s+(\w+)\s+CURSOR\s+FOR\s+(.*)$",
                      re.I | re.S)
_FETCH = re.compile(r"^\s*FETCH\s+(?:(\d+|ALL)\s+)?(?:FROM\s+)?(\w+)\s*$",
                    re.I)
_CLOSE = re.compile(r"^\s*CLOSE\s+(\w+)\s*$", re.I)
_TXN_BEGIN = re.compile(r"^\s*(?:BEGIN|START\s+TRANSACTION)\s*$", re.I)
_TXN_COMMIT = re.compile(r"^\s*COMMIT\s*$", re.I)
_TXN_ROLLBACK = re.compile(r"^\s*ROLLBACK\s*$", re.I)
_ALTER_RENAME = re.compile(
    r"^\s*ALTER\s+(?:TABLE|VIEW|SOURCE|INDEX|MATERIALIZED\s+VIEW)\s+(\w+)"
    r"\s+RENAME\s+TO\s+(\w+)\s*$", re.I)
_AS_OF = re.compile(
    r"^\s*(?:SELECT\s+\*\s+FROM\s+|SUBSCRIBE\s+(?:TO\s+)?)(\w+)"
    r"\s+AS\s+OF\s+(\d+)(?:\s+UP\s+TO\s+(\d+))?\s*$", re.I)
_ALTER_RETAIN = re.compile(
    r"^\s*ALTER\s+MATERIALIZED\s+VIEW\s+(\w+)\s+SET\s*\(\s*RETAIN\s+HISTORY"
    r"\s*(?:=|FOR)\s*'?(\d+)'?\s*\)\s*$", re.I)
_INTROSPECT = re.compile(
    r"\bmz_(?:tables|views|materialized_views|indexes|objects|columns"
    r"|sources|sinks)\b", re.I)
_UPDATE = re.compile(
    r"^\s*UPDATE\s+(\w+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?\s*$", re.I | re.S)
_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.*))?\s*$", re.I | re.S)
_WMR = re.compile(r"^\s*WITH\s+MUTUALLY\s+RECURSIVE\s+(.*)$", re.I | re.S)
_CREATE_SINK = re.compile(
    r"^\s*CREATE\s+SINK\s+(\w+)\s+FROM\s+(\w+)\s+INTO\s+FILE\s+'([^']+)'"
    r"(?:\s+FORMAT\s+(\w+))?(?:\s+ENVELOPE\s+(\w+))?\s*$", re.I)


def _match_paren(s: str, i: int) -> int:
    """Index of the ')' closing the '(' at ``s[i]``, skipping 'literals'."""
    depth = 0
    in_lit = False
    for j in range(i, len(s)):
        ch = s[j]
        if in_lit:
            if ch == "'":
                in_lit = False
            continue
        if ch == "'":
            in_lit = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return j
    raise ValueError(f"unbalanced parentheses in: {s[i:i+80]!r}")


def split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren depth 0, outside string literals — so
    ``decimal(12,2)`` column defs and function-call arguments survive."""
    parts, buf = [], []
    depth = 0
    in_lit = False
    for ch in s:
        if in_lit:
            buf.append(ch)
            if ch == "'":
                in_lit = False
            continue
        if ch == "'":
            in_lit = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf).strip())
    return parts


def _parse_wmr(tail: str):
    """Parse the tail of WITH MUTUALLY RECURSIVE: a comma-separated list of
    ``name (col type, ...) AS (query)`` bindings, then the final query.
    Reference syntax: test/sqllogictest/with_mutually_recursive.slt."""
    bindings: list[tuple[str, str, str]] = []
    i = 0
    while True:
        m = re.match(r"\s*([A-Za-z_]\w*)\s*\(", tail[i:])
        if not m:
            raise ValueError(f"WMR: expected binding at: {tail[i:i+60]!r}")
        name = m.group(1)
        j = i + m.end() - 1
        j2 = _match_paren(tail, j)
        coldefs = tail[j + 1:j2]
        m2 = re.match(r"\s*AS\s*\(", tail[j2 + 1:], re.I)
        if not m2:
            raise ValueError(f"WMR: expected AS ( after {name}")
        k = j2 + 1 + m2.end() - 1
        k2 = _match_paren(tail, k)
        body = tail[k + 1:k2]
        bindings.append((name, coldefs, body))
        m3 = re.match(r"\s*,", tail[k2 + 1:])
        if m3:
            i = k2 + 1 + m3.end()
        else:
            return bindings, tail[k2 + 1:].strip()


def _pg_coldefs(coldefs: str) -> str:
    """Translate a PG column-def list to Spark DDL (paren-aware, so
    ``decimal(12,2)`` next to other columns survives)."""
    from materialize_spark.plans.dialect import _PG_TYPES
    cols = []
    for part in split_top_level(coldefs):
        toks = part.split(None, 1)
        name = toks[0]
        typ = toks[1].strip() if len(toks) > 1 else "string"
        typ = _PG_TYPES.get(typ.lower(), typ)
        cols.append(f"{name} {typ}")
    return ", ".join(cols)


_NO_MATCH = object()  # family handler sentinel: no statement form matched


class MzSession:
    """SQL surface bound to a SparkSession + Catalog.

    ``strict_errors=True`` (default) evaluates one-shot SELECTs with ANSI
    semantics: division by zero, invalid casts, and numeric overflow raise
    errors exactly like the reference's PG-compatible evaluator
    (reference BinaryFunc::Div, src/expr/src/scalar/func.rs) instead of
    returning NULL."""

    def __init__(self, spark: SparkSession, sf_dir: str | None = None,
                 strict_errors: bool = True):
        self.spark = spark
        self.strict_errors = strict_errors
        self.catalog = Catalog(spark, sf_dir) if sf_dir else Catalog(spark)
        self._matviews: dict[str, DataFrame] = {}
        self._matview_sql: dict[str, str] = {}
        self._sub_state: dict[str, DataFrame] = {}
        # RETAIN HISTORY: per-MV changelog of refresh deltas, readable via
        # SELECT ... AS OF <epoch> (streaming.history.RetainedHistory);
        # retention window counted in refresh epochs.
        self._histories: dict[str, object] = {}
        self._retain: dict[str, int] = {}
        self._view_sql: dict[str, str] = {}
        self._sinks: dict[str, dict] = {}
        self._webhooks: dict[str, object] = {}
        self._prepared: dict[str, str] = {}
        self._cursors: dict[str, dict] = {}
        self._txn_snapshot: dict | None = None
        self._secrets: dict[str, str] = {}
        self._connections: dict[str, dict] = {}

    def webhook(self, name: str):
        """The WebhookSource behind ``CREATE SOURCE name FROM WEBHOOK`` —
        call ``.post(body, headers)`` to deliver events."""
        return self._webhooks[name]

    def _strict(self):
        """ANSI-mode window for one-shot query analysis. Spark captures
        EvalMode at analysis ( verified: a plan built under ANSI raises on
        collect even after the conf is reset), so scoping the conf to the
        spark.sql() call gives PG error semantics to exactly this query."""
        import contextlib

        @contextlib.contextmanager
        def ctx():
            if not self.strict_errors:
                yield
                return
            old = self.spark.conf.get("spark.sql.ansi.enabled", "false")
            self.spark.conf.set("spark.sql.ansi.enabled", "true")
            try:
                yield
            finally:
                self.spark.conf.set("spark.sql.ansi.enabled", old)
        return ctx()

    # Statement-head dispatch: the first keyword routes to a family
    # handler; inside a family, statement forms are matched with anchored
    # patterns plus paren-/literal-aware body parsing (_match_paren /
    # split_top_level). Unknown heads and unmatched family forms fall
    # through to the peek (one-shot query) path.
    _HEADS = {
        "CREATE": "_exec_create", "DROP": "_exec_drop",
        "INSERT": "_exec_dml", "UPDATE": "_exec_dml", "DELETE": "_exec_dml",
        "REFRESH": "_exec_refresh", "ALTER": "_exec_alter",
        "SUBSCRIBE": "_exec_subscribe", "COPY": "_exec_copy",
        "SHOW": "_exec_show", "EXPLAIN": "_exec_explain",
        "PREPARE": "_exec_session", "EXECUTE": "_exec_session",
        "DEALLOCATE": "_exec_session", "DECLARE": "_exec_session",
        "FETCH": "_exec_session", "CLOSE": "_exec_session",
        "BEGIN": "_exec_session", "START": "_exec_session",
        "COMMIT": "_exec_session", "ROLLBACK": "_exec_session",
    }

    def execute(self, sql: str) -> DataFrame | None:
        """Execute one statement; queries return a DataFrame, DDL returns
        None (SHOW returns a DataFrame listing)."""
        mh = re.match(r"\s*([A-Za-z]+)", sql)
        head = mh.group(1).upper() if mh else ""
        out = getattr(self, self._HEADS.get(head, "_exec_peek"))(sql)
        if out is _NO_MATCH:
            out = self._exec_peek(sql)
            assert out is not _NO_MATCH  # peek always resolves or raises
        return out

    def _exec_create(self, sql: str):
        """CREATE family: view, index, table, sink, source, secret, connection."""
        m = _CREATE_VIEW.match(sql)
        if m:
            _, materialized, name, body = m.groups()
            df = self.spark.sql(rewrite(body))
            if materialized:
                # Batch MV: eagerly refreshed snapshot (REFRESH ON COMMIT
                # analog); the streaming maintenance path is
                # streaming.ivm.MaterializedView.
                snap = df.localCheckpoint(eager=True)
                self._matviews[name] = snap
                self._matview_sql[name] = rewrite(body)
                self.catalog.create_view(name, snap)
                from pyspark.sql import functions as F

                from materialize_spark.streaming.history import RetainedHistory
                hist = RetainedHistory()
                hist.append(snap.withColumn("diff", F.lit(1)), 0)
                self._histories[name] = hist
            else:
                self.catalog.create_view(name, df)
                self._view_sql[name] = rewrite(body)
            return None
        m = _CREATE_INDEX.match(sql)
        if m:
            default, iname, obj, cols = m.groups()
            df = self.catalog.table(obj)
            # CREATE DEFAULT INDEX (or no column list): key on ALL columns —
            # the reference's default-index semantics.
            keys = ([c.strip() for c in cols.split(",")] if cols
                    else list(df.columns))
            self.catalog.create_index(iname or f"{obj}_idx", df, *keys)
            return None
        m = _CREATE_TABLE_AS.match(sql)
        if m:
            name, body = m.groups()
            self.catalog.register_table(
                name, self.spark.sql(rewrite(body)).localCheckpoint(eager=True))
            return None
        m = re.match(r"^\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?"
                     r"(\w+)\s*(\()", sql, re.I)
        if m and not _CREATE_TABLE_AS.match(sql):
            # paren-aware body extraction: nested type parens like
            # decimal(12,2) must not terminate the column list
            if_not_exists, name = m.group(1), m.group(2)
            if if_not_exists and name in self.catalog._tables:
                return None
            open_at = m.start(3)
            close_at = _match_paren(sql, open_at)
            if sql[close_at + 1:].strip() in ("", ";"):
                ddl = _pg_coldefs(sql[open_at + 1:close_at])
                self.catalog.register_table(
                    name, self.spark.createDataFrame([], ddl))
                return None
        m = _CREATE_SINK.match(sql)
        if m:
            # CREATE SINK s FROM obj INTO FILE '<path>' [FORMAT f]
            # [ENVELOPE DEBEZIUM|UPSERT|NONE] — the reference's continuous
            # Kafka/Iceberg sink surface (src/storage-types/src/sinks.rs:
            # 137-140) mapped onto the file writers; the snapshot is written
            # now, REFRESH-driven deltas via sinks.writers.
            name, obj, path, fmt, envelope = m.groups()
            from materialize_spark.sinks.writers import write_sink_snapshot
            df = self.catalog.table(obj)
            write_sink_snapshot(df, path, (fmt or "json").lower(),
                                (envelope or "none").lower())
            self._sinks[name] = {"from": obj, "path": path,
                                 "format": (fmt or "json").lower(),
                                 "envelope": (envelope or "none").lower()}
            return None
        m = _CREATE_SOURCE.match(sql)
        if m:
            name, path, fmt, gen, gen_sf, is_webhook, body_fmt = m.groups()
            if is_webhook:
                # Webhook stand-in (reference statement.rs:52): a spool
                # directory; posts via MzSession.webhook(name).post(...)
                import tempfile

                from materialize_spark.sources.webhook import WebhookSource
                src = WebhookSource(
                    self.spark, tempfile.mkdtemp(prefix=f"mz_webhook_{name}_"),
                    body_format=body_fmt or "json")
                src.on_post = lambda n=name, s=src: \
                    self.catalog.register_table(n, s.df())
                self._webhooks[name] = src
                self.catalog.register_table(name, src.df())
                return None
            if path:
                fmt = (fmt or "parquet").lower()
                if fmt == "debezium":
                    # FORMAT DEBEZIUM: JSON change events {before, after,
                    # op} decoded into explicit diffs and consolidated to
                    # the current collection (reference SourceEnvelope
                    # Debezium, src/storage-types/src/sources/envelope.rs)
                    from pyspark.sql import functions as F

                    from materialize_spark.sources.envelopes import (
                        debezium_decode)
                    probe = self.spark.read.json(path)
                    row_ddl = ", ".join(
                        f"{f.name} {f.dataType.simpleString()}"
                        for f in probe.schema["after"].dataType.fields)
                    updates = debezium_decode(
                        self.spark.read.text(path), "value", row_ddl)
                    data_cols = [c for c in updates.columns if c != "diff"]
                    df = (updates.groupBy(*data_cols)
                          .agg(F.sum("diff").alias("__net"))
                          .filter(F.col("__net") > 0).drop("__net"))
                elif fmt == "csv":
                    df = self.spark.read.csv(path, header=True)
                else:
                    df = self.spark.read.format(fmt).load(path)
            else:
                from materialize_spark.sources.loadgen import load_generator
                kwargs = {"scale_factor": float(gen_sf)} if gen_sf else {}
                df = load_generator(self.spark, gen.lower(), **kwargs)
                if isinstance(df, dict):
                    # multi-output generator (TPCH): one subsource per
                    # table, named <source>_<table> like the reference
                    for sub, sdf in df.items():
                        self.catalog.register_table(f"{name}_{sub}", sdf)
                    return None
            self.catalog.register_table(name, df)
            return None
        m = _CREATE_SECRET.match(sql)
        if m:
            # CREATE SECRET (reference CreateSecretStatement): opaque
            # session-scoped value, referenced by connections; never echoed.
            self._secrets[m.group(1)] = m.group(2)
            return None
        m = _CREATE_CONN.match(sql)
        if m:
            # CREATE CONNECTION name TO KAFKA (BROKER '...', ...) —
            # reference CreateConnectionStatement; options resolve SECRET
            # references and feed the matching reader/sink when used.
            name, kind, opts = m.groups()
            parsed = {}
            for part in split_top_level(opts):
                if not part:
                    continue
                key, _, val = part.partition(" ")
                val = val.strip()
                msec = re.match(r"^SECRET\s+(\w+)$", val, re.I)
                if msec:
                    val = self._secrets[msec.group(1)]
                else:
                    val = val.strip("'")
                parsed[key.strip().lower()] = val
            self._connections[name] = {"type": kind.lower(), **parsed}
            return None
        return _NO_MATCH

    def _exec_drop(self, sql: str):
        """DROP with PG IF EXISTS semantics."""
        m = _DROP.match(sql)
        if m:
            # PG semantics: DROP of a missing object errors; IF EXISTS
            # makes it a no-op.
            self.catalog.drop(m.group(3), if_exists=bool(m.group(2)))
            for store in (self._matviews, self._matview_sql, self._view_sql,
                          self._histories, self._retain):
                store.pop(m.group(3), None)
            return None
        return _NO_MATCH

    def _exec_dml(self, sql: str):
        """Table mutations: INSERT / UPDATE / DELETE."""
        m = _INSERT.match(sql)
        if m:
            name, tail = m.groups()
            target = self.catalog._tables[name]
            if tail.upper().startswith("VALUES"):
                rows = self.spark.sql(
                    f"SELECT * FROM {rewrite(tail)}").toDF(*target.columns)
            else:
                rows = self.spark.sql(rewrite(tail)).toDF(*target.columns)
            # Tables are append-only multisets (reference INSERT semantics);
            # checkpoint so repeated inserts don't grow the plan.
            self.catalog.register_table(
                name, target.unionByName(rows).localCheckpoint(eager=True))
            return None
        m = _UPDATE.match(sql)
        if m:
            # UPDATE t SET c = e, ... [WHERE p] (reference UpdateStatement,
            # src/sql-parser/src/ast/defs/statement.rs:526): rewrite every
            # row in one SELECT — assignments see the OLD row values
            # (simultaneous-assignment semantics), the result keeps the
            # column's original type.
            name, setlist, where = m.groups()
            target = self.catalog._tables[name]
            assigns: dict[str, str] = {}
            for part in split_top_level(setlist):
                col, expr = part.split("=", 1)
                assigns[col.strip().lower()] = rewrite(expr.strip())
            pred = (f"coalesce(({rewrite(where)}), false)" if where else "true")
            types = {f.name.lower(): f.dataType.simpleString()
                     for f in target.schema.fields}
            exprs = []
            for c in target.columns:
                a = assigns.get(c.lower())
                if a is None:
                    exprs.append(c)
                else:
                    exprs.append(f"CASE WHEN {pred} THEN CAST(({a}) AS "
                                 f"{types[c.lower()]}) ELSE {c} END AS {c}")
            self.catalog.register_table(
                name, target.selectExpr(*exprs).localCheckpoint(eager=True))
            return None
        m = _DELETE.match(sql)
        if m:
            # DELETE FROM t [WHERE p] (reference DeleteStatement :558):
            # keep the rows where p is not TRUE (NULL predicate keeps).
            name, where = m.groups()
            target = self.catalog._tables[name]
            kept = (target.limit(0) if where is None else
                    target.filter(f"NOT coalesce(({rewrite(where)}), false)"))
            self.catalog.register_table(
                name, kept.localCheckpoint(eager=True))
            return None
        return _NO_MATCH

    def _exec_refresh(self, sql: str):
        """REFRESH MATERIALIZED VIEW."""
        m = _REFRESH_MV.match(sql)
        if m:
            from pyspark.sql import functions as F

            name = m.group(1)
            old = self._matviews[name]
            snap = self.spark.sql(
                self._matview_sql[name]).localCheckpoint(eager=True)
            self._matviews[name] = snap
            self.catalog.create_view(name, snap)
            hist = self._histories.get(name)
            if hist is not None:
                adds = snap.exceptAll(old).withColumn("diff", F.lit(1))
                rets = old.exceptAll(snap).withColumn("diff", F.lit(-1))
                hist.append(adds.unionByName(rets), hist.upper)
                window = self._retain.get(name)
                if window is not None and hist.upper - 1 - window > hist.since:
                    hist.compact(hist.upper - 1 - window)
            return None
        return _NO_MATCH

    def _exec_alter(self, sql: str):
        """ALTER: RETAIN HISTORY, RENAME TO."""
        m = _ALTER_RETAIN.match(sql)
        if m:
            # ALTER MATERIALIZED VIEW v SET (RETAIN HISTORY FOR n): keep the
            # last n refresh epochs readable via AS OF; older epochs are
            # compacted away (reference AlterRetainHistoryStatement — the
            # duration maps to refresh epochs under our logical clock).
            name, window = m.group(1), int(m.group(2))
            self._retain[name] = window
            hist = self._histories[name]
            if hist.upper - 1 - window > hist.since:
                hist.compact(hist.upper - 1 - window)
            return None
        m = _ALTER_RENAME.match(sql)
        if m:
            old, new = m.groups()
            for store in (self.catalog._views, self.catalog._indexes,
                          getattr(self.catalog._tables, "_loaded",
                                  self.catalog._tables)):
                if old in store:
                    df = store.pop(old)
                    store[new] = df
                    self.spark.catalog.dropTempView(old)
                    df.createOrReplaceTempView(new)
                    return None
            raise KeyError(f"unknown object {old!r}")
        return _NO_MATCH

    def _exec_asof(self, sql: str):
        """Time travel: SELECT/SUBSCRIBE ... AS OF [UP TO]."""
        m = _AS_OF.match(sql)
        if m:
            # SELECT * FROM v AS OF t / SUBSCRIBE v AS OF t [UP TO u]:
            # time travel into the retained changelog. SELECT reconstructs
            # the rows at epoch t; SUBSCRIBE returns the updates strictly
            # after t, bounded below u when UP TO is given (the reference's
            # self-terminating subscribe).
            name, ts, upto = m.group(1), int(m.group(2)), m.group(3)
            hist = self._histories[name]
            if sql.lstrip()[:6].upper() == "SELECT":
                return hist.as_of(ts)
            out = hist.subscribe_since(ts)
            if upto is not None:
                from pyspark.sql import functions as F

                from materialize_spark.streaming.history import TS_COL
                out = out.filter(F.col(TS_COL) < int(upto))
            return out
        return _NO_MATCH

    def _exec_subscribe(self, sql: str):
        """SUBSCRIBE diff streams (+ AS OF route)."""
        out = self._exec_asof(sql)
        if out is not _NO_MATCH:
            return out
        m = _SUBSCRIBE.match(sql)
        if m:
            # Diff stream: first call emits the snapshot (+1 rows); later
            # calls emit changes since the previous SUBSCRIBE (reference
            # SUBSCRIBE = snapshot then updates as frontiers advance).
            # Output modifiers (reference SubscribeOutput,
            # src/sql/src/plan.rs:907-930): WITHIN TIMESTAMP ORDER BY for
            # deterministic per-batch presentation, ENVELOPE UPSERT /
            # DEBEZIUM (KEY (...)) for keyed change shapes.
            from pyspark.sql import functions as F

            name, order_by, env_kind, env_keys = m.groups()
            cur = self.catalog.table(name)
            prev = self._sub_state.get(name)
            if prev is None:
                delta = cur.withColumn("diff", F.lit(1))
            else:
                adds = cur.exceptAll(prev).withColumn("diff", F.lit(1))
                rets = prev.exceptAll(cur).withColumn("diff", F.lit(-1))
                delta = adds.unionByName(rets)
            self._sub_state[name] = cur.localCheckpoint(eager=True)
            if env_kind:
                from materialize_spark.streaming.subscribe import (
                    envelope_debezium, envelope_upsert)
                keys = [k.strip() for k in env_keys.split(",")]
                fn = (envelope_upsert if env_kind.upper() == "UPSERT"
                      else envelope_debezium)
                return fn(delta, keys)
            if order_by:
                from materialize_spark.streaming.subscribe import (
                    within_timestamp_order_by)
                cols = [c.strip() for c in split_top_level(order_by)]
                return within_timestamp_order_by(delta, *cols)
            return delta
        return _NO_MATCH

    def _exec_copy(self, sql: str):
        """COPY ... TO / COPY ... FROM."""
        m = _COPY.match(sql)
        if m:
            body, name, path, fmt = m.groups()
            from materialize_spark.sinks.writers import copy_to

            df = (self.spark.sql(rewrite(body)) if body
                  else self.catalog.table(name))
            copy_to(df, path, (fmt or "parquet").lower())
            return None
        m = _COPY_FROM.match(sql)
        if m:
            # COPY t FROM '<path>' (reference CopyStatement, direction
            # FROM): bulk-append files into a table, schema-aligned to the
            # target (the reference's COPY FROM stdin analog for an engine
            # whose inputs are files).
            name, path, fmt = m.groups()
            target = self.catalog._tables[name]
            fmt = (fmt or "parquet").lower()
            reader = self.spark.read.schema(target.schema)
            rows = (reader.option("header", "true").csv(path)
                    if fmt == "csv" else
                    reader.json(path) if fmt == "json" else
                    self.spark.read.parquet(path))
            self.catalog.register_table(
                name,
                target.unionByName(rows.select(*target.columns))
                .localCheckpoint(eager=True))
            return None
        return _NO_MATCH

    def _exec_show(self, sql: str):
        """SHOW listings: sources/sinks, create, columns, secrets/connections, objects."""
        m = _SHOW_EXT.match(sql)
        if m:
            # SHOW SOURCES / SHOW SINKS over the session's connector state
            kind = m.group(1).lower()
            if kind == "sinks":
                rows = [(n, s["from"], s["format"], s["envelope"])
                        for n, s in sorted(self._sinks.items())]
                return self.spark.createDataFrame(
                    rows or [], "name string, source string, format string,"
                               " envelope string")
            rows = [(n, "webhook") for n in sorted(self._webhooks)]
            return self.spark.createDataFrame(
                rows or [], "name string, type string")
        m = _SHOW_CREATE.match(sql)
        if m:
            # SHOW CREATE (MATERIALIZED) VIEW — reference ShowCreate*
            # statements return (name, create_sql).
            name = m.group(1)
            body = self._matview_sql.get(name)
            kind = "MATERIALIZED VIEW" if body is not None else "VIEW"
            if body is None:
                body = self._view_sql.get(name, "<dataframe-defined>")
            return self.spark.createDataFrame(
                [(name, f"CREATE {kind} {name} AS {body}")],
                "name string, create_sql string")
        m = _SHOW_COLUMNS.match(sql)
        if m:
            # SHOW COLUMNS FROM obj — (name, nullable, type) like the
            # reference's output, in schema position order.
            schema = self.catalog.table(m.group(1)).schema
            return self.spark.createDataFrame(
                [(f.name, f.nullable, f.dataType.simpleString())
                 for f in schema.fields],
                "name string, nullable boolean, type string")
        m = _SHOW_SEC_CONN.match(sql)
        if m:
            if m.group(1).upper() == "SECRETS":
                rows = [(n,) for n in sorted(self._secrets)]
                return self.spark.createDataFrame(rows or [], "name string")
            rows = [(n, c["type"])
                    for n, c in sorted(self._connections.items())]
            return self.spark.createDataFrame(rows or [],
                                              "name string, type string")
        m = _SHOW.match(sql)
        if m:
            kind, like = m.group(1).lower(), m.group(2)
            names = {
                "views": sorted(self.catalog._views),
                "indexes": sorted(self.catalog._indexes),
                "tables": sorted(self.catalog._tables),
            }[kind]
            if like is not None:
                # SQL LIKE pattern over object names (reference SHOW ...
                # LIKE): % = any run, _ = one char
                pat = ("^" + re.escape(like).replace("%", ".*")
                       .replace("_", ".") + "$")
                names = [n for n in names if re.match(pat, n)]
            return self.spark.createDataFrame([(n,) for n in names],
                                              "name string")
        return _NO_MATCH

    def _exec_explain(self, sql: str):
        """EXPLAIN TIMESTAMP / RAW / OPTIMIZED / PHYSICAL."""
        m = _EXPLAIN_TS.match(sql)
        if m:
            # EXPLAIN TIMESTAMP (reference ExplainTimestampStatement):
            # the object's read frontiers — since (compaction) and upper
            # (write) — from its retained history when present, else the
            # always-readable [0, now) window of a static table.
            name = m.group(1)
            hist = self._histories.get(name)
            since = hist.since if hist is not None else 0
            upper = hist.upper if hist is not None else 0
            return self.spark.createDataFrame(
                [(name, since, upper, max(since, upper - 1))],
                "name string, since long, upper long, query_timestamp long")
        m = _EXPLAIN.match(sql)
        if m:
            # Reference EXPLAIN stages (doc/developer/101-query-compilation
            # .md:50-91): RAW = parsed logical plan, OPTIMIZED = after
            # Catalyst rewrites, PHYSICAL (default) = executable plan.
            stage = (m.group(1) or "PHYSICAL").upper()
            qe = self.spark.sql(rewrite(m.group(2)))._jdf.queryExecution()
            text = {
                "RAW": lambda: qe.logical().toString(),
                "OPTIMIZED": lambda: qe.optimizedPlan().toString(),
                "PHYSICAL": lambda: qe.executedPlan().toString(),
            }[stage]()
            return self.spark.createDataFrame(
                [(line,) for line in text.splitlines()], "plan string")
        return _NO_MATCH

    def _exec_session(self, sql: str):
        """Session statements: prepared statements, cursors, transactions."""
        m = _PREPARE.match(sql)
        if m:
            # PREPARE name AS <stmt with $1..$n> (reference
            # PrepareStatement; the pgwire extended protocol surface)
            self._prepared[m.group(1)] = m.group(2)
            return None
        m = _EXECUTE.match(sql)
        if m and m.group(1) in self._prepared:
            name, args = m.groups()
            text = self._prepared[name]
            if args:
                vals = split_top_level(args)
                for i in reversed(range(len(vals))):  # $10 before $1
                    text = text.replace(f"${i + 1}", vals[i].strip())
            return self.execute(text)
        m = _DEALLOCATE.match(sql)
        if m:
            if m.group(1).upper() == "ALL":
                self._prepared.clear()
            else:
                self._prepared.pop(m.group(1), None)
            return None
        m = _DECLARE.match(sql)
        if m:
            # DECLARE c CURSOR FOR q / FETCH [n] c / CLOSE c (reference
            # Declare/Fetch/Close statements): the result set materializes
            # on DECLARE; FETCH walks it in chunks.
            name, body = m.groups()
            df = self.sql(body)
            self._cursors[name] = {"rows": df.collect(),
                                   "schema": df.schema, "pos": 0}
            return None
        m = _FETCH.match(sql)
        if m and m.group(2) in self._cursors:
            count, name = m.groups()
            cur = self._cursors[name]
            n = (len(cur["rows"]) if count is None or count.upper() == "ALL"
                 else int(count))
            chunk = cur["rows"][cur["pos"]:cur["pos"] + n]
            cur["pos"] += len(chunk)
            return self.spark.createDataFrame(chunk, cur["schema"])
        m = _CLOSE.match(sql)
        if m and m.group(1) in self._cursors:
            del self._cursors[m.group(1)]
            return None
        if _TXN_BEGIN.match(sql):
            # Transactions over an immutable-DataFrame catalog are snapshot
            # + restore: BEGIN snapshots the loaded table handles; ROLLBACK
            # reinstates them (DataFrames are immutable, so the snapshot is
            # O(names), not O(data)). Mirrors the reference's
            # all-or-nothing write transactions.
            if self._txn_snapshot is not None:
                raise ValueError("already inside a transaction")
            loaded = getattr(self.catalog._tables, "_loaded",
                             self.catalog._tables)
            self._txn_snapshot = dict(loaded)
            return None
        if _TXN_COMMIT.match(sql):
            if self._txn_snapshot is None:
                raise ValueError("no transaction in progress")
            self._txn_snapshot = None
            return None
        if _TXN_ROLLBACK.match(sql):
            if self._txn_snapshot is None:
                raise ValueError("no transaction in progress")
            loaded = getattr(self.catalog._tables, "_loaded",
                             self.catalog._tables)
            for name in set(loaded) - set(self._txn_snapshot):
                self.spark.catalog.dropTempView(name)
                del loaded[name]
            for name, df in self._txn_snapshot.items():
                loaded[name] = df
                df.createOrReplaceTempView(name)
            self._txn_snapshot = None
            return None
        return _NO_MATCH

    def _exec_peek(self, sql: str):
        """One-shot query path (the reference's peek): WMR fixpoints,
        AS OF time travel, TABLE shorthand, mz_catalog introspection,
        then PG-dialect rewrite into Catalyst under strict (ANSI) error
        semantics."""
        m = _WMR.match(sql)
        if m:
            return self._execute_wmr(m.group(1))
        out = self._exec_asof(sql)
        if out is not _NO_MATCH:
            return out
        if _INTROSPECT.search(sql):
            self._register_introspection()
        m = _TABLE_STMT.match(sql)
        if m:
            # PG `TABLE t` shorthand for SELECT * FROM t
            return self.catalog.table(m.group(1))
        with self._strict():
            return self.spark.sql(rewrite(sql))

    def sql(self, q: str) -> DataFrame:
        out = self.execute(q)
        assert out is not None, "statement returned no relation"
        return out

    def run_script(self, script: str) -> list[DataFrame | None]:
        """Execute a multi-statement script: statements split on top-level
        semicolons (paren- and literal-aware, so ';' inside strings or
        subqueries survives); returns one result per statement."""
        return [self.execute(stmt)
                for stmt in split_top_level(script, ";") if stmt.strip()]

    # -- WITH MUTUALLY RECURSIVE --------------------------------------------
    def _execute_wmr(self, tail: str) -> DataFrame:
        """WITH MUTUALLY RECURSIVE [(RETURN AT RECURSION LIMIT n)]
        b1 (cols) AS (q1), ... SELECT ...

        Reference semantics (MIR LetRec, src/expr/src/relation.rs:154;
        SQL surface test/sqllogictest/with_mutually_recursive.slt):
        bindings start empty, each iteration re-evaluates every binding IN
        ORDER — later bindings see earlier bindings' values from the same
        iteration — until all bindings reach a fixpoint, or until the
        RECURSION LIMIT, whose non-erroring RETURN AT form yields the
        state at that iteration (slt :39). Multiset semantics: any
        DISTINCT/UNION the query wants must be written in the bodies."""
        from materialize_spark.operators.letrec import let_rec

        max_iter = 100
        mopt = re.match(
            r"\s*\(\s*RETURN\s+AT\s+RECURSION\s+LIMIT\s+(\d+)\s*\)", tail,
            re.I)
        if mopt:
            max_iter = int(mopt.group(1))
            tail = tail[mopt.end():]
        bindings, final = _parse_wmr(tail)
        shadowed = [b[0] for b in bindings
                    if b[0] in self.catalog._tables or b[0] in
                    self.catalog._views]
        initial = {
            name: self.spark.createDataFrame([], _pg_coldefs(coldefs))
            for name, coldefs, _ in bindings
        }

        def step(cur):
            env = dict(cur)
            for name, _coldefs, body in bindings:
                for k, v in env.items():
                    v.createOrReplaceTempView(k)
                env[name] = self.spark.sql(rewrite(body))
            return env

        result = let_rec(initial, step, distinct=False,
                         max_iter=max_iter)
        for k, v in result.items():
            v.createOrReplaceTempView(k)
        out = self.spark.sql(rewrite(final))  # analyzed eagerly
        # un-shadow: binding names must not leak over catalog objects
        for name, _coldefs, _body in bindings:
            self.spark.catalog.dropTempView(name)
            if name in shadowed:
                self.catalog.table(name).createOrReplaceTempView(name)
        return out

    # -- introspection relations (mz_catalog) -------------------------------
    def _register_introspection(self) -> None:
        """Materialize the mz_catalog system relations from the live
        catalog as temp views, so plain SELECTs can query them (reference:
        mz_catalog.mz_tables / mz_views / mz_materialized_views /
        mz_indexes / mz_objects / mz_columns — the introspection schema
        documented under doc/user sql/system-catalog). Ids follow the
        reference's `u<N>` user-object scheme, assigned by name order —
        stable within a session snapshot."""
        cat = self.catalog
        objs = []  # (id, name, type)
        named = [("table", n) for n in cat._tables] + \
                [("materialized-view" if n in self._matviews else "view", n)
                 for n in cat._views] + \
                [("index", n) for n in cat._indexes]
        for i, (typ, name) in enumerate(sorted(named, key=lambda t: t[1])):
            objs.append((f"u{i + 1}", name, typ))
        spark = self.spark
        mk = spark.createDataFrame
        mk(objs or [("u0", "", "")], "id string, name string, type string") \
            .filter("id <> 'u0'").createOrReplaceTempView("mz_objects")
        for typ, rel in (("table", "mz_tables"), ("view", "mz_views"),
                         ("materialized-view", "mz_materialized_views"),
                         ("index", "mz_indexes")):
            rows = [(i, n) for (i, n, t) in objs if t == typ]
            df = mk(rows or [("u0", "")], "id string, name string") \
                .filter("id <> 'u0'")
            if rel == "mz_indexes":
                key_rows = [(i, n, ", ".join(cat._index_keys.get(n, [])))
                            for (i, n, t) in objs if t == typ]
                df = mk(key_rows or [("u0", "", "")],
                        "id string, name string, key string") \
                    .filter("id <> 'u0'")
            if rel == "mz_materialized_views":
                rows3 = [(i, n, self._matview_sql.get(n, ""))
                         for (i, n, t) in objs if t == typ]
                df = mk(rows3 or [("u0", "", "")],
                        "id string, name string, definition string") \
                    .filter("id <> 'u0'")
            df.createOrReplaceTempView(rel)
        col_rows = []
        for oid, name, _typ in objs:
            try:
                schema = cat.table(name).schema
            except KeyError:  # pragma: no cover
                continue
            for pos, f in enumerate(schema.fields, start=1):
                col_rows.append((oid, name, f.name, pos, f.nullable,
                                 f.dataType.simpleString()))
        mk(col_rows or [("u0", "", "", 0, True, "")],
           "id string, object_name string, name string, position int, "
           "nullable boolean, type string") \
            .filter("id <> 'u0'").createOrReplaceTempView("mz_columns")
        # connector relations (reference mz_catalog.mz_sources / mz_sinks)
        src_rows = [(f"s{i + 1}", n, "webhook")
                    for i, n in enumerate(sorted(self._webhooks))]
        mk(src_rows or [("s0", "", "")],
           "id string, name string, type string") \
            .filter("id <> 's0'").createOrReplaceTempView("mz_sources")
        sink_rows = [(f"k{i + 1}", n, s["from"], s["format"], s["envelope"])
                     for i, (n, s) in enumerate(sorted(self._sinks.items()))]
        mk(sink_rows or [("k0", "", "", "", "")],
           "id string, name string, source string, format string, "
           "envelope string") \
            .filter("id <> 'k0'").createOrReplaceTempView("mz_sinks")
