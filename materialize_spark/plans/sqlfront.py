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
_DROP = re.compile(r"^\s*DROP\s+(VIEW|INDEX|TABLE)\s+(IF\s+EXISTS\s+)?(\w+)\s*$", re.I)
_SHOW = re.compile(r"^\s*SHOW\s+(VIEWS|TABLES|INDEXES)\s*$", re.I)


class MzSession:
    """SQL surface bound to a SparkSession + Catalog."""

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = spark
        self.catalog = Catalog(spark, sf_dir) if sf_dir else Catalog(spark)
        self._matviews: dict[str, DataFrame] = {}

    def execute(self, sql: str) -> DataFrame | None:
        """Execute one statement; queries return a DataFrame, DDL returns
        None (SHOW returns a DataFrame listing)."""
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
                self.catalog.create_view(name, snap)
            else:
                self.catalog.create_view(name, df)
            return None
        m = _CREATE_INDEX.match(sql)
        if m:
            default, iname, obj, cols = m.groups()
            df = self.catalog.table(obj)
            keys = [c.strip() for c in cols.split(",")] if cols else df.columns[:1]
            self.catalog.create_index(iname or f"{obj}_idx", df, *keys)
            return None
        m = _DROP.match(sql)
        if m:
            self.catalog.drop(m.group(3))
            self._matviews.pop(m.group(3), None)
            return None
        m = _SHOW.match(sql)
        if m:
            kind = m.group(1).lower()
            names = {
                "views": sorted(self.catalog._views),
                "indexes": sorted(self.catalog._indexes),
                "tables": sorted(self.catalog._tables),
            }[kind]
            return self.spark.createDataFrame([(n,) for n in names],
                                              "name string")
        return self.spark.sql(rewrite(sql))

    def sql(self, q: str) -> DataFrame:
        out = self.execute(q)
        assert out is not None, "statement returned no relation"
        return out
