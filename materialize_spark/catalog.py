"""Catalog: named time-varying collections and their Spark bindings.

Mirrors the reference's catalog object model (tables / sources / views /
materialized views / indexes / sinks — reference:
src/sql-parser/src/ast/defs/statement.rs:43-117) onto Spark constructs:

- table/source → parquet-backed DataFrame registered as a temp view
- view → stored logical plan (a DataFrame is exactly that)
- materialized view → maintained result table (see streaming/ivm.py)
- index → persisted/cached DataFrame pre-partitioned on the key
  (the reference's "arrangement"; here Catalyst reuses the exchange)

Scale note: dimension tables below the broadcast threshold are marked
broadcastable; query code applies ``F.broadcast`` so 100 TB fact-table joins
never shuffle the fact side on dim joins.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as SQLF

# Driver-provided tables (TESTDATA.md). region/nation are O(10^1-10^2) rows at
# any scale factor → always broadcast. supplier/part/customer grow with SF but
# stay orders of magnitude under lineitem/orders → broadcast decision left to
# AQE + autoBroadcastJoinThreshold unless a query hints otherwise.
TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
ALWAYS_BROADCAST: frozenset[str] = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# DataFrame-handle cache: creating a parquet DataFrame reads file footers
# eagerly; queries re-loading the same tables per call would pay that 10x
# per query. Keyed by session id so a fresh session re-resolves paths.
_TABLE_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def load_tables(spark: SparkSession, sf_dir: str | None = None,
                register: bool = True) -> dict[str, DataFrame]:
    """Load every driver table from ``sf_dir`` and register temp views."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    key = (id(spark), sf_dir)
    if key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        # TIMESTAMP(NANOS) columns arrive as LongType nanos (see session.py);
        # normalize to microsecond timestamps like every other engine reading
        # this file.
        for f in df.schema.fields:
            if name == "events" and f.name == "ts" and f.dataType.simpleString() == "bigint":
                df = df.withColumn(
                    "ts", SQLF.timestamp_micros(SQLF.floor(SQLF.col("ts") / 1000).cast("long")))
        out[name] = df
        if register:
            df.createOrReplaceTempView(name)
    _TABLE_CACHE[key] = out
    return out


@dataclass
class Catalog:
    """Object registry: the engine-side name → DataFrame/plan mapping."""

    spark: SparkSession
    sf_dir: str = DEFAULT_SF_DIR
    _tables: dict[str, DataFrame] = field(default_factory=dict)
    _views: dict[str, DataFrame] = field(default_factory=dict)
    _indexes: dict[str, DataFrame] = field(default_factory=dict)
    _index_keys: dict[str, list[str]] = field(default_factory=dict)

    def __post_init__(self) -> None:
        self._tables = load_tables(self.spark, self.sf_dir)

    # -- tables / sources ---------------------------------------------------
    def table(self, name: str) -> DataFrame:
        if name in self._views:
            return self._views[name]
        if name in self._indexes:
            return self._indexes[name]
        return self._tables[name]

    def register_table(self, name: str, df: DataFrame) -> None:
        self._tables[name] = df
        df.createOrReplaceTempView(name)

    # -- views --------------------------------------------------------------
    def create_view(self, name: str, df: DataFrame) -> None:
        """A view is a stored (lazy) plan — exactly a DataFrame reference."""
        self._views[name] = df
        df.createOrReplaceTempView(name)

    # -- indexes (arrangements) ---------------------------------------------
    def create_index(self, name: str, df: DataFrame, *keys: str) -> DataFrame:
        """Reference 'index' = in-memory arrangement keyed on exprs
        (SURVEY.md §1.3). Spark analog: repartition on the key + persist, so
        later joins/lookups on the key reuse the exchange and the cache.
        """
        arranged = df.repartition(*[df[k] for k in keys]).persist()
        self._indexes[name] = arranged
        self._index_keys[name] = list(keys)
        arranged.createOrReplaceTempView(name)
        return arranged

    def drop(self, name: str) -> None:
        for store in (self._views, self._indexes, self._tables):
            if name in store:
                if store is self._indexes:
                    store[name].unpersist()
                    self._index_keys.pop(name, None)
                del store[name]
                self.spark.catalog.dropTempView(name)
                return
