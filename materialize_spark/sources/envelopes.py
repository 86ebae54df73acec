"""Source envelopes: how raw records become updates.

Reference: SourceEnvelope {None, Upsert, CdcV2} + Debezium upsert style
(src/storage-types/src/sources/envelope.rs:24-40,76); upsert state machine
src/storage/src/upsert.rs.

- ENVELOPE NONE     → append-only passthrough.
- ENVELOPE UPSERT   → key-latest collapse (streaming/upsert.py).
- ENVELOPE DEBEZIUM → decode the {before, after, op} JSON envelope into
  (data, diff)-style updates: op c/r/u(after) = insert, op d(before) =
  delete, u additionally retracts before. That is exactly the reference's
  CdcV2 (data, time, diff) triple with diff ∈ {+1, -1}.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

ENVELOPE_NONE = "none"
ENVELOPE_UPSERT = "upsert"
ENVELOPE_DEBEZIUM = "debezium"


def debezium_decode(df: DataFrame, value_col: str | Column,
                    row_schema: StructType | str) -> DataFrame:
    """Debezium JSON → explicit-diff update frame.

    Input rows carry a JSON document {"before": {...}|null,
    "after": {...}|null, "op": "c"|"r"|"u"|"d"}. Output: one row per
    retraction/addition with a ``diff`` column (+1/-1) and the payload
    columns flattened — feed to operators.setops.threshold / the IVM merge.
    """
    v = value_col if isinstance(value_col, Column) else F.col(value_col)
    if isinstance(row_schema, StructType):
        row_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                            for f in row_schema.fields)
    else:
        row_ddl = row_schema
    env_schema = (f"before struct<{row_ddl}>, after struct<{row_ddl}>, "
                  f"op string")
    parsed = df.select(F.from_json(v, env_schema).alias("env"))
    additions = (
        parsed.filter(F.col("env.op").isin("c", "r", "u"))
        .select("env.after.*").withColumn("diff", F.lit(1))
    )
    retractions = (
        parsed.filter(F.col("env.op").isin("u", "d"))
        .select("env.before.*").withColumn("diff", F.lit(-1))
    )
    return additions.unionByName(retractions)
