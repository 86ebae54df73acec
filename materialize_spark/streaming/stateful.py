"""Custom stateful streaming operators via applyInPandasWithState.

Reference: for *monotonic* (append-only) inputs the reference picks cheaper
physical plans that keep only the running extremes instead of full change
history — MonotonicTopK / MonotonicTop1
(src/compute-types/src/plan/top_k.rs:28-120) and monotonic min/max
(src/compute-types/src/plan/reduce.rs:253-258). Append-only is Spark
Structured Streaming's native mode, and the state-store-backed
`applyInPandasWithState` is the idiomatic home for "keep the top k seen so
far per group".

Contrast with streaming/retraction.py: that module handles the *non*-
monotonic case (deletes) with a full support table; here state is O(k) per
group — the same plan split the reference makes.

Scale: state lives in the state store keyed by group (RocksDB provider in
production, see session.py), shuffle is one hash exchange on the group
key, and each micro-batch ships only that batch's rows through Arrow to
Python. Per-group state is bounded (k floats + a version counter).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StructField, StructType,
)


def monotonic_topk_stream(
    stream_df: DataFrame,
    keys: list[str],
    order_col: str,
    limit: int,
    *,
    descending: bool = True,
) -> DataFrame:
    """Maintain per-group top-``limit`` values of ``order_col`` (cast to
    double) over an append-only stream.

    Emits, for every group touched in a micro-batch, the group's full
    current top-k annotated with a per-group ``version`` (number of
    batches that updated the group) — consumers take the max-version rows
    per group as the current answer (the SUBSCRIBE-style latest snapshot).
    """
    import pandas as pd  # local import: executor-side dependency

    key_fields = [stream_df.schema[k] for k in keys]
    out_schema = StructType(
        key_fields
        + [StructField(order_col, DoubleType()),
           StructField("version", LongType())]
    )
    state_schema = StructType([
        StructField("version", LongType()),
        StructField("vals", ArrayType(DoubleType())),
    ])

    def fold(key, pdf_iter: Iterator["pd.DataFrame"], state: GroupState):
        if state.exists:
            version, vals = state.get
            vals = list(vals)
        else:
            version, vals = 0, []
        for pdf in pdf_iter:
            vals.extend(float(v) for v in pdf[order_col].dropna())
        vals.sort(reverse=descending)
        vals = vals[:limit]
        version += 1
        state.update((version, vals))
        yield pd.DataFrame({
            **{k: [kv] * len(vals) for k, kv in zip(keys, key)},
            order_col: vals,
            "version": [version] * len(vals),
        })

    projected = stream_df.select(
        *keys, stream_df[order_col].cast("double").alias(order_col))
    return (
        projected.groupBy(*keys)
        .applyInPandasWithState(
            fold, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout)
    )


def latest_per_group(result_df: DataFrame, keys: list[str]) -> DataFrame:
    """From an accumulated update-mode sink, keep each group's rows at its
    highest version — the current maintained answer."""
    from pyspark.sql import functions as F

    mx = (result_df.groupBy(*keys).agg(F.max("version").alias("__vmax"))
          .select(*[F.col(k).alias(f"__k_{k}") for k in keys], "__vmax"))
    cond = [F.col(k) == F.col(f"__k_{k}") for k in keys]
    cond.append(F.col("version") == F.col("__vmax"))
    joined = result_df.join(mx, cond)
    return joined.select(*result_df.columns)
