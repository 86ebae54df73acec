"""TopK and DISTINCT ON.

Reference: MIR TopK (src/expr/src/relation.rs:255 — group keys + order +
limit expr + offset) rendered by a 1157-LoC bucketed reduction tree
(src/compute/src/render/top_k.rs). Under Spark's batch model the same
semantics is a rank window + filter; Catalyst compiles it to a partial
top-k sort per partition before the shuffle when limits are literal, which
matches the reference's "MonotonicTopK" fast path.

Scale: the window shuffles once on the group keys. For a global top-k
(no keys) we use orderBy().limit() which Spark executes as per-partition
top-k + single-reducer merge — no full sort of 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk(
    df: DataFrame,
    group_key: list[str | Column],
    order_by: list[Column],
    limit: int,
    offset: int = 0,
) -> DataFrame:
    """Per-group top-k with optional offset.

    PostgreSQL/Materialize null ordering is NULLS LAST for ASC — callers
    should build ``order_by`` with ``asc_nulls_last``/``desc_nulls_first``
    (see functions/ordering.py) to match.
    """
    if not group_key:
        # Global top-k: let Spark's TakeOrderedAndProject handle it.
        out = df.orderBy(*order_by)
        if offset:
            out = out.offset(offset)
        return out.limit(limit)
    w = Window.partitionBy(*group_key).orderBy(*order_by)
    rank_col = F.row_number().over(w)
    return (
        df.withColumn("__mz_topk_rank", rank_col)
        .filter((F.col("__mz_topk_rank") > offset)
                & (F.col("__mz_topk_rank") <= offset + limit))
        .drop("__mz_topk_rank")
    )


def distinct_on(
    df: DataFrame,
    distinct_key: list[str | Column],
    order_by: list[Column],
) -> DataFrame:
    """PostgreSQL DISTINCT ON: first row per key under the given order.

    The reference plans this as TopK with limit 1
    (src/sql/src/plan/query.rs:2688-2706); so do we.
    """
    return topk(df, distinct_key, order_by, limit=1)
