"""ENVELOPE UPSERT — key-based upserts/deletes from an append-only feed.

Reference: src/storage/src/upsert.rs (1366 LoC, RocksDB-backed keyed state):
for each key the latest value wins; a null value is a delete.

Spark mapping:
- batch form: DISTINCT ON (key) ORDER BY offset DESC — one shuffle on the
  key (operators/topk.distinct_on).
- streaming form: ``dropDuplicatesWithinWatermark`` when only dedup is
  needed, or stateful latest-per-key via the same distinct_on inside
  foreachBatch merge against the maintained table (state = one row per key,
  exactly the reference's state shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from materialize_spark.operators.topk import distinct_on


def upsert_latest(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    *,
    value_cols: list[str] | None = None,
    delete_when: Column | None = None,
) -> DataFrame:
    """Collapse an append-only change feed to current state.

    ``order_by`` must order newest-first (e.g. [F.col('offset').desc()]).
    Rows matching ``delete_when`` (after collapsing) are tombstones and are
    removed — the upsert envelope's delete semantics.
    """
    latest = distinct_on(df, list(keys), order_by)
    if delete_when is not None:
        latest = latest.filter(~delete_when)
    if value_cols is not None:
        latest = latest.select(*keys, *value_cols)
    return latest


def merge_upsert_batch(state: DataFrame | None, batch_latest: DataFrame,
                       keys: list[str]) -> DataFrame:
    """Merge a batch's latest-per-key rows into maintained state:
    new keys inserted, existing keys replaced (anti-join + union)."""
    if state is None:
        return batch_latest
    kept = state.join(batch_latest.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(batch_latest)
