"""SUBSCRIBE output envelopes over (data, diff) delta frames.

Reference: SUBSCRIBE emits per-timestamp update batches; besides raw diffs
it supports `ENVELOPE UPSERT (KEY (...))` and `ENVELOPE DEBEZIUM (KEY
(...))` output modes plus `WITHIN TIMESTAMP ORDER BY`
(src/sql/src/plan.rs:907-930, sink render
src/compute/src/sink/subscribe.rs).

Input here is one batch's delta frame as produced by
streaming/ivm.MaterializedView.on_batch — rows carrying a ``diff`` column
(+1 addition, -1 retraction), at most one addition and one retraction per
key per batch (the maintained collection is keyed).

- **upsert**: one row per changed key — the new value, or NULLs for the
  value columns when the key was deleted (Kafka-compacted-topic tombstone
  shape).
- **debezium**: one row per changed key with ``before`` / ``after``
  structs (either may be NULL), the Debezium change-event shape.

Both are single keyed aggregations over the delta — O(changed keys),
shuffle on the key only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from materialize_spark.operators.setops import DIFF_COL


def _split(delta: DataFrame, keys: list[str]):
    vals = [c for c in delta.columns if c not in keys and c != DIFF_COL]
    adds = delta.filter(F.col(DIFF_COL) > 0).drop(DIFF_COL)
    rets = delta.filter(F.col(DIFF_COL) < 0).drop(DIFF_COL)
    return vals, adds, rets


def envelope_upsert(delta: DataFrame, keys: list[str]) -> DataFrame:
    """Delta → upsert envelope: (keys..., value columns...) with NULL
    values signalling deletion of the key."""
    vals, adds, rets = _split(delta, keys)
    deletes = (
        rets.select(*keys).join(adds.select(*keys), on=keys, how="left_anti")
        .select(*keys, *[F.lit(None).cast(delta.schema[c].dataType).alias(c)
                         for c in vals])
    )
    return adds.select(*keys, *vals).unionByName(deletes)


def envelope_debezium(delta: DataFrame, keys: list[str]) -> DataFrame:
    """Delta → Debezium envelope: (keys..., before struct, after struct)."""
    vals, adds, rets = _split(delta, keys)
    after = adds.select(*keys, F.struct(*vals).alias("after"))
    before = rets.select(*keys, F.struct(*vals).alias("before"))
    return (
        after.join(before, on=keys, how="full_outer")
        .select(*keys, "before", "after")
    )


def within_timestamp_order_by(delta: DataFrame, *order_cols) -> DataFrame:
    """`WITHIN TIMESTAMP ORDER BY`: deterministic presentation order for
    one batch's updates (the reference orders within each timestamp).
    String items may carry ASC/DESC [NULLS FIRST|LAST] suffixes, as the
    SQL front-end hands over raw ORDER BY spans."""
    cols = []
    for oc in order_cols:
        if not isinstance(oc, str):
            cols.append(oc)
            continue
        s = oc.strip()
        up = s.upper()
        nulls = None
        if up.endswith(" NULLS FIRST"):
            s, up, nulls = s[:-12].rstrip(), up[:-12].rstrip(), "first"
        elif up.endswith(" NULLS LAST"):
            s, up, nulls = s[:-11].rstrip(), up[:-11].rstrip(), "last"
        desc = up.endswith(" DESC")
        if desc:
            s = s[:-5].rstrip()
        elif up.endswith(" ASC"):
            s = s[:-4].rstrip()
        c = F.expr(s)
        if desc:
            c = (c.desc_nulls_first() if nulls == "first"
                 else c.desc_nulls_last() if nulls == "last" else c.desc())
        else:
            c = (c.asc_nulls_first() if nulls == "first"
                 else c.asc_nulls_last() if nulls == "last" else c.asc())
        cols.append(c)
    return delta.orderBy(*cols)
