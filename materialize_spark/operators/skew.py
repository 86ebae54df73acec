"""Skew-aware join: salting for heavy-hitter keys.

At 100 TB a handful of hot keys (the null/default key, a celebrity user, a
spam domain) can put one shuffle partition hours behind the rest. Spark's
AQE skew-join splitting (spark.sql.adaptive.skewJoin, on by default in
session.py) handles sort-merge joins automatically; explicit salting is for
the cases AQE can't rewrite — e.g. when the skewed side must also feed a
keyed aggregation, or the join is planned before AQE statistics exist
(streaming micro-batches).

Technique: append a salt in [0, S) to the skewed side's key (deterministic
hash of the whole row — no rand(), so retries/replays stay consistent) and
replicate the other side S times. The hot key's rows now spread over S
partitions; output is identical to the unsalted join.

The reference has no direct analog (timely exchanges hash per-record and
arrangement keys are chosen by the optimizer; skew is a known operational
limit) — this is Spark-native engineering the 100 TB goal requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Join ``skewed`` (large, hot-keyed) with ``other`` (large — else just
    broadcast), equality keys ``on``. Supported how: inner, left.

    Cost: ``other`` is replicated ``salt`` times (explode before shuffle),
    so pick the smaller side as ``other`` and size ``salt`` to the worst
    key's share: a key holding p of all rows needs salt ≈ p * partitions to
    level out.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted = skewed.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*skewed.columns), F.lit(salt)))
    replicated = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = salted.join(replicated, on=on + [SALT_COL], how=how)
    return out.drop(SALT_COL)
