"""Delta maintenance for non-invertible view shapes.

The reference maintains HAVING-threshold semijoins and anti-joins
*incrementally*: arrangements index each input by key, and an arriving or
retracted row re-evaluates only the affected keys (delta-join pathways:
/root/reference/src/compute/src/render/join/delta_join.rs:1; reduce
retractions: /root/reference/src/compute/src/render/reduce.rs). Before this
module the engine maintained those shapes by full recompute (the Basic
plan), whose refresh lag scales with BASE size; these operators bring lag
down to O(batch + state of touched keys).

Spark-first translation — no per-row Python, every join keyed:

- State lives in checkpointed DataFrames keyed by the view key.
- The per-batch "touched keys" set is tiny (bounded by the batch), so it is
  **broadcast** into semi/anti joins against the state: the state is never
  shuffled, only linearly scanned in memory (the Spark analog of an
  arrangement probe — Spark has no point index, but a broadcast-hash probe
  over a checkpointed in-memory table is scan-only, shuffle-free, and
  independent of the ORIGINAL base relation's width).
- Dimension enrichment joins broadcast the (tiny) changed-key side, so the
  dim table is hash-probed, never shuffled.

Scale note (100 TB): per-batch cost is O(batch) shuffle + O(|state|)
in-memory scan + checkpoint. |state| is proportional to the number of
DISTINCT KEYS, not base rows — for q18/q21 shapes that is #orders, already
orders of magnitude below lineitem. On a real cluster the state tables
would be bucketed by key so the scan prunes too.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from materialize_spark.operators.setops import DIFF_COL


def _ckpt(df: DataFrame) -> DataFrame:
    """Break lineage each batch so the plan stays O(1) across batches."""
    return df.localCheckpoint(eager=True)


@dataclass
class ThresholdSemijoinMV:
    """``... WHERE key IN (SELECT key FROM fact GROUP BY key
    HAVING sum(val) > T)`` maintained incrementally (tpch q18 shape).

    The grouped sums are accumulable (diff arithmetic); only keys touched
    by the batch are re-thresholded, and only keys whose qualification
    status or sum changed have their output rows re-derived via ``enrich``
    (the dimension join producing the final view rows).

    ``enrich(qualified)`` receives (keys + ``sum_col``) for the CHANGED
    qualifying keys only — it must return the final view rows and keep the
    key columns so replaced rows can be retired. The changed side is tiny:
    broadcast it in the enrich join.
    """

    spark: SparkSession
    keys: list[str]
    val: str
    having: Callable[[Column], Column]  # sum column -> boolean Column
    enrich: Callable[[DataFrame], DataFrame]
    sum_col: str = "__sum"
    _sums: DataFrame | None = field(default=None, init=False)
    _result: DataFrame | None = field(default=None, init=False)

    def on_batch(self, delta: DataFrame) -> DataFrame:
        """Fold one explicit-diff update frame (fact rows + ``diff``);
        return the maintained view."""
        d = F.col(DIFF_COL)
        partial = delta.groupBy(*self.keys).agg(
            F.sum(F.when(F.col(self.val).isNotNull(), F.col(self.val) * d)
                  .otherwise(F.lit(0))).alias(self.sum_col),
            F.sum(d).alias("__net"))
        touched = F.broadcast(partial.select(*self.keys))

        if self._sums is None:
            merged = partial
            untouched = None
        else:
            prev = self._sums.join(touched, on=self.keys, how="left_semi")
            untouched = self._sums.join(touched, on=self.keys,
                                        how="left_anti")
            p = partial.select(
                *self.keys,
                F.col(self.sum_col).alias("__p_sum"),
                F.col("__net").alias("__p_net"))
            merged = (prev.join(F.broadcast(p), on=self.keys,
                                how="full_outer")
                      .select(*self.keys,
                              (F.coalesce(F.col(self.sum_col), F.lit(0))
                               + F.coalesce("__p_sum", F.lit(0)))
                              .alias(self.sum_col),
                              (F.coalesce(F.col("__net"), F.lit(0))
                               + F.coalesce("__p_net", F.lit(0)))
                              .alias("__net")))
        live = merged.filter(F.col("__net") != 0)
        self._sums = _ckpt(live if untouched is None
                           else untouched.unionByName(live))

        qualified = (live.filter((F.col("__net") > 0)
                                 & self.having(F.col(self.sum_col)))
                     .select(*self.keys, self.sum_col))
        new_rows = self.enrich(F.broadcast(qualified))
        if self._result is None:
            self._result = _ckpt(new_rows)
        else:
            kept = self._result.join(touched, on=self.keys, how="left_anti")
            self._result = _ckpt(kept.unionByName(new_rows))
        return self._result

    def result(self) -> DataFrame:
        if self._result is None:
            raise RuntimeError("no batches folded yet")
        return self._result


@dataclass
class ExclusiveAntiJoinMV:
    """Per-(group, member) "only flagged member of a multi-member group"
    maintained incrementally (tpch q21 shape: the only supplier of a
    multi-supplier order whose shipments ran late).

    Semantics over (group_key, member_key) support counts:
    a pair qualifies iff

    - ``n_flag > 0``                       (it has flagged rows),
    - ``tot_all  - n_all  > 0``            (EXISTS another member's row),
    - ``tot_flag - n_flag = 0``            (NOT EXISTS another flagged
                                            member — the anti-join).

    ``on_batch(all_delta, flag_delta)`` takes two explicit-diff frames of
    (group, member, diff): every fact row, and the flagged subset. Only
    groups present in the batch are re-evaluated; the maintained output
    carries ``n_flag`` (the pair's flagged-row multiplicity — q21 counts
    each late row, not each pair).

    Reference: delta-join + semijoin count maintenance
    (/root/reference/src/compute/src/render/join/delta_join.rs:1,
    src/compute/src/render/reduce.rs accumulable counts).
    """

    spark: SparkSession
    group_key: str
    member_key: str
    _supp: DataFrame | None = field(default=None, init=False)
    _wait: DataFrame | None = field(default=None, init=False)

    def _batch_supp(self, all_delta: DataFrame | None,
                    flag_delta: DataFrame | None) -> DataFrame:
        g, m, d = self.group_key, self.member_key, F.col(DIFF_COL)
        if all_delta is None and flag_delta is None:
            raise ValueError("on_batch needs at least one delta frame")
        parts = []
        if all_delta is not None:
            parts.append(all_delta.select(
                g, m, d.alias("__d_all"), F.lit(0).alias("__d_flag")))
        if flag_delta is not None:
            parts.append(flag_delta.select(
                g, m, F.lit(0).alias("__d_all"), d.alias("__d_flag")))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.groupBy(g, m).agg(
            F.sum("__d_all").alias("n_all"),
            F.sum("__d_flag").alias("n_flag"))

    def on_batch(self, all_delta: DataFrame | None = None,
                 flag_delta: DataFrame | None = None) -> DataFrame:
        g, m = self.group_key, self.member_key
        batch = self._batch_supp(all_delta, flag_delta)
        touched = F.broadcast(batch.select(g).distinct())

        if self._supp is None:
            merged = batch.filter((F.col("n_all") != 0)
                                  | (F.col("n_flag") != 0))
            untouched = None
        else:
            prev = self._supp.join(touched, on=[g], how="left_semi")
            untouched = self._supp.join(touched, on=[g], how="left_anti")
            merged = (prev.unionByName(batch)
                      .groupBy(g, m)
                      .agg(F.sum("n_all").alias("n_all"),
                           F.sum("n_flag").alias("n_flag"))
                      .filter((F.col("n_all") != 0)
                              | (F.col("n_flag") != 0)))
        self._supp = _ckpt(merged if untouched is None
                           else untouched.unionByName(merged))

        # re-evaluate the touched groups only (merged == their new support)
        tot = merged.groupBy(g).agg(F.sum("n_all").alias("__tot_all"),
                                    F.sum("n_flag").alias("__tot_flag"))
        wait_t = (merged.join(tot, on=[g])
                  .filter((F.col("n_flag") > 0)
                          & (F.col("__tot_all") - F.col("n_all") > 0)
                          & (F.col("__tot_flag") - F.col("n_flag") == 0))
                  .select(g, m, "n_flag"))
        if self._wait is None:
            self._wait = _ckpt(wait_t)
        else:
            kept = self._wait.join(touched, on=[g], how="left_anti")
            self._wait = _ckpt(kept.unionByName(wait_t))
        return self._wait

    def result(self) -> DataFrame:
        """(group, member, n_flag) qualifying pairs."""
        if self._wait is None:
            raise RuntimeError("no batches folded yet")
        return self._wait
