"""Incrementally maintained joins over explicit-diff update streams.

Reference: incrementally maintaining multi-way joins is the reference's
central capability — differential dataflow's bilinearity of join:

    Δ(A ⋈ B) = ΔA ⋈ B_old  +  A_old ⋈ ΔB  +  ΔA ⋈ ΔB

(linear join render src/compute/src/render/join/linear_join.rs; the state
kept per side is an arrangement keyed by the join key). Multiplicities
multiply through the join: a row pair's multiplicity is mult_a * mult_b,
which makes deletes (negative diffs) flow through with no special casing.

Spark-first translation: each side's history is a *consolidated* DataFrame
(payload columns + net ``diff``) checkpointed per batch; the three delta
terms are ordinary equi-joins Catalyst plans (broadcast / SMJ as sizes
dictate). Per-batch cost is O(Δ ⋈ state) — never a recompute of the full
join. Binary views compose left-deep for multi-way joins (each output
delta feeds the next view's input), the same shape as the reference's
linear join plans.

State sizing at 100 TB: history frames are the join-key-partitioned net
collections (localCheckpoint here; a real deployment would persist them as
bucketed tables on the join key — sources/bucketing.py — making every
maintenance join shuffle-free).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from materialize_spark.operators.setops import DIFF_COL


def _consolidate(hist: DataFrame | None, delta: DataFrame | None) -> DataFrame | None:
    if delta is None:
        return hist
    both = delta if hist is None else hist.unionByName(delta)
    cols = [c for c in both.columns if c != DIFF_COL]
    return (
        both.groupBy(*cols).agg(F.sum(DIFF_COL).alias(DIFF_COL))
        .filter(F.col(DIFF_COL) != 0)
        .localCheckpoint(eager=True)
    )


@dataclass
class IncrementalJoinView:
    """An inner equi-join maintained incrementally from two diff streams.

    ``on``: join key column names (present on both sides; all other
    columns must be disjoint). ``on_batch`` takes either side's delta
    (or both) and returns the *output delta* — itself an explicit-diff
    frame, so views chain into multi-way join pipelines.
    """

    on: list[str]
    _left: DataFrame | None = field(default=None, init=False)
    _right: DataFrame | None = field(default=None, init=False)
    _result: DataFrame | None = field(default=None, init=False)

    def _term(self, a: DataFrame | None, b: DataFrame | None) -> DataFrame | None:
        if a is None or b is None:
            return None
        al = a.withColumnRenamed(DIFF_COL, "__dl")
        bl = b.withColumnRenamed(DIFF_COL, "__dr")
        return (
            al.join(bl, on=self.on, how="inner")
            .withColumn(DIFF_COL, F.col("__dl") * F.col("__dr"))
            .drop("__dl", "__dr")
        )

    def on_batch(
        self,
        left_delta: DataFrame | None = None,
        right_delta: DataFrame | None = None,
    ) -> DataFrame | None:
        """Fold one batch; returns the join's output delta (or None if no
        output rows changed)."""
        terms = [
            self._term(left_delta, self._right),   # ΔA ⋈ B_old
            self._term(self._left, right_delta),   # A_old ⋈ ΔB
            self._term(left_delta, right_delta),   # ΔA ⋈ ΔB
        ]
        terms = [t for t in terms if t is not None]
        self._left = _consolidate(self._left, left_delta)
        self._right = _consolidate(self._right, right_delta)
        if not terms:
            return None
        out = terms[0]
        for t in terms[1:]:
            out = out.unionByName(t)
        # fold the output delta into the maintained result — result() never
        # re-joins the histories
        self._result = _consolidate(self._result, out)
        return out

    def result(self) -> DataFrame:
        """Current maintained join (consolidated, positive multiplicities,
        with the ``diff`` multiplicity column) — accumulated purely from
        output deltas, no re-join of the histories."""
        if self._result is None:
            raise RuntimeError("no batches folded yet")
        return self._result.filter(F.col(DIFF_COL) > 0)

    def result_expanded(self) -> DataFrame:
        """Maintained join as plain rows (multiplicities expanded)."""
        r = self.result()
        return (
            r.withColumn("__i", F.explode(F.sequence(F.lit(1), F.col(DIFF_COL))))
            .drop(DIFF_COL, "__i")
        )
