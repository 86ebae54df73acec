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


def _concat(parts: list[DataFrame]) -> DataFrame | None:
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@dataclass
class IncrementalJoinView:
    """An inner equi-join maintained incrementally from two diff streams.

    ``on``: join key column names (present on both sides; all other
    columns must be disjoint). ``on_batch`` takes either side's delta
    (or both) and returns the *output delta* — itself an explicit-diff
    frame, so views chain into multi-way join pipelines.

    State discipline (arrangement-spine, like delta_ivm.py): each side
    is a list of append-only checkpointed PARTS — per batch only the
    delta is written (O(delta)), and every ``compact_every`` batches the
    parts fold into one consolidated frame (amortized O(state)/
    compact_every). Probing an unconsolidated union is multiset-correct:
    a (+1, -1) pair for the same row contributes cancelling output
    deltas. The maintained result is likewise part-accumulated and only
    consolidated on ``result()``.
    """

    on: list[str]
    compact_every: int = 16
    _left: list[DataFrame] = field(default_factory=list, init=False)
    _right: list[DataFrame] = field(default_factory=list, init=False)
    _result: list[DataFrame] = field(default_factory=list, init=False)

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
            self._term(left_delta, _concat(self._right)),  # ΔA ⋈ B_old
            self._term(_concat(self._left), right_delta),  # A_old ⋈ ΔB
            self._term(left_delta, right_delta),           # ΔA ⋈ ΔB
        ]
        terms = [t for t in terms if t is not None]
        for parts, delta in ((self._left, left_delta),
                             (self._right, right_delta)):
            if delta is not None:
                parts.append(delta.localCheckpoint(eager=True))
            if len(parts) >= self.compact_every:  # amortized fold
                folded = _consolidate(None, _concat(parts))
                parts.clear()
                if folded is not None:
                    parts.append(folded)
        if not terms:
            return None
        out = terms[0]
        for t in terms[1:]:
            out = out.unionByName(t)
        out = out.localCheckpoint(eager=True)
        # append the output delta part — result() consolidates lazily,
        # so the per-batch write stays O(delta)
        self._result.append(out)
        if len(self._result) >= self.compact_every:
            folded = _consolidate(None, _concat(self._result))
            self._result.clear()
            if folded is not None:
                self._result.append(folded)
        return out

    def result(self) -> DataFrame:
        """Current maintained join (consolidated, positive multiplicities,
        with the ``diff`` multiplicity column) — accumulated purely from
        output deltas, no re-join of the histories."""
        if not self._result:
            raise RuntimeError("no batches folded yet")
        merged = _consolidate(None, _concat(self._result))
        if merged is None:
            merged = self._result[0].limit(0)
        return merged.filter(F.col(DIFF_COL) > 0)

    def result_expanded(self) -> DataFrame:
        """Maintained join as plain rows (multiplicities expanded)."""
        r = self.result()
        return (
            r.withColumn("__i", F.explode(F.sequence(F.lit(1), F.col(DIFF_COL))))
            .drop(DIFF_COL, "__i")
        )
