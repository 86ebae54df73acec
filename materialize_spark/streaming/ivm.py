"""Incremental view maintenance (IVM) — the reference's core capability.

Reference: a materialized view is a dataflow running forever, writing
incrementally-maintained results to storage
(src/compute/src/sink/materialized_view.rs); updates are (row, time, diff)
triples; SUBSCRIBE exposes the diff stream (src/compute/src/sink/subscribe.rs).

Spark-first design:
- The view definition is an ordinary DataFrame transformation
  ``define(source_df) -> result_df`` — Catalyst plans it; we never
  interpret a plan ourselves.
- Maintenance runs as a Structured Streaming query: each micro-batch the
  transformation is applied and merged into the maintained result table via
  ``foreachBatch`` (update semantics, keyed on the view's grouping key).
- For aggregation views the merge is *incremental*: per-batch partial
  aggregates combine with the stored state (sum/count/min/max combine
  rules), not a recompute over all history — the Spark analog of the
  reference's "Accumulable" reduce plan
  (src/compute-types/src/plan/reduce.rs:89-140).
- The per-batch delta (previous vs new result rows) is the SUBSCRIBE
  (data, diff) stream.

Scale: state lives in the result table keyed by group — shuffle is on the
group key only; per batch cost is O(batch + touched groups), not O(history).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from materialize_spark.operators.setops import DIFF_COL


@dataclass
class MaterializedView:
    """An incrementally maintained view over an append-only source.

    ``combine`` describes, per non-key column, how a stored value merges
    with a batch partial: one of 'sum', 'count', 'min', 'max' (the
    invertible/semigroup aggregates the reference maintains in-place).
    Non-combinable views (e.g. median) fall back to full recompute per
    batch (``combine=None``), the analog of the reference's Basic reduce.
    """

    spark: SparkSession
    define: Callable[[DataFrame], DataFrame]
    keys: list[str]
    combine: dict[str, str] | None = None
    _state: DataFrame | None = field(default=None, init=False)
    _history: DataFrame | None = field(default=None, init=False)

    # -- batch-at-a-time maintenance (foreachBatch body) --------------------
    def on_batch(self, batch_df: DataFrame) -> DataFrame:
        """Fold one micro-batch of source rows into the maintained result;
        returns the (data, diff) delta frame (the SUBSCRIBE output)."""
        if self.combine is None:
            # Basic plan: recompute over accumulated history.
            self._history = (
                batch_df if self._history is None
                else self._history.unionByName(batch_df)
            ).localCheckpoint(eager=True)
            new_state = self.define(self._history).localCheckpoint(eager=True)
        else:
            partial = self.define(batch_df)
            if self._state is None:
                new_state = partial.localCheckpoint(eager=True)
            else:
                new_state = self._merge(self._state, partial).localCheckpoint(eager=True)
        delta = self._delta(self._state, new_state)
        self._state = new_state
        return delta

    def on_state(self, state_df: DataFrame) -> DataFrame:
        """Fold a full *replacement* of the source state and return the
        (data, diff) delta frame.

        ENVELOPE UPSERT sources maintain keyed state that replaces rather
        than appends (reference: src/storage/src/upsert.rs feeding a
        dataflow); for those the view recomputes over the new state and
        diffs against its previous result — same SUBSCRIBE output shape as
        ``on_batch``, without treating the input as an append."""
        new_state = self.define(state_df).localCheckpoint(eager=True)
        delta = self._delta(self._state, new_state)
        self._state = new_state
        self._history = None
        return delta

    def snapshot_state(self) -> tuple[DataFrame | None, DataFrame | None]:
        """Copyable handle to the maintained state. DataFrames are
        immutable, so holding (state, history) IS a snapshot — restoring
        it undoes any number of on_batch/on_state applications (used by
        CoordinatedSource for all-or-nothing multi-view ingest, the
        txn-wal atomic-apply property)."""
        return (self._state, self._history)

    def restore_state(
            self, snap: tuple[DataFrame | None, DataFrame | None]) -> None:
        self._state, self._history = snap

    def result(self) -> DataFrame:
        if self._state is None:
            empty = self.spark.createDataFrame([], self.define(
                self.spark.createDataFrame([], schema=None)).schema)  # pragma: no cover
            return empty
        return self._state

    # -- streaming driver ---------------------------------------------------
    def start(self, stream_df: DataFrame, *, refresh_every: str | None = None,
              **writestream_kwargs):
        """Attach to a streaming DataFrame: one merge per micro-batch.

        ``refresh_every``: None = drain-and-stop (availableNow — the
        one-shot/backfill mode); an interval string ('30 seconds') = keep
        running with a processing-time trigger — the reference's
        ``REFRESH EVERY`` schedule (src/repr/src/refresh_schedule.rs,
        sink src/compute/src/sink/refresh.rs).
        """
        w = (
            stream_df.writeStream
            .outputMode("update")
            .foreachBatch(lambda batch, _epoch: self.on_batch(batch))
        )
        if refresh_every is None:
            w = w.trigger(availableNow=True)
        else:
            w = w.trigger(processingTime=refresh_every)
        return w.start(**writestream_kwargs)

    # -- internals ----------------------------------------------------------
    def _merge(self, state: DataFrame, partial: DataFrame) -> DataFrame:
        s = state.select(
            *[F.col(k) for k in self.keys],
            *[F.col(c).alias(f"__s_{c}") for c in self.combine],
        )
        p = partial.select(
            *[F.col(k) for k in self.keys],
            *[F.col(c).alias(f"__p_{c}") for c in self.combine],
        )
        if self.keys:
            joined = s.join(p, on=self.keys, how="full_outer")
        else:
            # global aggregate (no grouping keys): both sides are <= 1
            # row; a constant join key gives the same full-outer shape
            joined = (s.withColumn("__one", F.lit(1))
                      .join(p.withColumn("__one", F.lit(1)),
                            on="__one", how="full_outer").drop("__one"))
        out_cols = [F.col(k) for k in self.keys]
        for c, how in self.combine.items():
            sc, pc = F.col(f"__s_{c}"), F.col(f"__p_{c}")
            if how in ("sum", "count"):
                merged = F.when(sc.isNull(), pc).when(pc.isNull(), sc).otherwise(sc + pc)
            elif how == "min":
                merged = F.least(sc, pc)
            elif how == "max":
                merged = F.greatest(sc, pc)
            else:
                raise ValueError(f"unknown combine rule {how!r} for column {c!r}")
            out_cols.append(merged.alias(c))
        return joined.select(*out_cols)

    def _delta(self, old: DataFrame | None, new: DataFrame) -> DataFrame:
        """(data, diff) frame: retractions (-1) of replaced rows, additions
        (+1) of new rows — the reference's update-triple output."""
        additions = new if old is None else new.exceptAll(old)
        additions = additions.withColumn(DIFF_COL, F.lit(1))
        if old is None:
            return additions
        retractions = old.exceptAll(new).withColumn(DIFF_COL, F.lit(-1))
        return additions.unionByName(retractions)


def subscribe_collect(delta: DataFrame) -> list[Row]:
    """Materialize a SUBSCRIBE delta frame in deterministic order (test
    helper; the reference orders by time then diff)."""
    data_cols = [c for c in delta.columns if c != DIFF_COL]
    return delta.orderBy(DIFF_COL, *data_cols).collect()
