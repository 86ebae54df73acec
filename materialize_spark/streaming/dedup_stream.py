"""Incrementally maintained deduplication — the IVM treatment of the
pipeline's dedup operators.

A training-data ingest never sees the corpus at once: batches of documents
arrive and each batch must be answered with "which of these are new?"
against everything seen so far. Recomputing exact_dedup over history per
batch is O(history); this operator is the incremental form — per batch
cost O(batch) plus one keyed join against the compacted state, the same
arrangement-backed shape the reference's upsert state machine uses
(src/storage/src/upsert.rs; state = content_hash -> canonical doc).

Works for any scan-side signature: exact (md5 of normalized text), SimHash,
or MinHash band buckets — pass the signature column expression.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from materialize_spark.pipeline.dedup import normalize_text


def _ckpt(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


@dataclass
class IncrementalDeduper:
    """Streaming dedup state: signature -> (canonical_id, n_seen).

    ``on_batch(docs)`` returns the batch's NEW documents (first occurrence
    of their signature, within the batch and against all prior batches)
    and folds the batch into state. ``duplicates()`` reports the running
    per-signature multiplicity for audit.
    """

    spark: SparkSession
    id_col: str = "doc_id"
    text_col: str = "text"
    signature: Column | None = None
    _state: DataFrame | None = field(default=None, init=False)

    def _sig(self) -> Column:
        if self.signature is not None:
            return self.signature
        return F.md5(normalize_text(F.col(self.text_col)))

    def on_batch(self, docs: DataFrame) -> DataFrame:
        """Fold one batch; return its first-seen documents."""
        sigged = docs.withColumn("__sig", self._sig())
        # batch-local first occurrence (min id per signature)
        batch_first = (
            sigged.groupBy("__sig")
            .agg(F.min(self.id_col).alias("__first_id"),
                 F.count(F.lit(1)).alias("__n"))
        )
        if self._state is None:
            fresh = batch_first
            new_state = batch_first.select(
                "__sig", F.col("__first_id").alias("canonical_id"),
                F.col("__n").alias("n_seen"))
        else:
            fresh = batch_first.join(self._state.select("__sig"),
                                     on="__sig", how="left_anti")
            # merge counts; keep the earliest canonical id ever seen
            merged = (
                self._state.unionByName(
                    batch_first.select(
                        "__sig", F.col("__first_id").alias("canonical_id"),
                        F.col("__n").alias("n_seen")))
                .groupBy("__sig")
                .agg(F.min("canonical_id").alias("canonical_id"),
                     F.sum("n_seen").alias("n_seen"))
            )
            new_state = merged
        self._state = _ckpt(new_state)
        first_ids = fresh.select(F.col("__first_id").alias(self.id_col))
        return docs.join(first_ids, on=self.id_col, how="left_semi")

    def duplicates(self) -> DataFrame:
        """Signatures seen more than once: (signature, canonical_id,
        n_seen) — the audit view of what dedup removed."""
        if self._state is None:
            raise RuntimeError("no batches folded yet")
        return (self._state.filter(F.col("n_seen") > 1)
                .select(F.col("__sig").alias("signature"),
                        "canonical_id", "n_seen"))
