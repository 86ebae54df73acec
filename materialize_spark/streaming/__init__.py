"""Streaming runtime: materialized-view maintenance on Structured Streaming.

Reference architecture being re-expressed (SURVEY.md §2.8, §3):

- materialized view  → a streaming query merging per-batch deltas into a
  maintained result table (``ivm.MaterializedView``); reference:
  src/compute/src/sink/materialized_view.rs.
- SUBSCRIBE          → the per-batch (data, diff) stream those merges are
  computed from (``ivm.diff_frames``); reference:
  src/compute/src/sink/subscribe.rs.
- ENVELOPE UPSERT    → key-latest state (``upsert``); reference:
  src/storage/src/upsert.rs.
- temporal filters   → ``temporal.temporal_filter``; reference:
  doc/developer/design/20210426_temporal_filters.md.

Consistency model: each micro-batch is a consistent snapshot boundary —
the Spark analog of the reference's virtual-time guarantee (outputs always
equal the full recompute at some input prefix). Tests assert exactly that
equivalence (incremental == batch recompute).
"""

from materialize_spark.streaming.temporal import temporal_filter
from materialize_spark.streaming.ivm import MaterializedView
from materialize_spark.streaming.upsert import upsert_latest

__all__ = ["temporal_filter", "MaterializedView", "upsert_latest"]
