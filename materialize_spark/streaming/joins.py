"""Stream-stream and stream-table joins (Structured Streaming).

Reference: joins over streams are stateful arrangements on both inputs
(SURVEY.md §2.8.5; render src/compute/src/render/join/). The reference
keeps *unbounded* state (retractions make it exact forever); Spark bounds
state with **watermarks + event-time range conditions** — the documented
consistency trade (per-micro-batch, bounded lateness) vs the reference's
virtual-time exactness.

- stream_stream_join: inner equi-join of two event-time streams; both
  sides watermarked, join condition includes a time-band predicate so the
  state store can expire rows (state ~ watermark window x key cardinality,
  not history).
- stream_table_join: stream enriched against a (slowly changing) batch
  dimension — the reference's stream x indexed-table join; the dim side is
  broadcast per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    left_time: str,
    right_time: str,
    watermark: str = "10 minutes",
    band: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streaming DataFrames on equality keys + a time band.

    ``band`` bounds |left_time - right_time|; with both watermarks set the
    state store provably drops rows older than watermark + band — the
    knob that keeps join state finite at 100 TB/day ingest.
    """
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    cond: Column = F.lit(True)
    for c in on:
        cond = cond & (lw[c] == rw[c])
    cond = cond & (
        rw[right_time].between(
            lw[left_time] - F.expr(f"INTERVAL {band}"),
            lw[left_time] + F.expr(f"INTERVAL {band}"))
    )
    return lw.join(rw, cond, how)


def stream_table_join(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Enrich a stream against a batch dimension (broadcast per batch)."""
    return stream.join(F.broadcast(dim), on=on, how=how)
