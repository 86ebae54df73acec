"""Streaming session windows — native F.session_window aggregation.

Reference: the reference builds sessionization from temporal-filter idioms
(doc/developer/design/20210426_temporal_filters.md — "windows are data");
its batch analog here is queries/events.py window_session (gaps-and-islands,
DuckDB-verified). Spark has a *native* stateful session operator, so the
streaming path uses it directly: state is one (key, open-session) range per
group in the state store, merged as events arrive, closed and emitted once
the watermark passes session end + gap.

Semantics note (edge): F.session_window merges two events when their gap is
strictly less than ``gap``; the batch gaps-and-islands splits when the gap
is strictly greater. Events exactly ``gap`` apart differ — microsecond
event times make ties measure-zero, and the batch/stream equivalence test
uses data without exact-gap ties.

Scale: one shuffle on the session keys; state is O(open sessions per key),
expired by watermark — bounded regardless of stream length. Late rows
beyond the watermark are dropped (documented lateness trade vs the
reference's retraction-exact model, same trade as streaming/joins.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def session_window_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Group ``events`` into per-key sessions split at ``gap`` inactivity.

    Works on both batch and streaming DataFrames (the watermark is applied
    only to streams — batch frames reject withWatermark). Emits one row per
    closed session: keys, session_start, session_end, plus ``aggs``.
    """
    keys = keys or ["user_id"]
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(win, *keys)
        .agg(*aggs)
        .select(
            *keys,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *[F.col(a) for a in _agg_names(aggs)],
        )
    )


def _agg_names(aggs: list[Column]) -> list[str]:
    # Column name via the expression's alias (aggs are required to be
    # aliased — same convention as the query registry).
    names = []
    for a in aggs:
        n = a._jc.toString()
        names.append(n.rsplit(" AS ", 1)[-1].strip("`"))
    return names


def time_window_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    width: str = "1 hour",
    hop: str | None = None,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling (hop=None) or hopping window aggregation over event time.

    The streaming counterpart of the batch date_bin / date_bin_hopping
    model (functions/datetime.py; reference "windows are data" —
    SURVEY §2.8.3): F.window assigns each event to its covering window(s),
    state is per (window, keys) in the state store, closed by watermark.
    A hopping event lands in width/hop windows — same fan-out the batch
    date_bin_hopping sequence+explode produces.

    Works on batch frames too (windows become plain group keys), which is
    what the equivalence test exploits.
    """
    keys = keys or []
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    win = (F.window(F.col(ts_col), width, hop) if hop
           else F.window(F.col(ts_col), width))
    return (
        events.groupBy(win, *keys)
        .agg(*aggs)
        .select(
            *keys,
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[F.col(a) for a in _agg_names(aggs)],
        )
    )
