"""Event-stream queries (batch semantics over the events table).

Covers the reference's streaming-SQL idioms in their deterministic batch
form (SURVEY.md §2.8): "windows are data" — tumbling/hopping via date_bin /
date_bin_hopping (src/sql/src/func.rs mz_catalog); temporal filters
(doc/developer/design/20210426_temporal_filters.md) with a logical now();
jsonb operators over the props payload column; monotonic TopK. The live
streaming counterparts (Structured Streaming) are in
materialize_spark/streaming/ and exercised by tests/.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from materialize_spark.functions.datetime import date_bin, date_bin_hopping
from materialize_spark.functions.jsonb import jsonb_get, jsonb_typeof
from materialize_spark.operators import topk
from materialize_spark.queries import register
from materialize_spark.queries.util import T, r2


@register(
    "jsonb_ops",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(count(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                           THEN NULL ELSE 1 END) AS BIGINT) AS n_missing,
           min(json_extract_string(props, '$.k')) AS min_k_text
    FROM events GROUP BY event_type
    """,
    "jsonb",
)
def jsonb_ops(spark, sf_dir):
    t = T(spark, sf_dir)
    k = jsonb_get("props", "k")
    return t.events.groupBy("event_type").agg(
        F.sum(k.cast("long")).cast("long").alias("sum_k"),
        F.count(jsonb_get("props", "missing")).cast("long").alias("n_missing"),
        F.min(k).alias("min_k_text"),
    )


@register(
    "jsonb_typeof_battery",
    """
    SELECT v AS payload, t AS typeof FROM (VALUES
      ('{"a": 1}', 'object'), ('[1,2]', 'array'), ('"s"', 'string'),
      ('3.14', 'number'), ('true', 'boolean'), ('null', 'null')) x(v, t)
    """,
    "jsonb",
)
def jsonb_typeof_battery(spark, sf_dir):
    rows = ['{"a": 1}', "[1,2]", '"s"', "3.14", "true", "null"]
    df = spark.createDataFrame([(r,) for r in rows], ["payload"])
    return df.select("payload", jsonb_typeof("payload").alias("typeof"))


@register(
    "window_tumbling",
    """
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2
    """,
    "window", "date_bin",
)
def window_tumbling(spark, sf_dir):
    t = T(spark, sf_dir)
    return (
        t.events
        .groupBy(
            F.date_format(date_bin("1 hour", "ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


@register(
    "window_hopping",
    """
    -- hopping window: width 1h, hop 15min -> each event in 4 windows
    WITH hops AS (
      SELECT e.*, time_bucket(INTERVAL '15 minutes', ts)
                  - (k.i * INTERVAL '15 minutes') AS window_start
      FROM events e CROSS JOIN (SELECT unnest(range(4)) AS i) k
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total_value
    FROM hops GROUP BY 1
    """,
    "window", "date_bin_hopping",
)
def window_hopping(spark, sf_dir):
    t = T(spark, sf_dir)
    return (
        t.events
        .select("value",
                F.explode(date_bin_hopping("15 minutes", "1 hour", "ts"))
                .alias("ws"))
        .groupBy(F.date_format("ws", "yyyy-MM-dd HH:mm:ss").alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


@register(
    "temporal_filter",
    """
    -- mz_now() temporal filter in batch form: logical now = max(ts);
    -- keep events still in their 3-day validity window
    SELECT event_type, CAST(count(*) AS BIGINT) AS live_events,
           round(sum(value), 4) AS live_value
    FROM events
    WHERE (SELECT max(ts) FROM events)
          BETWEEN ts AND ts + INTERVAL '3 days'
    GROUP BY event_type
    """,
    "temporal-filter",
)
def temporal_filter(spark, sf_dir):
    t = T(spark, sf_dir)
    from materialize_spark.streaming.temporal import temporal_filter as tf
    # logical now = max(ts), kept lazy: broadcast the 1-row aggregate and
    # cross-join it in, instead of a driver-side collect() that serializes
    # an extra job into the query path (same shape tpch_q22 uses).
    now = F.broadcast(t.events.agg(F.max("ts").alias("__now")))
    return (
        tf(t.events.crossJoin(now), valid_from=F.col("ts"),
           valid_until=F.col("ts") + F.expr("INTERVAL 3 DAYS"),
           now=F.col("__now"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("live_events"),
             F.round(F.sum("value"), 4).alias("live_value"))
    )


@register(
    "topk_events_per_user",
    """
    SELECT user_id, event_id, round(value, 4) AS value
    FROM (SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) rn
          FROM events WHERE user_id <= 20) x
    WHERE rn <= 3
    """,
    "topk", "monotonic",
)
def topk_events_per_user(spark, sf_dir):
    t = T(spark, sf_dir)
    return topk(
        t.events.filter(F.col("user_id") <= 20), ["user_id"],
        [F.col("value").desc_nulls_first(), F.col("event_id").asc_nulls_last()],
        limit=3,
    ).select("user_id", "event_id", F.round("value", 4).alias("value"))


@register(
    "sessionization",
    """
    -- gaps-and-islands sessionization, 1h inactivity gap
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '1 hour'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events)
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM marked GROUP BY user_id
    """,
    "session-window",
)
def sessionization(spark, sf_dir):
    t = T(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull()
        | ((F.col("ts").cast("long") - prev.cast("long")) > 3600), 1).otherwise(0)
    return (
        t.events.withColumn("new_session", new_s)
        .groupBy("user_id")
        .agg(F.sum("new_session").cast("long").alias("n_sessions"),
             F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "upsert_envelope_batch",
    """
    -- upsert envelope (key = user_id, latest by ts wins), then aggregate:
    -- batch form of the reference's ENVELOPE UPSERT (src/storage/src/upsert.rs)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
           round(avg(value), 6) AS avg_latest_value
    FROM (SELECT DISTINCT ON (user_id) user_id, event_type, value
          FROM events ORDER BY user_id, ts DESC, event_id DESC) latest
    GROUP BY event_type
    """,
    "upsert", "envelope",
)
def upsert_envelope_batch(spark, sf_dir):
    t = T(spark, sf_dir)
    from materialize_spark.operators import distinct_on
    latest = distinct_on(
        t.events, ["user_id"],
        [F.col("ts").desc_nulls_first(), F.col("event_id").desc_nulls_first()],
    )
    return latest.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg("value"), 6).alias("avg_latest_value"))


@register(
    "window_session",
    """
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events WHERE user_id <= 50),
    sessions AS (
      SELECT user_id, ts, value,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(session_id AS BIGINT) AS session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value
    FROM sessions GROUP BY user_id, session_id
    """,
    "window", "session",
)
def window_session(spark, sf_dir):
    """Sessionization: per-user event sessions split at 30-minute
    inactivity gaps — the session-window aggregate Structured Streaming
    runs with F.session_window; expressed batch-side as gaps-and-islands
    (lag + running sum) so the DuckDB oracle can verify it exactly.
    Scale: two window passes over the same (user_id, ts) sort order —
    one shuffle, the second window reuses the partitioning."""
    from pyspark.sql import Window

    t = T(spark, sf_dir)
    ev = t.events.filter(F.col("user_id") <= 50)
    w = Window.partitionBy("user_id").orderBy("ts")
    ordered = ev.withColumn(
        "is_start",
        F.when(F.lag("ts").over(w).isNull()
               | (F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
                  > 1800), 1).otherwise(0))
    sessions = ordered.withColumn(
        "session_id",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sessions.groupBy(F.col("user_id").cast("long").alias("user_id"),
                         F.col("session_id").cast("long").alias("session_id"))
        .agg(F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss")
             .alias("session_start"),
             F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
    )
