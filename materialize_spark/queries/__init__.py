"""Query registry — the declared capability inventory.

Each entry is a named query with (a) a Spark-first implementation
(DataFrame API / Spark SQL) and (b) when SQL-expressible, an ANSI-SQL
oracle string DuckDB runs over the same parquet tables. The driver
hash-compares both at sf0.01 (BASELINE.md t2).

Conventions that make the hash comparison meaningful:
- every computed column is aliased identically in Spark and oracle SQL;
- float aggregates are rounded (identically on both sides) so summation
  order cannot flip the last bit;
- integer-valued outputs are cast to BIGINT on both sides;
- temporal outputs are formatted to strings ('yyyy-MM-dd') on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, *tags: str):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the
    registry."""
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags))
        return fn
    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return the
    registry **interleaved across source modules**: the driver harness may
    evaluate only the first N registry entries, so any prefix must span the
    whole operator surface (TPC-H, relational core, scalars, streaming/IVM,
    LLM-pipeline, SQL front-end) instead of front-loading one family."""
    from materialize_spark.queries import (  # noqa: F401
        tpch, tpch2, relational, scalars, events, pipeline, sqlfront,
        collections, surface2, surface3, surface4, surface5, ivm_queries,
        batteries, cdc,
    )
    # The driver harness evaluates only the first ~50 registry entries.
    # The remainder round-robins across modules so any longer evaluation
    # prefix still spans the surface.
    # Rotation policy (VERDICT r9 item 8): driver certification
    # ACCUMULATES across rounds — the cross-round union covers every
    # entry at least once. NOTE: the driver never emitted
    # CORRECTNESS_r10.json, so the r10 window was NEVER driver-run;
    # per VERDICT r10 item 7 the r11 window leads with (a) every entry
    # that has NEVER been driver-certified (the whole r10 capability
    # block plus the r10 behavioral entries), then (b) this round's NEW
    # capabilities (SUBSCRIBE (SELECT ...), UNION ALL delta MVs), then
    # (c) entries whose IMPLEMENTATION changed this round — the publish
    # path now consumes the operator's own output delta (every delta-MV
    # entry), UPDATE/DELETE derive diffs from the predicate, the
    # execute-path SUBSCRIBE moved to push cursors, and sinks read the
    # same commit frames — then (d) the oldest certifications and the
    # flagship spread. Everything else stays green in the local
    # full-registry gate (tools/check.py at sf0.01, 193+ entries).
    priority = [
        # --- (a) never driver-certified (r10 window never ran) ---
        "sqlfront_delta_mv_ast_filter", "sqlfront_delta_mv_ast_subquery",
        "sqlfront_delta_mv_ast_join_subquery",
        "sqlfront_delta_mv_global_topk",
        "kafka_source_include_headers", "kafka_source_continuous_tick",
        "cdc_pgoutput_continuous_tick",
        "sink_kafka_avro_debezium_roundtrip",
        "sqlfront_subscribe_push_cursors",
        # --- (b) round-11 capabilities ---
        "sqlfront_subscribe_query", "sqlfront_delta_mv_union",
        "cdc_pgoutput_via_ssh_tunnel",
        "sqlfront_delta_mv_nested_subquery",
        "sqlfront_delta_mv_nonequi_join",
        "sqlfront_delta_mv_union_agg",
        "sqlfront_delta_mv_except", "sqlfront_delta_mv_intersect",
        "sqlfront_delta_mv_window_agg", "sqlfront_delta_mv_stacked",
        "sqlfront_delta_mv_rank_topk", "sqlfront_delta_mv_global_agg",
        "sqlfront_explain_maintenance",
        "sqlfront_delta_mv_expr_group_keys",
        "sqlfront_delta_mv_window_share",
        "sqlfront_delta_mv_join_from_subquery",
        "sqlfront_delta_mv_distinct_aggs",
        # --- (c) changed implementations this round ---
        "sqlfront_delta_mv", "sqlfront_delta_mv_join",
        "sqlfront_delta_mv_outer_join",
        "sqlfront_update_delete",
        "sink_kafka_upsert_roundtrip", "sink_kafka_avro_roundtrip",
        "sqlfront_create_sink", "sqlfront_http_api",
        "ivm_incremental_join",
        "mv_consistency_frontier",
        # family sentinels keeping the prefix spanning ≥10 modules
        "window_functions", "temporal_filter", "scalar_uuid",
        "agg_statistics", "tablefunc_battery",
        # --- (d) oldest certifications + flagship spread (trimmed to
        # keep the window at 50: the window/scalar/kafka families
        # yielded their slots to this round's capability block — all
        # stay green in the local full-registry gate) ---
        "cdc_pgoutput_wire_apply",
        "tpch_q1", "tpch_q5", "tpch_q13", "tpch_q18", "tpch_q21",
        "dedup_minhash_lsh",
        "simsearch_cosine_topk", "text_language_id",
    ]
    ordered: dict[str, QuerySpec] = {
        name: REGISTRY[name] for name in priority if name in REGISTRY
    }
    by_module: dict[str, list[QuerySpec]] = {}
    for spec in REGISTRY.values():
        if spec.name not in ordered:
            by_module.setdefault(spec.fn.__module__, []).append(spec)
    queues = list(by_module.values())
    while queues:
        remaining = []
        for q in queues:
            spec = q.pop(0)
            ordered[spec.name] = spec
            if q:
                remaining.append(q)
        queues = remaining
    return ordered
