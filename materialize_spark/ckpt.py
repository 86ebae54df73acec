"""Lineage-break policy for maintained state (the delta-MV hot path).

Every stateful streaming operator breaks lineage with
``DataFrame.localCheckpoint``: state parts, folded supports, table
snapshots and published results would otherwise accumulate plans that
grow with commit count. ``eager=True`` (the historical default) runs one
synchronous Spark job per call — measured with cProfile on
sqlfront_delta_mv_q21_exists at sf0.01, 146 such jobs accounted for
~127 s of a 199 s run: per-commit maintenance cost was dominated by
checkpoint-job latency, not by the actual delta computation
(OPTIMIZATION_r13.md).

``eager=False`` builds the IDENTICAL plan: Spark's ``Dataset.checkpoint``
runs physical planning at call time either way and wraps the result RDD
in the same ``LogicalRDD`` leaf (so every attribute-id / constraint /
relation-dedup behavior downstream is byte-identical); the only
difference is that the eager variant runs ``rdd.count()`` immediately
while the lazy one lets the first downstream action compute-and-persist
the checkpointed RDD as part of its own job. Deferral is value-safe here
because every checkpointed plan in this engine reads only immutable
inputs: literal row frames, prior checkpoints, persisted arrangements,
and append-only spill-tier generations (spill writes always go to a
fresh ``gen<N>`` directory, never overwrite a live one), and
time-dependent expressions are resolved to literals at plan-build time
(tick times are Python datetimes; ``current_timestamp`` is folded by the
optimizer during the checkpoint's own physical planning).

``SPARK_GRAFT_EAGER_CKPT=1`` restores the eager behavior (debugging aid:
it localizes a failure to the commit that built the bad plan).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame

EAGER: bool = os.environ.get("SPARK_GRAFT_EAGER_CKPT", "") == "1"

# Per-session memo of spark.sql.codegen.wholeStage as last READ here.
# Sound because lineage_break is the only engine site that flips the
# conf and it always restores the pre-toggle value before returning.
_CODEGEN: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def _codegen_conf(spark) -> str | None:
    v = _CODEGEN.get(spark)
    if v is None:
        try:
            v = spark.conf.get("spark.sql.codegen.wholeStage")
        except Exception:
            v = "?"
        _CODEGEN[spark] = v
    return v


def lineage_break(df: DataFrame) -> DataFrame:
    """``localCheckpoint`` with the engine-wide eagerness policy.

    The returned frame is tagged ``_mz_leaf`` so the fresh-alias
    ``_ckpt`` helpers can skip re-breaking a frame that IS already a
    checkpoint leaf (each ``localCheckpoint`` costs a full Catalyst
    planning pass — ~50 ms even for a literal frame). Skipping is
    sound: returning the SAME object means the same relation, which
    downstream plans may reference repeatedly (ordinary
    self-reference); the sibling-id hazard needs two DIFFERENT
    relations sharing exprIds, which the fresh-alias path still
    prevents for every newly built part."""
    spark = df.sparkSession
    from materialize_spark.catalog import light_maintenance_plans
    if light_maintenance_plans(spark):
        # Below the planner data gate, the break's whole-stage-codegen
        # compile is pure driver cost (per-commit literals make each
        # generated source novel — the janino cache never hits; measured
        # 6.9 s -> 3.9 s of break time on warm q21_exists, OPTIMIZATION_
        # r14.md). Flip codegen off for THIS plan's physical planning
        # only: the conf is read at executedPlan materialization inside
        # localCheckpoint, so ad-hoc query paths (the headline bench)
        # keep compiled evaluation. Interpreted eval of the tiny
        # maintenance parts is execution-neutral at this scale; above
        # the gate the flag is false and nothing changes.
        # The conf read is memoized per session (module cache below):
        # the get costs 2 py4j roundtrips and this path runs once per
        # lineage break (~111/warm churn entry); only this function
        # flips the conf, so the cached value stays true between
        # breaks and the toggle is 2 sends instead of 4.
        prev = _codegen_conf(spark)
        if prev == "true":
            spark.conf.set("spark.sql.codegen.wholeStage", "false")
            try:
                out = df.localCheckpoint(eager=EAGER)
            finally:
                spark.conf.set("spark.sql.codegen.wholeStage", "true")
        else:
            out = df.localCheckpoint(eager=EAGER)
    else:
        out = df.localCheckpoint(eager=EAGER)
    out._mz_leaf = True
    return out


_FB_SEQ = __import__("itertools").count(1)  # thread-safe unique suffixes


def fresh_break(df: DataFrame) -> DataFrame:
    """Lineage break with FRESH attribute ids, skipping frames that are
    already checkpoint leaves — the shared body of the per-module
    ``_ckpt`` helpers.

    The alias-project is built from ONE SQL string over a short-lived
    temp view (~4 py4j roundtrips) instead of ``toDF(*cols)``, whose
    list conversion costs one roundtrip per column (~12 for a typical
    maintenance frame; measured 1.2k sends/warm churn entry from this
    one site). ``SELECT `c` AS `c` ...`` mints the same per-column
    Alias nodes toDF does, so the fresh-exprId guarantee is identical;
    the view is dropped immediately after ``spark.sql`` captures the
    analyzed plan. Frames with duplicate or backtick-bearing column
    names fall back to toDF (SQL projection would be ambiguous)."""
    if getattr(df, "_mz_leaf", False):
        return df
    cols = df.columns
    if len(set(cols)) == len(cols) and not any("`" in c for c in cols):
        v = f"__mz_fb_{os.getpid()}_{next(_FB_SEQ)}"
        spark = df.sparkSession
        try:
            df.createOrReplaceTempView(v)
            try:
                sel = ", ".join(f"`{c}` AS `{c}`" for c in cols)
                out = spark.sql(f"SELECT {sel} FROM `{v}`")
            finally:
                spark.catalog.dropTempView(v)
            return lineage_break(out)
        except Exception:
            pass  # exotic names/session: the per-column path below
    return lineage_break(df.toDF(*cols))
