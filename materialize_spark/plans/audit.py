"""Physical-plan audit helpers: make plan quality testable.

The 100 TB contract isn't "the query returns rows", it's "the plan is the
one you'd want": filters reaching the parquet scan, projections pruned to
the read schema, small dims broadcast, aggregates map-side partial. These
helpers extract those facts from the physical plan so tests can pin them —
a plan regression (a lost pushdown, a broadcast that became a shuffle)
fails CI instead of shipping a 10x slowdown at scale.

Reference counterpart: the reference pins optimizer behavior with golden
EXPLAIN sqllogictests (test/sqllogictest/transform/*.slt); these audits are
the Spark-native equivalent over Catalyst plans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan string (AQE initial plan for formatted mode)."""
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode))


def scans(df: DataFrame) -> list[dict[str, str]]:
    """Per parquet scan: pushed filters and read schema, parsed from the
    formatted explain output."""
    text = physical_plan(df, "formatted")
    out: list[dict[str, str]] = []
    blocks = re.split(r"\n(?=\(\d+\) Scan parquet)", text)
    for block in blocks:
        if not block.lstrip().startswith("("):
            continue
        if "Scan parquet" not in block.splitlines()[0]:
            continue
        info: dict[str, str] = {}
        for field in ("Location", "PushedFilters", "ReadSchema"):
            m = re.search(rf"{field}: (.+)", block)
            if m:
                info[field] = m.group(1).strip()
        out.append(info)
    return out


def operator_counts(df: DataFrame) -> dict[str, int]:
    """Histogram of physical operator names (one entry per plan node)."""
    text = physical_plan(df, "simple")
    counts: dict[str, int] = {}
    for line in text.splitlines():
        # Tree prefix, then an optional whole-stage-codegen marker "*(n) "
        # (present when AQE is off — plans print codegen stage ids inline).
        m = re.match(r"[\s:+*-]*(?:\*\(\d+\)\s*)?([A-Za-z][A-Za-z0-9]+)", line)
        if m:
            op = m.group(1)
            counts[op] = counts.get(op, 0) + 1
    return counts


def read_columns(scan: dict[str, str]) -> set[str]:
    """Column names out of a scan's ReadSchema struct string."""
    schema = scan.get("ReadSchema", "")
    return set(re.findall(r"(\w+):", schema))


def fact_broadcasts(df: DataFrame,
                    facts: tuple[str, ...] = ("lineitem", "orders"),
                    ) -> list[str]:
    """Fact tables whose ROWS are on a broadcast build side — the
    scale-killer plan shape (a driver-built, single-threaded hash relation
    of a table that grows with SF; unrunnable at 100 TB even when the
    filtered subset fits the threshold today).

    A broadcast whose subtree aggregates the fact first (e.g. a HAVING
    key-set subquery) is NOT flagged: the broadcast side is then an
    aggregate result, not fact rows. Walks the executed plan tree via the
    JVM so subtree containment is exact, not string-guessed.
    """
    plan = df._jdf.queryExecution().executedPlan()

    def children(node):
        seq = node.children()
        return [seq.apply(i) for i in range(seq.size())]

    def scans_without_agg(node, facts_seen: list[str]) -> None:
        name = node.nodeName()
        if "Aggregate" in name:  # fact rows already reduced below here
            return
        text = node.simpleString(120)
        for f in facts:
            if ("Scan" in name or "Relation" in name) and f"{f}.parquet" in text:
                facts_seen.append(f)
        for c in children(node):
            scans_without_agg(c, facts_seen)

    offenders: list[str] = []

    def walk(node) -> None:
        if node.nodeName().startswith("BroadcastExchange"):
            seen: list[str] = []
            for c in children(node):
                scans_without_agg(c, seen)
            offenders.extend(sorted(set(seen)))
        for c in children(node):
            walk(c)

    walk(plan)
    return offenders
