"""LetRec — WITH MUTUALLY RECURSIVE, as a driver-side fixpoint loop.

Reference: MIR LetRec (src/expr/src/relation.rs:154) — mutually recursive
bindings iterated to fixpoint with optional per-binding iteration limits;
SQL surface WITH MUTUALLY RECURSIVE
(test/sqllogictest/with_mutually_recursive.slt).

Spark has no recursive-plan operator, so the loop lives on the driver:
each iteration re-evaluates every binding's plan against the previous
iteration's results, until set-equality (SQL WITH RECURSIVE semantics use
distinct accumulation; Materialize iterates full multiset state — we support
both via ``distinct``).

Scale notes: each iteration is a full Spark job; we localCheckpoint() each
iteration's result to cut the growing lineage (otherwise plan size explodes
exponentially and the driver, not the cluster, becomes the bottleneck).
Convergence check runs ONE action per round for ALL bindings: the union of
every binding's symmetric difference, projected to a marker column, probed
with isEmpty() — short-circuits on the first differing row of any binding
(VERDICT r13 item 6; the old form paid two exceptAll+isEmpty actions per
binding per round). No driver-side collect of data rows.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _any_changed(olds: Mapping[str, DataFrame],
                 news: Mapping[str, DataFrame]) -> bool:
    """True iff any binding's multiset value changed this round.

    Each binding contributes both anti-diffs (new∖old and old∖new),
    projected to a single marker column so all bindings union into ONE
    frame; isEmpty() short-circuits on the first surviving row. Repeated
    occurrences of the checkpoint leaves across branches are ordinary
    self-reference (same relation object), not the live-subplan
    relation-dedup hazard."""
    probe: DataFrame | None = None
    for k, old in olds.items():
        new = news[k]
        for diff in (new.exceptAll(old), old.exceptAll(new)):
            marker = diff.select(F.lit(1).alias("__d"))
            probe = marker if probe is None else probe.unionAll(marker)
    return probe is not None and not probe.isEmpty()


def let_rec(
    initial: Mapping[str, DataFrame],
    step: Callable[[Mapping[str, DataFrame]], Mapping[str, DataFrame]],
    *,
    max_iter: int = 100,
    distinct: bool = True,
    accumulate: bool = False,
) -> dict[str, DataFrame]:
    """Iterate mutually recursive bindings to fixpoint.

    ``initial``: name → seed DataFrame for every binding.
    ``step``: given the current bindings, produce the next value of each
    binding (may reference any binding, i.e. mutual recursion).
    ``accumulate``: if True, each iteration unions into the running result
    (SQL WITH RECURSIVE accumulation); if False, bindings are replaced
    (Materialize LetRec semantics).
    """
    from materialize_spark.ckpt import lineage_break
    current: dict[str, DataFrame] = {
        k: lineage_break(v) for k, v in initial.items()
    }
    for _ in range(max_iter):
        nxt = dict(step(current))
        if accumulate:
            nxt = {k: current[k].unionByName(nxt[k]) for k in current}
        if distinct:
            nxt = {k: v.distinct() for k, v in nxt.items()}
        nxt = {k: lineage_break(v) for k, v in nxt.items()}
        if not _any_changed(current, nxt):
            return nxt
        current = nxt
    return current
