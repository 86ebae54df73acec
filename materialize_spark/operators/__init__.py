"""Relational operators: the reference's 16-variant MIR algebra
(src/expr/src/relation.rs:99-309) as DataFrame combinators.

Most variants are 1:1 with a DataFrame method (Project→select, Map→
withColumns, Filter→filter, Join→join, Reduce→groupBy.agg, Union→unionAll);
this package implements the ones that need composition:

- ``topk``           — MIR TopK (src/expr/src/relation.rs:255)
- ``distinct_on``    — DISTINCT ON (src/sql/src/plan/query.rs:2688-2706)
- ``threshold`` / ``negate`` / diff-aware set ops — MIR Negate/Threshold
  (src/expr/src/relation.rs:278-288)
- ``let_rec``        — MIR LetRec / WITH MUTUALLY RECURSIVE
  (src/expr/src/relation.rs:154)
- table functions    — MIR FlatMap (src/expr/src/relation.rs:190)
"""

from materialize_spark.operators.topk import topk, distinct_on
from materialize_spark.operators.setops import (
    negate, threshold, union_diffs, except_all, intersect_all,
)
from materialize_spark.operators.letrec import let_rec
from materialize_spark.operators.tablefuncs import (
    generate_series, unnest, with_ordinality, regexp_extract_rows,
)

__all__ = [
    "topk", "distinct_on",
    "negate", "threshold", "union_diffs", "except_all", "intersect_all",
    "let_rec",
    "generate_series", "unnest", "with_ordinality", "regexp_extract_rows",
]
