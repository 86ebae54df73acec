"""PG error semantics: operations that must *error*, not NULL.

Reference: scalar evaluation is fallible — division by zero raises
"division by zero" (BinaryFunc Div* eval paths in
src/expr/src/scalar/func.rs), casts raise on overflow/garbage, and the
errors surface to the client. Spark's non-ANSI default silently returns
NULL for x/0 and wraps/nulls bad casts.

Two sanctioned routes, chosen per call site instead of flipping
``spark.sql.ansi.enabled`` globally (which would also change CAST
truncation behavior the TPC-H suite depends on):

- checked_*: embed the error in the expression (when(bad, raise_error)) —
  evaluated branch-lazily in codegen, zero cost on the happy path.
- try-flavored Spark builtins (try_divide, try_cast, try_add) where NULL
  is the *wanted* semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def checked_div(a, b) -> Column:
    """a / b, raising 'division by zero' like the reference/PG."""
    b = _col(b)
    return F.when(b == 0, F.raise_error(F.lit("division by zero"))) \
        .otherwise(_col(a) / b)


def checked_mod(a, b) -> Column:
    b = _col(b)
    return F.when(b == 0, F.raise_error(F.lit("division by zero"))) \
        .otherwise(_col(a) % b)


def checked_cast_long(c) -> Column:
    """Cast to BIGINT, raising on unparseable/overflowing input (PG cast
    semantics) instead of Spark's silent NULL/wrap."""
    c = _col(c)
    tried = c.try_cast("long")
    return F.when(c.isNotNull() & tried.isNull(),
                  F.raise_error(F.concat(F.lit("invalid input for bigint: "),
                                         c.cast("string")))) \
        .otherwise(tried)
