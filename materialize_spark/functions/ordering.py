"""PostgreSQL ordering semantics.

The reference sorts NULLs LAST on ascending order by default (deliberate
PG-compat choice, src/repr/src/scalar.rs:167-179); Spark's default is nulls
first on ASC. These shims make PG ordering explicit at every sort site.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: str | Column) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def asc_nulls_last(c: str | Column) -> Column:
    return _col(c).asc_nulls_last()


def desc_nulls_first(c: str | Column) -> Column:
    """PG DESC default: nulls first (mirror of ASC nulls last)."""
    return _col(c).desc_nulls_first()


def pg_sort_key(c: str | Column, *, desc: bool = False) -> Column:
    """Sort key with PostgreSQL default null placement."""
    return desc_nulls_first(c) if desc else asc_nulls_last(c)
