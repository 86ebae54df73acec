"""SQL front-end: PostgreSQL-dialect surface on Spark SQL.

Reference pipeline: SQL text → AST → HIR → MIR → LIR
(doc/developer/101-query-compilation.md). Here Catalyst *is* the planner;
our front-end work is the dialect delta (reference parser:
src/sql-parser/src/parser.rs) and the catalog-object DDL
(src/sql-parser/src/ast/defs/statement.rs:43-117):

- ``dialect.rewrite``   — PG-isms → Spark SQL (``::`` casts, ``~~``/``~``
  operators, jsonb arrows, generate_series, DISTINCT ON, mz_now()).
- ``MzSession``         — executes DDL (CREATE [MATERIALIZED] VIEW /
  INDEX / DROP / SHOW) against the Catalog and queries via spark.sql.
"""

from materialize_spark.plans.dialect import rewrite
from materialize_spark.plans.sqlfront import MzSession

__all__ = ["rewrite", "MzSession"]
