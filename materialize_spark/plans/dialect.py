"""PG-dialect → Spark SQL rewriting.

The reference parses a PostgreSQL dialect (src/sql-parser/, a sqlparser-rs
fork). Spark SQL already accepts ~95% of it (SURVEY.md §7); this module
closes the gap for the common PG-isms with token-aware text rewrites:

| PG                           | Spark                                  |
|------------------------------|----------------------------------------|
| ``expr::type``               | ``CAST(expr AS type)``                 |
| ``a ~~ b`` / ``a !~~ b``     | ``a LIKE b`` / ``a NOT LIKE b``        |
| ``a ~ b`` / ``a !~ b``       | ``a RLIKE b`` / ``NOT a RLIKE b``      |
| ``col ->> 'k'`` / ``-> 'k'`` | ``get_json_object(col, '$.k')``        |
| ``generate_series(a, b)``    | ``explode(sequence(a, b))``            |
| ``mz_now()`` / ``now()``     | ``current_timestamp()``                |
| PG type names                | Spark type names (int8→BIGINT, ...)    |
| ``DISTINCT ON (k) ... ORDER BY ...`` | row_number window + rn=1 filter|

Rewrites skip string literals (single-quoted spans are preserved).
"""

from __future__ import annotations

import re

_PG_TYPES = {
    "int2": "SMALLINT", "int4": "INT", "int8": "BIGINT",
    "float4": "FLOAT", "float8": "DOUBLE",
    "bool": "BOOLEAN", "text": "STRING", "varchar": "STRING",
    "timestamptz": "TIMESTAMP", "jsonb": "STRING", "bytea": "BINARY",
    "numeric": "DECIMAL(38,6)",
}

_IDENT = r"[A-Za-z_][A-Za-z_0-9.]*"
# a cast operand: identifier/function call/literal/parenthesized expr
_OPERAND = rf"(?:{_IDENT}\([^()]*\)|{_IDENT}|'[^']*'|\([^()]*\)|[0-9.]+)"


def _split_literals(sql: str) -> list[tuple[bool, str]]:
    """Split into (is_literal, span) segments so rewrites never touch
    quoted strings."""
    out, buf, lit = [], [], False
    i = 0
    while i < len(sql):
        ch = sql[i]
        if ch == "'":
            if lit and i + 1 < len(sql) and sql[i + 1] == "'":
                buf.append("''")
                i += 2
                continue
            buf.append(ch)
            out.append((lit, "".join(buf)))
            buf, lit = [], not lit
            i += 1
            continue
        buf.append(ch)
        i += 1
    if buf:
        out.append((lit, "".join(buf)))
    return out


def _rewrite_code(seg: str) -> str:
    # type names inside CAST/:: targets
    def typ(name: str) -> str:
        return _PG_TYPES.get(name.lower(), name)

    # expr::type  (apply repeatedly for chained casts)
    pat = re.compile(rf"({_OPERAND})\s*::\s*({_IDENT})")
    prev = None
    while prev != seg:
        prev = seg
        seg = pat.sub(lambda m: f"CAST({m.group(1)} AS {typ(m.group(2))})", seg)

    # like/regex operators — starred variants are case-insensitive (ILIKE)
    seg = re.sub(r"\s*!~~\*\s*", " NOT ILIKE ", seg)
    seg = re.sub(r"\s*!~~\s*", " NOT LIKE ", seg)
    seg = re.sub(r"\s*~~\*\s*", " ILIKE ", seg)
    seg = re.sub(r"\s*~~\s*", " LIKE ", seg)
    seg = re.sub(rf"({_OPERAND})\s*!~\s*", r"NOT \1 RLIKE ", seg)
    seg = re.sub(rf"({_OPERAND})\s*~\s*('|\()", r"\1 RLIKE \2", seg)

    # mz_now()/now()
    seg = re.sub(r"\bmz_now\s*\(\s*\)", "current_timestamp()", seg, flags=re.I)
    seg = re.sub(r"\bnow\s*\(\s*\)", "current_timestamp()", seg, flags=re.I)

    # generate_series(a, b[, step]) as a relation or projection
    seg = re.sub(
        r"\bgenerate_series\s*\(", "explode(sequence(", seg, flags=re.I)
    # balance the extra paren we introduced
    seg = _balance_explode_sequence(seg)
    return seg


def _balance_explode_sequence(seg: str) -> str:
    out = []
    i = 0
    needle = "explode(sequence("
    while True:
        j = seg.find(needle, i)
        if j < 0:
            out.append(seg[i:])
            return "".join(out)
        out.append(seg[i:j + len(needle)])
        depth = 2
        k = j + len(needle)
        while k < len(seg) and depth > 1:
            if seg[k] == "(":
                depth += 1
            elif seg[k] == ")":
                depth -= 1
            out.append(seg[k])
            k += 1
        out.append(")")  # close the sequence( we opened
        i = k


_JSON_ARROW = re.compile(
    rf"({_OPERAND})\s*->>?\s*'([^']*)'")


def _rewrite_json_arrows(sql: str) -> str:
    # applied to the full statement (the key is a literal we consume)
    prev = None
    while prev != sql:
        prev = sql
        sql = _JSON_ARROW.sub(
            lambda m: f"get_json_object({m.group(1)}, '$.{m.group(2)}')", sql)
    return sql


_DISTINCT_ON = re.compile(
    r"SELECT\s+DISTINCT\s+ON\s*\(([^)]*)\)\s*(.*?)\s+FROM\s+(.*?)"
    r"\s+ORDER\s+BY\s+(.+)$",
    re.I | re.S,
)


def _rewrite_distinct_on(sql: str) -> str:
    m = _DISTINCT_ON.match(sql.strip())
    if not m:
        return sql
    keys, proj, rel, order = (g.strip() for g in m.groups())
    return (
        f"SELECT {proj} FROM (SELECT *, row_number() OVER "
        f"(PARTITION BY {keys} ORDER BY {order}) AS __mz_rn FROM {rel}) "
        f"WHERE __mz_rn = 1"
    )


def rewrite(sql: str) -> str:
    """Rewrite one PG-dialect statement into Spark SQL."""
    sql = _rewrite_json_arrows(sql)
    segs = _split_literals(sql)
    sql = "".join(s if lit else _rewrite_code(s) for lit, s in segs)
    sql = _rewrite_distinct_on(sql)
    return sql
