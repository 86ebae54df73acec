"""PG-dialect → Spark SQL rewriting, over the lexer's token stream.

The reference parses a PostgreSQL dialect (src/sql-parser/, a sqlparser-rs
fork). Spark SQL already accepts ~95% of it (SURVEY.md §7); this module
closes the gap for the common PG-isms:

| PG                           | Spark                                  |
|------------------------------|----------------------------------------|
| ``expr::type``               | ``CAST(expr AS type)``                 |
| ``a ~~ b`` / ``a !~~ b``     | ``a LIKE b`` / ``a NOT LIKE b``        |
| ``a ~ b`` / ``a !~ b``       | ``a RLIKE b`` / ``NOT a RLIKE b``      |
| ``col ->> 'k'`` / ``-> 'k'`` | ``get_json_object(col, '$.k')``        |
| ``col -> 0``                 | ``get_json_object(col, '$[0]')``       |
| ``generate_series(a, b)``    | ``explode(sequence(a, b))``            |
| ``mz_now()`` / ``now()``     | ``current_timestamp()``                |
| PG type names                | Spark type names (int8→BIGINT, ...)    |
| ``DISTINCT ON (k) ... ORDER BY ...`` | row_number window + rn=1 filter|

Rewrites operate on lexed tokens (plans/lexer.py), not raw text, so a
``->`` or ``::`` inside a string literal or comment is never touched, and
operands with arbitrarily nested parens — ``(a + f(b, c))::int8`` — are
captured exactly. Parenthesized groups are rewritten recursively, so the
DISTINCT ON rewrite also applies inside subqueries.
"""

from __future__ import annotations

from materialize_spark.plans.lexer import LexError, Token, tokens

_PG_TYPES = {
    "int2": "SMALLINT", "int4": "INT", "int8": "BIGINT",
    "float4": "FLOAT", "float8": "DOUBLE",
    "bool": "BOOLEAN", "text": "STRING", "varchar": "STRING",
    "timestamptz": "TIMESTAMP", "jsonb": "STRING", "bytea": "BINARY",
    "numeric": "DECIMAL(38,6)",
}

# Session context threaded in by MzSession before each statement: the
# active role backs CURRENT_USER/SESSION_USER/CURRENT_ROLE, so SET ROLE
# is visible through them (the reference returns the active role,
# src/sql/src/func.rs current_user — a fixed literal was wrong here).
_SESSION: dict[str, str] = {"user": "materialize"}


def set_session_user(name: str) -> None:
    _SESSION["user"] = name


# piece tags that can stand alone as the operand of a postfix operator
_OPERAND_TAGS = ("WORD", "QIDENT", "NUMBER", "STRING", "PARAM", "GROUP")

_LIKE_OPS = {"~~": "LIKE", "~~*": "ILIKE",
             "!~~": "NOT LIKE", "!~~*": "NOT ILIKE"}

# words that can precede a parenthesized group without being a function
# name — `SELECT (a+b)::int` must not pop "SELECT" as part of the operand
_NOT_FUNC_HEADS = frozenset("""
    SELECT WHERE FROM AND OR NOT WHEN THEN ELSE END CASE ON BY AS IN IS
    LIKE ILIKE RLIKE BETWEEN EXISTS ALL ANY SOME DISTINCT UNION INTERSECT
    EXCEPT HAVING GROUP ORDER LIMIT OFFSET JOIN CROSS INNER LEFT RIGHT
    FULL OUTER OVER PARTITION VALUES SET USING RETURNING INTERVAL ESCAPE
    """.split())


def _match_rp(toks: list[Token], i: int) -> int:
    """Index of the RP matching the LP at ``toks[i]``."""
    depth = 0
    for j in range(i, len(toks)):
        if toks[j].kind == "LP":
            depth += 1
        elif toks[j].kind == "RP":
            depth -= 1
            if depth == 0:
                return j
    raise LexError("unbalanced parentheses", toks[i].start)


def _join(pieces: list[tuple[str, str]]) -> str:
    """Reassemble piece texts; dots bind tight (``t.col``, ``1.5`` came in
    as one NUMBER token already), everything else is space-separated —
    whitespace is insignificant to Catalyst's parser."""
    out: list[str] = []
    for tag, text in pieces:
        if tag == "OP" and text == "." and out:
            out[-1] += "."
        elif tag == "COMMA" and out:
            out[-1] += ","
        elif out and out[-1].endswith("."):
            out[-1] += text
        else:
            out.append(text)
    return " ".join(out)


def _split_args(inner: str) -> list[str]:
    """Split a rewritten argument list at top-level commas."""
    parts, buf, depth, lit = [], [], 0, False
    for ch in inner:
        if lit:
            buf.append(ch)
            if ch == "'":
                lit = False
            continue
        if ch == "'":
            lit = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf).strip())
    return parts or [""]


# Spark typeof() names → PG regtype names (reference pg_typeof renders
# the PG type name; src/sql/src/func.rs pg_typeof)
_PG_TYPEOF_MAP = [
    ("tinyint", "smallint"), ("smallint", "smallint"),
    ("int", "integer"), ("bigint", "bigint"),
    ("string", "text"), ("double", "double precision"),
    ("float", "real"), ("boolean", "boolean"), ("date", "date"),
    ("timestamp", "timestamp without time zone"), ("binary", "bytea"),
]


def _pg_typeof_sql(expr: str) -> str:
    arms = " ".join(f"WHEN '{s}' THEN '{p}'" for s, p in _PG_TYPEOF_MAP)
    return (f"(CASE WHEN typeof({expr}) LIKE 'decimal%' THEN 'numeric' "
            f"WHEN typeof({expr}) LIKE 'array%' THEN 'array' "
            f"ELSE CASE typeof({expr}) {arms} "
            f"ELSE typeof({expr}) END END)")


# type OID → PG type name (format_type; OIDs as in sources/pgoutput.py)
_FORMAT_TYPE = {
    16: "boolean", 20: "bigint", 21: "smallint", 23: "integer",
    25: "text", 700: "real", 701: "double precision",
    1042: "character", 1043: "character varying", 1082: "date",
    1114: "timestamp without time zone",
    1184: "timestamp with time zone", 1700: "numeric", 17: "bytea",
}


def _format_type_sql(oid_expr: str) -> str:
    arms = " ".join(f"WHEN {o} THEN '{n}'"
                    for o, n in sorted(_FORMAT_TYPE.items()))
    return f"(CASE ({oid_expr}) {arms} ELSE '???' END)"


def _pop_operand(pieces: list[tuple[str, str]]) -> str:
    """Remove and return the trailing operand expression: a parenthesized
    group (with optional function-name head), or a literal/identifier,
    either extended left through ``.``-qualified chains."""
    if not pieces:
        return ""
    start = len(pieces) - 1
    tag = pieces[start][0]
    if tag == "GROUP" and start > 0 and (
            pieces[start - 1][0] == "QIDENT"
            or (pieces[start - 1][0] == "WORD"
                and pieces[start - 1][1].upper() not in _NOT_FUNC_HEADS)):
        start -= 1          # function call: name ( args )
    # dotted qualification: db . t . col
    while (start >= 2 and pieces[start - 1] == ("OP", ".")
           and pieces[start - 2][0] in ("WORD", "QIDENT")):
        start -= 2
    text = _join(pieces[start:])
    del pieces[start:]
    return text


def _rewrite_slice(toks: list[Token]) -> str:
    pieces: list[tuple[str, str]] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if t.kind == "LP":
            j = _match_rp(toks, i)
            inner = _rewrite_slice(toks[i + 1:j])
            pieces.append(("GROUP", f"({inner})"))
            i = j + 1
            continue
        if t.kind == "WORD":
            low = t.upper
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            if low in ("MZ_NOW", "NOW") and nxt is not None \
                    and nxt.kind == "LP" and i + 2 < len(toks) \
                    and toks[i + 2].kind == "RP":
                # logical-clock reads collapse to the wall clock in batch
                # (reference mz_now, doc/user/.../mz_now; temporal filters
                # that need the frontier use streaming/temporal.py instead)
                pieces.append(("GROUP", "current_timestamp()"))
                i += 3
                continue
            if low == "GENERATE_SERIES" and nxt is not None \
                    and nxt.kind == "LP":
                j = _match_rp(toks, i + 1)
                inner = _rewrite_slice(toks[i + 2:j])
                pieces.append(("GROUP", f"explode(sequence({inner}))"))
                i = j + 1
                continue
            # system-information tail (reference pg-compat builtins,
            # src/sql/src/func.rs): enough for PG tooling probes
            if low in ("CURRENT_USER", "SESSION_USER", "CURRENT_ROLE",
                       "CURRENT_SCHEMA"):
                # keyword form or empty-paren call form
                if nxt is not None and nxt.kind == "LP" \
                        and i + 2 < len(toks) and toks[i + 2].kind == "RP":
                    i += 3
                else:
                    i += 1
                val = ("public" if low == "CURRENT_SCHEMA"
                       else _SESSION.get("user", "materialize"))
                pieces.append(("GROUP", f"'{val}'"))
                continue
            if low == "CURRENT_SCHEMAS" and nxt is not None \
                    and nxt.kind == "LP":
                j = _match_rp(toks, i + 1)
                arg = _rewrite_slice(toks[i + 2:j]).strip().lower()
                arr = ("array('mz_catalog', 'pg_catalog', 'public')"
                       if arg == "true" else "array('public')")
                pieces.append(("GROUP", arr))
                i = j + 1
                continue
            if low == "PG_TYPEOF" and nxt is not None and nxt.kind == "LP":
                j = _match_rp(toks, i + 1)
                inner = _rewrite_slice(toks[i + 2:j])
                pieces.append(("GROUP", _pg_typeof_sql(inner)))
                i = j + 1
                continue
            if low == "FORMAT_TYPE" and nxt is not None \
                    and nxt.kind == "LP":
                j = _match_rp(toks, i + 1)
                args = _split_args(_rewrite_slice(toks[i + 2:j]))
                pieces.append(("GROUP", _format_type_sql(args[0])))
                i = j + 1
                continue
            if low in ("OBJ_DESCRIPTION", "COL_DESCRIPTION") \
                    and nxt is not None and nxt.kind == "LP":
                j = _match_rp(toks, i + 1)
                args = _split_args(_rewrite_slice(toks[i + 2:j]))
                subid = (args[1] if low == "COL_DESCRIPTION"
                         and len(args) > 1 else "0")
                pieces.append(("GROUP",
                               "(SELECT d.description FROM pg_description d"
                               f" WHERE d.objoid = ({args[0]})"
                               f" AND d.objsubid = ({subid}))"))
                i = j + 1
                continue
            if low == "PG_TABLE_IS_VISIBLE" and nxt is not None \
                    and nxt.kind == "LP":
                j = _match_rp(toks, i + 1)
                pieces.append(("GROUP", "true"))
                i = j + 1
                continue
            pieces.append(("WORD", t.text))
            i += 1
            continue
        if t.kind == "OP":
            op = t.text
            if op == "::" and i + 1 < len(toks) \
                    and toks[i + 1].kind == "WORD":
                typ = _PG_TYPES.get(toks[i + 1].text.lower(),
                                    toks[i + 1].text)
                i += 2
                if i < len(toks) and toks[i].kind == "LP":
                    # parameterized type: decimal(12,2)
                    j = _match_rp(toks, i)
                    typ += "(" + _rewrite_slice(toks[i + 1:j]) + ")"
                    i = j + 1
                operand = _pop_operand(pieces)
                pieces.append(("GROUP", f"CAST({operand} AS {typ})"))
                continue
            if op in ("->", "->>") and i + 1 < len(toks) \
                    and toks[i + 1].kind in ("STRING", "NUMBER"):
                key_tok = toks[i + 1]
                path = (f"$[{key_tok.text}]" if key_tok.kind == "NUMBER"
                        else f"$.{key_tok.value}")
                operand = _pop_operand(pieces)
                pieces.append(
                    ("GROUP", f"get_json_object({operand}, '{path}')"))
                i += 2
                continue
            if op in _LIKE_OPS:
                pieces.append(("WORD", _LIKE_OPS[op]))
                i += 1
                continue
            if op == "!~" and pieces and pieces[-1][0] in _OPERAND_TAGS:
                operand = _pop_operand(pieces)
                pieces.append(("WORD", f"NOT {operand} RLIKE"))
                i += 1
                continue
            if op == "~" and pieces and pieces[-1][0] in _OPERAND_TAGS \
                    and i + 1 < len(toks) \
                    and toks[i + 1].kind in ("STRING", "LP"):
                pieces.append(("WORD", "RLIKE"))
                i += 1
                continue
            pieces.append(("OP", t.text))
            i += 1
            continue
        if t.kind == "STRING":
            # PG string literals treat backslash as an ordinary character
            # ('' is the only escape); Spark SQL's parser treats backslash
            # as an escape by default. Re-render the PG-parsed value as a
            # Spark literal so a value like 'C:\tmp' (or an extended-
            # protocol text parameter ending in '\') survives verbatim.
            v = t.value
            pieces.append(
                ("STRING",
                 "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"))
            i += 1
            continue
        pieces.append((t.kind, t.text))
        i += 1
    pieces = _rewrite_distinct_on(pieces)
    return _join(pieces)


def _rewrite_distinct_on(
        pieces: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """SELECT DISTINCT ON (keys) proj FROM rel ORDER BY order →
    row_number() window + rn = 1 filter (the reference plans DISTINCT ON
    as TopK with limit 1 per key group — operators/topk.py is the
    DataFrame version; this is the SQL-text version)."""
    def is_kw(p, w):
        return p[0] == "WORD" and p[1].upper() == w

    if not (len(pieces) > 4 and is_kw(pieces[0], "SELECT")
            and is_kw(pieces[1], "DISTINCT") and is_kw(pieces[2], "ON")
            and pieces[3][0] == "GROUP"):
        return pieces
    keys = pieces[3][1][1:-1]
    try:
        from_i = next(i for i, p in enumerate(pieces) if is_kw(p, "FROM"))
        order_i = next(i for i, p in enumerate(pieces)
                       if is_kw(p, "ORDER") and i + 1 < len(pieces)
                       and is_kw(pieces[i + 1], "BY") and i > from_i)
    except StopIteration:
        return pieces
    proj = _join(pieces[4:from_i])
    rel = _join(pieces[from_i + 1:order_i])
    order = _join(pieces[order_i + 2:])
    return [("GROUP",
             f"SELECT {proj} FROM (SELECT *, row_number() OVER "
             f"(PARTITION BY {keys} ORDER BY {order}) AS __mz_rn "
             f"FROM {rel}) WHERE __mz_rn = 1")]


def rewrite(sql: str) -> str:
    """Rewrite one PG-dialect statement into Spark SQL."""
    try:
        toks = tokens(sql, lenient=True)[:-1]   # drop EOF
    except LexError:
        # Unterminated literal/comment: pass through verbatim and let
        # Catalyst report the syntax error with its own message.
        return sql
    return _rewrite_slice(toks)
