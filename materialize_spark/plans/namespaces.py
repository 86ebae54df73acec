"""Database / schema namespaces: 3-part names + search_path resolution.

Reference: full object names are database.schema.item with search_path
resolution (/root/reference/src/sql/src/names.rs PartialItemName →
FullItemName; session vars `database` and `search_path` in
src/sql/src/session/vars.rs). CREATE DATABASE / CREATE SCHEMA are
ordinary DDL (src/sql-parser/src/ast/defs/statement.rs).

Spark-first design: Spark temp views live in one flat namespace, so
namespaced objects are stored under a deterministic mangled flat name
(``__ns__<db>__<schema>__<obj>``); ``materialize.public`` IS the flat
namespace (back-compat: unqualified objects are public objects). A
token-level pre-pass over each statement rewrites qualified references
— and unqualified references that resolve through the session's
search_path — to the mangled names before parsing, so every downstream
component (parser, dialect rewrite, Catalyst) sees plain identifiers.

Resolution rules (PG semantics):
- ``d.s.o``  → mangled, if database ``d`` and schema ``d.s`` exist;
- ``s.o``    → mangled against the CURRENT database, if schema exists
  (``public.o`` → flat ``o``); unknown first parts (table aliases,
  system schemas) are left untouched;
- bare ``o`` → the first schema in search_path that contains ``o``
  wins; ``public`` in the path matches flat catalog objects;
- in CREATE TABLE/VIEW/MATERIALIZED VIEW, an unqualified target is
  created in the FIRST schema of search_path (PG's creation rule).

Scale note: resolution is a per-statement token scan on the driver —
O(statement length), no effect on executed plans.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from materialize_spark.plans.lexer import tokens as _tokens

# schemas whose qualified references other machinery owns (introspection
# shims register pg_catalog/mz_catalog relations as flat temp views)
SYSTEM_SCHEMAS = frozenset(
    {"pg_catalog", "mz_catalog", "mz_internal", "information_schema"})

# statements whose identifiers are namespace DDL, not object references
_SKIP_HEADS = {("create", "database"), ("create", "schema"),
               ("drop", "database"), ("drop", "schema"),
               ("show", None), ("set", None), ("reset", None)}

# CREATE <kw> whose target object should be created in the first
# search_path schema when written unqualified
_CREATE_TARGETS = {"table", "view"}


def mangle(db: str, schema: str, obj: str) -> str:
    if db == "materialize" and schema == "public":
        return obj
    return f"__ns__{db}__{schema}__{obj}"


class NamespaceState:
    """Session-scoped database/schema registry + name resolver."""

    def __init__(self) -> None:
        self.databases: set[str] = {"materialize"}
        self.schemas: set[tuple[str, str]] = {("materialize", "public")}

    # -- DDL -----------------------------------------------------------------
    def create_database(self, name: str, *, if_not_exists: bool = False,
                        ) -> None:
        if name in self.databases:
            if if_not_exists:
                return
            raise KeyError(f"database {name!r} already exists")
        self.databases.add(name)
        self.schemas.add((name, "public"))  # PG creates public with the db

    def create_schema(self, db: str, name: str, *,
                      if_not_exists: bool = False) -> None:
        if db not in self.databases:
            raise KeyError(f"unknown database {db!r}")
        if (db, name) in self.schemas:
            if if_not_exists:
                return
            raise KeyError(f"schema {db}.{name!r} already exists")
        self.schemas.add((db, name))

    def drop_database(self, name: str) -> list[str]:
        """Remove the database; returns the mangled-name prefixes whose
        objects the caller must drop."""
        if name == "materialize":
            raise PermissionError("cannot drop the default database")
        self.databases.discard(name)
        dropped = [s for d, s in self.schemas if d == name]
        self.schemas = {(d, s) for d, s in self.schemas if d != name}
        return [f"__ns__{name}__{s}__" for s in dropped]

    def drop_schema(self, db: str, name: str) -> str:
        if (db, name) == ("materialize", "public"):
            raise PermissionError("cannot drop materialize.public")
        if (db, name) not in self.schemas:
            raise KeyError(f"unknown schema {db}.{name}")
        self.schemas.discard((db, name))
        return f"__ns__{db}__{name}__"

    # -- resolution ----------------------------------------------------------
    def resolve_sql(self, sql: str, current_db: str,
                    search_path: Iterable[str],
                    exists: Callable[[str], bool]) -> str:
        """Rewrite qualified + search_path-resolved names to mangled flat
        identifiers. Leaves the statement byte-identical when nothing
        resolves (the common case: one tokenize, no rewrite)."""
        try:
            toks = _tokens(sql, lenient=True)
        except Exception:
            return sql
        words = [t for t in toks if t.kind == "WORD"]
        head = words[0].upper.lower() if words else ""
        sub = words[1].upper.lower() if len(words) > 1 else None
        if (head, sub) in _SKIP_HEADS or (head, None) in _SKIP_HEADS:
            return sql
        path = [s for s in search_path if s]

        out: list[str] = []
        last_end = 0
        i = 0
        creation_slot = self._creation_slot(toks)
        # FROM-list state: paren depths at which we are inside a FROM
        # table list, so the second table of "FROM a, b" (prev token is a
        # comma, not FROM) still resolves. A depth leaves the set when a
        # clause keyword (WHERE/GROUP/...) ends the list at that depth or
        # its RP closes.
        depth = 0
        from_depths: set[int] = set()
        _FROM_ENDERS = {"WHERE", "GROUP", "HAVING", "ORDER", "LIMIT",
                        "OFFSET", "WINDOW", "UNION", "EXCEPT", "INTERSECT",
                        "SET", "RETURNING", "FETCH", "FOR", "VALUES",
                        "SELECT"}
        while i < len(toks):
            t = toks[i]
            if t.kind == "LP":
                depth += 1
                i += 1
                continue
            if t.kind == "RP":
                from_depths.discard(depth)
                depth -= 1
                i += 1
                continue
            if t.kind != "WORD":
                i += 1
                continue
            if t.upper == "FROM":
                from_depths.add(depth)
            elif t.upper in _FROM_ENDERS:
                from_depths.discard(depth)
            # dotted chain? collect WORD (. WORD)*
            chain = [t]
            j = i
            while (j + 2 < len(toks) and toks[j + 1].kind == "OP"
                   and toks[j + 1].text == "."
                   and toks[j + 2].kind == "WORD"):
                chain.append(toks[j + 2])
                j += 2
            # never rewrite mid-chain starts: ensured because we always
            # consume whole chains (i jumps past them). A chain's object
            # reference is its PREFIX (db.schema.obj[.column] or
            # schema.obj[.column]); trailing parts are copied verbatim.
            repl = None
            consumed = 0
            low = [c.text.lower() for c in chain]
            is_ddl = head in ("create", "drop", "alter")
            if len(chain) >= 2 and low[0] not in SYSTEM_SCHEMAS:
                if (len(chain) >= 3 and low[0] in self.databases
                        and (low[0], low[1]) in self.schemas):
                    m = mangle(low[0], low[1], chain[2].text)
                    if is_ddl or exists(m):
                        repl, consumed = m, 3
                if repl is None and (current_db, low[0]) in self.schemas:
                    m = mangle(current_db, low[0], chain[1].text)
                    # require existence outside DDL so a table alias that
                    # happens to share a schema name is not captured
                    if is_ddl or exists(m):
                        repl, consumed = m, 2
            if len(chain) == 1:
                prev = toks[i - 1] if i > 0 else None
                # search_path applies only in table-reference position
                # (a bare column name must never be captured by a
                # same-named table in the path)
                table_pos = (prev is not None
                             and ((prev.kind == "WORD"
                                   and prev.upper in ("FROM", "JOIN",
                                                      "INTO", "UPDATE",
                                                      "TABLE", "COPY"))
                                  or (prev.kind == "COMMA"
                                      and depth in from_depths)))
                if i == creation_slot and path and path[0] != "public":
                    if (current_db, path[0]) in self.schemas:
                        repl = mangle(current_db, path[0], t.text)
                elif table_pos:
                    for s in path:
                        if s == "public":
                            if exists(t.text):
                                break
                            continue
                        if (current_db, s) not in self.schemas:
                            continue
                        m = mangle(current_db, s, t.text)
                        if exists(m):
                            repl = m
                            break
            if repl is not None:
                out.append(sql[last_end:chain[0].start])
                out.append(repl)
                last_end = chain[consumed - 1 if consumed else -1].end
            i = j + 1 if len(chain) > 1 else i + 1
        if not out:
            return sql
        out.append(sql[last_end:])
        return "".join(out)

    @staticmethod
    def _creation_slot(toks) -> int:
        """Token index of an unqualified CREATE target (PG creates it in
        the first search_path schema), or -1."""
        words = [(k, t) for k, t in enumerate(toks) if t.kind == "WORD"]
        if not words or words[0][1].upper != "CREATE":
            return -1
        k = 1
        # skip OR REPLACE / MATERIALIZED / TEMP modifiers
        while k < len(words) and words[k][1].upper in (
                "OR", "REPLACE", "MATERIALIZED", "TEMP", "TEMPORARY"):
            k += 1
        if k >= len(words) or words[k][1].upper.lower() not in \
                _CREATE_TARGETS:
            return -1
        k += 1
        # skip IF NOT EXISTS
        while k < len(words) and words[k][1].upper in ("IF", "NOT",
                                                       "EXISTS"):
            k += 1
        return words[k][0] if k < len(words) else -1
