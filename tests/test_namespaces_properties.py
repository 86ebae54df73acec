"""Property tests for the two new token scanners: the namespace name
resolver (plans/namespaces.py) and the pgwire parameter substituter
(plans/pgwire.py). Both rewrite SQL text; the properties pin what must
NEVER change under rewriting."""

from hypothesis import given, settings, strategies as st

from materialize_spark.plans.namespaces import NamespaceState, mangle
from materialize_spark.plans.pgwire import (
    MzPgServer, _param_indices,
)

IDENT = st.from_regex(r"[a-z_][a-z0-9_]{0,10}", fullmatch=True)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(
    blacklist_categories=("Cs",), max_codepoint=0x2000), max_size=120))
def test_resolver_is_identity_without_schemas(sql):
    """With no user schemas and default search_path, resolution must be
    a byte-identity on ANY input (including unlexable garbage)."""
    ns = NamespaceState()
    out = ns.resolve_sql(sql, "materialize", ["public"], lambda n: False)
    assert out == sql


@settings(max_examples=100, deadline=None)
@given(IDENT, IDENT, IDENT)
def test_qualified_reference_resolves_and_rest_is_untouched(schema, obj,
                                                            col):
    ns = NamespaceState()
    ns.create_schema("materialize", schema)
    if schema in ("public",):
        return
    m = mangle("materialize", schema, obj)
    sql = f"SELECT {col} FROM {schema}.{obj} WHERE {col} > 0"
    out = ns.resolve_sql(sql, "materialize", ["public"],
                         lambda n, m=m: n == m)
    assert out == f"SELECT {col} FROM {m} WHERE {col} > 0"


@settings(max_examples=100, deadline=None)
@given(IDENT, IDENT)
def test_string_literals_never_rewritten(schema, obj):
    ns = NamespaceState()
    ns.create_schema("materialize", schema)
    if schema == "public":
        return
    m = mangle("materialize", schema, obj)
    sql = f"SELECT '{schema}.{obj}' AS s, \"{schema}\" FROM t"
    out = ns.resolve_sql(sql, "materialize", ["public"],
                         lambda n, m=m: n == m)
    assert f"'{schema}.{obj}'" in out  # literal untouched
    assert f'"{schema}"' in out        # quoted ident untouched


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.text(max_size=20)), min_size=1, max_size=5),
       st.text(alphabet="abc '$12\",.x", max_size=60))
def test_substitute_params_no_placeholder_survives(params, tail):
    """After substitution, no in-range $n placeholder remains outside
    quotes, and the result never raises for in-range placeholders."""
    sql = "SELECT " + ", ".join(
        f"${i + 1}" for i in range(len(params))) + " -- " + tail.replace(
        "$", "")
    vals = [None if p is None else p.encode() for p in params]
    out = MzPgServer._substitute_params(sql, vals, ())
    assert _param_indices(out.split("--")[0]) == []


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=30))
def test_substitute_quotes_single_quotes(value):
    out = MzPgServer._substitute_params("SELECT $1", [value.encode()], ())
    # the produced literal must re-parse as ONE string: quotes doubled
    inner = out[len("SELECT '"):-1]
    assert inner == value.replace("'", "''")


def test_param_indices_skips_quotes_and_dollar_quoted():
    sql = "SELECT $1, '$2', \"$3\", $$ $4 $$, $5"
    assert _param_indices(sql) == ["1", "5"]


def test_substitute_dollar_quoted_untouched():
    out = MzPgServer._substitute_params(
        "SELECT $$body with $1$$, $1", [b"x"], ())
    assert out == "SELECT $$body with $1$$, 'x'"
