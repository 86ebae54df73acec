"""Lexer/parser unit tests: statement structure the old regex front-end
could not handle — comments anywhere, quoted identifiers, string literals
containing keywords/semicolons/parens, nested parens, error positions.

Pure-Python (no SparkSession): these run in milliseconds.
"""

import pytest

from materialize_spark.plans import parser as ast
from materialize_spark.plans.lexer import LexError, split_statements, tokens
from materialize_spark.plans.parser import ParseError, parse_statement


def kinds(sql):
    return [t.kind for t in tokens(sql)]


def test_lexer_basic_tokens():
    ts = tokens("SELECT a, 'it''s' FROM t WHERE x >= 1.5e2")
    assert [t.kind for t in ts] == [
        "WORD", "WORD", "COMMA", "STRING", "WORD", "WORD", "WORD",
        "WORD", "OP", "NUMBER", "EOF"]
    assert ts[3].value == "it's"          # '' unescaped
    assert ts[8].text == ">="             # maximal munch


def test_lexer_comments_skipped():
    ts = tokens("SELECT 1 -- trailing ; comment with 'quote\n"
                "/* block ; /* nested */ still */ , 2")
    assert [t.kind for t in ts] == ["WORD", "NUMBER", "COMMA", "NUMBER",
                                    "EOF"]


def test_lexer_quoted_identifier():
    ts = tokens('SELECT "weird ""name""" FROM t')
    assert ts[1].kind == "QIDENT"
    assert ts[1].value == 'weird "name"'


def test_lexer_pg_operators():
    ts = tokens("a::int8 ~~* b ->> 'k' !~ c")
    ops = [t.text for t in ts if t.kind == "OP"]
    assert ops == ["::", "~~*", "->>", "!~"]


def test_lexer_errors_carry_position():
    with pytest.raises(LexError) as e:
        tokens("SELECT 'unterminated")
    assert e.value.pos == 7


def test_split_statements_ignores_literals_and_comments():
    script = ("INSERT INTO t VALUES ('a;b');  -- comment; with semicolon\n"
              "SELECT 1")
    assert split_statements(script) == [
        "INSERT INTO t VALUES ('a;b')", "SELECT 1"]


def test_parse_create_view_body_with_tricky_literal():
    # a ')' and an AS inside a string literal must not end the body
    node = parse_statement(
        "CREATE MATERIALIZED VIEW v AS SELECT ') AS x' AS s FROM t")
    assert isinstance(node, ast.CreateView)
    assert node.materialized
    assert node.body == "SELECT ') AS x' AS s FROM t"


def test_parse_create_table_nested_type_parens():
    node = parse_statement(
        "CREATE TABLE t (a decimal(12,2), b map<string,int>, c string)")
    assert isinstance(node, ast.CreateTable)
    assert node.coldefs == "a decimal(12,2), b map<string,int>, c string"


def test_parse_create_table_comment_inside_coldefs():
    node = parse_statement(
        "CREATE TABLE t (\n  a int, -- the key\n  b string\n)")
    assert isinstance(node, ast.CreateTable)
    assert "-- the key" in node.coldefs  # raw span; lexer guided the parens


def test_parse_update_where_in_subquery_not_statement_where():
    node = parse_statement(
        "UPDATE t SET a = (SELECT max(x) FROM s WHERE s.k = t.k), b = 2 "
        "WHERE c > 0")
    assert isinstance(node, ast.Update)
    assert node.assignments == [
        ("a", "(SELECT max(x) FROM s WHERE s.k = t.k)"), ("b", "2")]
    assert node.where == "c > 0"


def test_parse_subscribe_forms():
    n1 = parse_statement("SUBSCRIBE TO v AS OF 3 UP TO 7")
    assert (n1.name, n1.as_of, n1.up_to) == ("v", 3, 7)
    n2 = parse_statement(
        "SUBSCRIBE v ENVELOPE UPSERT (KEY (k1, k2))")
    assert n2.envelope == "upsert" and n2.envelope_keys == ["k1", "k2"]
    n3 = parse_statement("SUBSCRIBE v WITHIN TIMESTAMP ORDER BY a, b DESC")
    assert n3.order_by == ["a", "b DESC"]


def test_parse_wmr_bindings():
    node = parse_statement(
        "WITH MUTUALLY RECURSIVE (RETURN AT RECURSION LIMIT 5) "
        "nums (n int) AS (SELECT 1 UNION SELECT n + 1 FROM nums), "
        "evens (n int) AS (SELECT n FROM nums WHERE n % 2 = 0) "
        "SELECT max(n) FROM evens")
    assert isinstance(node, ast.Wmr)
    assert node.limit == 5
    assert [b[0] for b in node.bindings] == ["nums", "evens"]
    assert node.final == "SELECT max(n) FROM evens"


def test_parse_query_heads_are_peek():
    assert isinstance(parse_statement("SELECT 1 + 1"), ast.Peek)
    assert isinstance(parse_statement("WITH c AS (SELECT 1) TABLE c"),
                      ast.Peek)
    assert isinstance(parse_statement("(SELECT 1) UNION (SELECT 2)"),
                      ast.Peek)
    assert isinstance(parse_statement("VALUES (1), (2)"), ast.Peek)


def test_parse_select_as_of_fast_path():
    node = parse_statement("SELECT * FROM mv AS OF 2")
    assert isinstance(node, ast.SelectAsOf)
    assert (node.name, node.ts) == ("mv", 2)
    # anything beyond the exact shape is a plain query
    assert isinstance(parse_statement("SELECT * FROM mv AS OF x"), ast.Peek)


def test_parse_errors_name_the_position():
    with pytest.raises(ParseError) as e:
        parse_statement("CREATE SINK s FROM v INTO FILE")  # missing path
    assert "string literal" in str(e.value)
    with pytest.raises(ParseError) as e2:
        parse_statement("DROP WIDGET w")
    assert "WIDGET" in str(e2.value) and "position" in str(e2.value)


def test_parse_copy_and_connection():
    node = parse_statement(
        "COPY (SELECT a FROM t WHERE b = ';)') TO '/tmp/x' "
        "WITH (FORMAT csv)")
    assert isinstance(node, ast.CopyTo)
    assert node.body == "SELECT a FROM t WHERE b = ';)'"
    assert node.fmt == "csv"
    conn = parse_statement(
        "CREATE CONNECTION k TO KAFKA (BROKER 'b:9092', PASSWORD SECRET p)")
    assert isinstance(conn, ast.CreateConnection)
    assert ("broker", "b:9092", False) in conn.options
    assert ("password", "p", True) in conn.options  # SECRET reference


def test_parse_prepare_execute_params():
    p = parse_statement("PREPARE q AS SELECT * FROM t WHERE a = $1 AND "
                        "b = $2")
    assert isinstance(p, ast.Prepare)
    assert "$1" in p.body
    e = parse_statement("EXECUTE q ('x, y', 2)")
    assert isinstance(e, ast.Execute)
    assert e.args == ["'x, y'", "2"]  # comma inside the literal survives


# -- dialect rewriter (token-based) robustness ------------------------------

def test_rewrite_arrow_inside_literal_untouched():
    from materialize_spark.plans.dialect import rewrite

    # the old regex rewriter ran the json-arrow rewrite on raw text and
    # would corrupt a '->' inside a string literal
    out = rewrite("SELECT 'a -> b' AS s, props ->> 'k' FROM t")
    assert "'a -> b'" in out
    assert "get_json_object(props, '$.k')" in out


def test_rewrite_cast_of_nested_parens():
    from materialize_spark.plans.dialect import rewrite

    out = rewrite("SELECT (a + f(b, (c - d)))::int8 FROM t")
    # whitespace is insignificant to Catalyst; compare modulo spaces
    assert out.replace(" ", "") == "SELECTCAST((a+f(b,(c-d)))ASBIGINT)FROMt"


def test_rewrite_cast_parameterized_type():
    from materialize_spark.plans.dialect import rewrite

    assert rewrite("x::decimal(12,2)") == "CAST(x AS decimal(12, 2))"


def test_rewrite_json_array_index():
    from materialize_spark.plans.dialect import rewrite

    assert rewrite("j -> 0") == "get_json_object(j, '$[0]')"


def test_rewrite_distinct_on_in_subquery():
    from materialize_spark.plans.dialect import rewrite

    out = rewrite("SELECT n FROM (SELECT DISTINCT ON (k) n FROM t "
                  "ORDER BY k, v DESC) q")
    assert "row_number() OVER (PARTITION BY k ORDER BY k, v DESC)" in out


def test_rewrite_comment_stripped():
    from materialize_spark.plans.dialect import rewrite

    out = rewrite("SELECT a::int4 -- cast ::int8 here\nFROM t")
    assert "CAST(a AS INT)" in out and "int8" not in out


def test_subscribe_query_form():
    n = parse_statement("SUBSCRIBE (SELECT k, sum(v) AS t FROM x GROUP BY k)")
    assert n.query == "SELECT k, sum(v) AS t FROM x GROUP BY k"
    assert n.name == ""
    n2 = parse_statement("SUBSCRIBE (SELECT a FROM b) WITH (SNAPSHOT = false)")
    assert n2.query == "SELECT a FROM b" and n2.snapshot is False
