"""Round-13 TPC-H completion: the last four shapes (q2, q9, q12,
q16). With these, all 22 TPC-H query shapes delta-maintain — ten
verbatim texts and twelve column-adapted shapes (adaptation is column
substitution only, never structure; the synthetic testdata lacks
partsupp and some comment/phone/shipmode columns).

Reference: test/sqllogictest/tpch_create_materialized_view.slt
maintains all 22 texts. Every check here compares the maintained
result against DuckDB recomputing the SAME SQL after identical churn.
"""

import duckdb
import pytest


def _mz(spark, sf=None):
    from materialize_spark.plans.sqlfront import MzSession
    return MzSession(spark) if sf is None else MzSession(spark, sf)


SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _restore_sf_tables(spark):
    """These soaks CHURN the shared sf-backed tables — drop the loaded
    frames after each test so the next reader re-reads pristine
    parquet (same isolation as test_r13_tpch_gaps)."""
    yield
    per = getattr(spark, "_materialize_spark_tables", {})
    tabs = per.get(SF)
    if tabs is not None:
        for name in list(tabs._loaded):
            tabs._loaded.pop(name)
        tabs.register_all()


def _oracle(s, tables):
    con = duckdb.connect()
    for t in tables:
        pdf = s.sql(f"SELECT * FROM {t}").toPandas()
        con.register(f"_{t}_pd", pdf)
        con.execute(f"CREATE TABLE {t} AS SELECT * FROM _{t}_pd")
        for col, dt in zip(pdf.columns, pdf.dtypes):
            if "datetime64" in str(dt):
                con.execute(f"ALTER TABLE {t} ALTER {col} "
                            "TYPE TIMESTAMP")
    return con


def _rnd(row):
    return tuple(round(x, 4) if isinstance(x, float) else x
                 for x in row)


def _soak(s, name, body, tables, churn):
    s.execute(f"CREATE MATERIALIZED VIEW {name} WITH "
              f"(MAINTENANCE 'delta') AS {body}")
    con = _oracle(s, tables)

    def check(step):
        got = sorted(_rnd(tuple(r)) for r in
                     s.sql(f"SELECT * FROM {name}").collect())
        exp = sorted(_rnd(tuple(r)) for r in
                     con.execute(body).fetchall())
        assert got == exp, (step, got[:4], exp[:4])

    check("initial")
    for sql in churn:
        s.execute(sql)
        con.execute(sql)
        check(sql)
    s.execute(f"DROP MATERIALIZED VIEW {name}")


Q12 = """
SELECT l_returnflag,
       sum(case when o_orderpriority = '1-URGENT'
                  or o_orderpriority = '2-HIGH' then 1 else 0 end)
           AS high_line_count,
       sum(case when o_orderpriority <> '1-URGENT'
                 and o_orderpriority <> '2-HIGH' then 1 else 0 end)
           AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_returnflag IN ('A', 'N')
  AND l_shipdate >= DATE '1995-01-01'
GROUP BY l_returnflag
"""


def test_q12_case_sums_and_in_list(spark):
    """q12 shape: IN-list literal filter + disjunctive/conjunctive
    CASE sums maintain under churn on both join sides."""
    _soak(_mz(spark, SF), "q12c", Q12, ["orders", "lineitem"], [
        "DELETE FROM lineitem WHERE l_orderkey % 7 = 0",
        "INSERT INTO lineitem SELECT * FROM lineitem "
        "WHERE l_partkey % 13 = 1",
        "DELETE FROM orders WHERE o_custkey % 11 = 3",
    ])


Q16 = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#45'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_name LIKE '%0001%')
GROUP BY p_brand, p_type, p_size
"""


def test_q16_count_distinct_not_in(spark):
    """q16 shape: COUNT(DISTINCT) over a three-column group composed
    with an uncorrelated NOT IN; churn touches all three tables —
    including the membership side (supplier inserts can newly exclude
    suppliers)."""
    _soak(_mz(spark, SF), "q16c", Q16,
          ["lineitem", "part", "supplier"], [
        "DELETE FROM lineitem WHERE l_suppkey % 5 = 0",
        "INSERT INTO supplier SELECT * FROM supplier "
        "WHERE s_suppkey % 9 = 2",
        "DELETE FROM part WHERE p_partkey % 6 = 1",
    ])


Q9 = """
SELECT n_name AS nation, extract(year FROM o_orderdate) AS o_year,
       sum(l_extendedprice * (1 - l_discount)) AS sum_profit
FROM part, supplier, lineitem, orders, nation
WHERE s_suppkey = l_suppkey
  AND p_partkey = l_partkey
  AND o_orderkey = l_orderkey
  AND s_nationkey = n_nationkey
  AND p_name LIKE '%a%'
GROUP BY n_name, extract(year FROM o_orderdate)
"""


def test_q9_expression_group_key(spark):
    """q9 shape: extract(year FROM o_orderdate) as a GROUP BY key over
    a five-table chain; churn on the fact and two dimensions."""
    _soak(_mz(spark, SF), "q9c", Q9,
          ["part", "supplier", "lineitem", "orders", "nation"], [
        "DELETE FROM lineitem WHERE l_orderkey % 8 = 0",
        "INSERT INTO orders SELECT * FROM orders "
        "WHERE o_orderkey % 17 = 4",
        "DELETE FROM supplier WHERE s_suppkey % 10 = 7",
    ])


Q2 = """
SELECT s_name, p_partkey, l_extendedprice
FROM part, supplier, lineitem
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND p_size = 15
  AND l_extendedprice = (SELECT min(l2.l_extendedprice)
                         FROM lineitem l2
                         WHERE l2.l_partkey = p_partkey)
"""


def test_q2_equality_scalar_aggregate(spark):
    """q2 shape: x = (SELECT min(...) correlated) — churn that MOVES
    the per-part minimum must retract the previously-equal rows and
    qualify the new minimum's rows."""
    _soak(_mz(spark, SF), "q2c", Q2,
          ["part", "supplier", "lineitem"], [
        "DELETE FROM lineitem WHERE l_extendedprice < 2000",
        "INSERT INTO lineitem SELECT * FROM lineitem "
        "WHERE l_partkey % 3 = 0",
        "DELETE FROM lineitem WHERE l_suppkey % 4 = 2",
    ])


def test_equality_scalar_agg_min_flip(spark):
    """Deterministic minimum-flip on a created table: deleting the
    unique minimum row must move the equality frontier to the new
    minimum (both directions of the retract/qualify flip)."""
    s = _mz(spark)
    s.run_script("""
        CREATE TABLE eq_t (k BIGINT, v BIGINT);
        INSERT INTO eq_t VALUES (1, 10), (1, 20), (1, 30),
                                (2, 5), (2, 5), (2, 7);
        CREATE MATERIALIZED VIEW eqmin WITH (MAINTENANCE 'delta') AS
          SELECT k, v FROM eq_t
          WHERE v = (SELECT min(t2.v) FROM eq_t t2
                     WHERE t2.k = eq_t.k);
    """)
    rows = lambda: sorted(tuple(r) for r in  # noqa: E731
                          s.sql("SELECT * FROM eqmin").collect())
    assert rows() == [(1, 10), (2, 5), (2, 5)]
    s.execute("DELETE FROM eq_t WHERE k = 1 AND v = 10")
    assert rows() == [(1, 20), (2, 5), (2, 5)]
    s.execute("INSERT INTO eq_t VALUES (1, 15), (2, 1)")
    assert rows() == [(1, 15), (2, 1)]
    s.execute("DELETE FROM eq_t WHERE v = 1")
    assert rows() == [(1, 15), (2, 5), (2, 5)]
    s.run_script("DROP MATERIALIZED VIEW eqmin; DROP TABLE eq_t;")


def test_expression_group_key_bucket_shift(spark):
    """Expression group keys on a created table: churn that moves a
    row between year buckets must retract from the old bucket and add
    to the new one."""
    s = _mz(spark)
    s.run_script("""
        CREATE TABLE yr_t (id BIGINT, d TIMESTAMP, amt BIGINT);
        INSERT INTO yr_t VALUES
          (1, TIMESTAMP '1995-03-01 00:00:00', 100),
          (2, TIMESTAMP '1995-07-01 00:00:00', 200),
          (3, TIMESTAMP '1996-01-15 00:00:00', 50);
        CREATE MATERIALIZED VIEW per_year WITH (MAINTENANCE 'delta')
        AS SELECT extract(year FROM d) AS y, sum(amt) AS total
           FROM yr_t GROUP BY extract(year FROM d);
    """)
    rows = lambda: sorted(tuple(int(x) for x in r) for r in  # noqa: E731
                          s.sql("SELECT * FROM per_year").collect())
    assert rows() == [(1995, 300), (1996, 50)]
    s.execute("DELETE FROM yr_t WHERE id = 2")
    s.execute("INSERT INTO yr_t VALUES "
              "(4, TIMESTAMP '1996-02-01 00:00:00', 200)")
    assert rows() == [(1995, 100), (1996, 250)]
    s.execute("DELETE FROM yr_t WHERE extract(year FROM d) = 1995")
    assert rows() == [(1996, 250)]
    s.run_script("DROP MATERIALIZED VIEW per_year; DROP TABLE yr_t;")
