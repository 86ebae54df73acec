"""Round-12 advice regressions.

1 (high) — correlated [NOT] IN three-valued NULL semantics: covered by
   test_semijoin_mv.test_correlated_not_in_three_valued / _in_per_key.
2 (medium) — dropped-key bare-name capture in the comma-FROM desugar:
   covered by test_semijoin_mv.test_dropped_key_name_collision.
3 (low) — maintained reduces published keys-first even when the SELECT
   listed aggregates before keys; the reference preserves SELECT-item
   order (positional consumers: SELECT *, sinks). Covered here.
"""


def _mz(spark):
    # explicit small-sf catalog: a DEFAULT-sf session here would
    # force-build the sf0.1 arrangements under the test fixture's
    # 4-partition conf and poison the golden plan pins that run later
    from materialize_spark.plans.sqlfront import MzSession
    return MzSession(spark, "/root/testdata/sf0.001")


def test_select_order_restored_agg_before_key(spark):
    s = _mz(spark)
    s.run_script("""
        CREATE TABLE ot (k BIGINT, v BIGINT);
        INSERT INTO ot VALUES (1, 10), (1, 20), (2, 5);
        CREATE MATERIALIZED VIEW omv WITH (MAINTENANCE 'delta') AS
          SELECT COUNT(*) AS c, k FROM ot GROUP BY k;
    """)
    df = s.sql("SELECT * FROM omv")
    assert [f.name for f in df.schema.fields] == ["c", "k"]
    assert sorted(tuple(r) for r in df.collect()) == [(1, 2), (2, 1)]
    s.execute("INSERT INTO ot VALUES (2, 6)")
    df = s.sql("SELECT * FROM omv")
    assert [f.name for f in df.schema.fields] == ["c", "k"]
    assert sorted(tuple(r) for r in df.collect()) == [(2, 1), (2, 2)]
    s.run_script("DROP MATERIALIZED VIEW omv; DROP TABLE ot;")


def test_select_order_restored_join_chain(spark):
    s = _mz(spark)
    s.run_script("""
        CREATE TABLE oja (jk BIGINT, g STRING);
        CREATE TABLE ojb (jk2 BIGINT, amt BIGINT);
        INSERT INTO oja VALUES (1, 'x'), (2, 'y');
        INSERT INTO ojb VALUES (1, 10), (1, 5), (2, 7);
        CREATE MATERIALIZED VIEW ojmv WITH (MAINTENANCE 'delta') AS
          SELECT SUM(amt) AS total, g FROM oja
          JOIN ojb ON oja.jk = ojb.jk2 GROUP BY g;
    """)
    df = s.sql("SELECT * FROM ojmv")
    assert [f.name for f in df.schema.fields] == ["total", "g"]
    assert sorted(tuple(r) for r in df.collect()) == [(7, "y"),
                                                      (15, "x")]
    s.execute("INSERT INTO ojb VALUES (2, 3)")
    df = s.sql("SELECT * FROM ojmv")
    assert [f.name for f in df.schema.fields] == ["total", "g"]
    assert sorted(tuple(r) for r in df.collect()) == [(10, "y"),
                                                      (15, "x")]
    s.run_script("DROP MATERIALIZED VIEW ojmv;"
                 "DROP TABLE oja; DROP TABLE ojb;")
