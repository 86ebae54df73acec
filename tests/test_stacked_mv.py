"""Stacked delta MVs: a MAINTENANCE 'delta' view reading ANOTHER delta
MV as its base relation — the reference's views-over-views dataflow
composition (a dependent dataflow imports the upstream arrangement,
src/compute/src/render.rs). Each level's published diff is the next
level's commit; every step compared against a full recompute."""

import pytest

from materialize_spark.plans.sqlfront import MzSession

SF_DIR = "/root/testdata/sf0.001"


def _key(t):
    return tuple((v is None, str(v)) for v in t)


def _rows(s, name):
    return sorted((tuple(r) for r in s.sql(f"SELECT * FROM {name}")
                   .collect()), key=_key)


def _recompute(s, body):
    return sorted((tuple(r) for r in s.spark.sql(body).collect()),
                  key=_key)


@pytest.mark.soak
def test_stacked_join_agg_filter_churn(spark):
    """Three-level chain (join MV -> grouped-agg MV over it ->
    stateless filter MV over that) stays always-fresh through a random
    churn of both base tables."""
    import random

    rng = random.Random(23)
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE stk_ord (okey BIGINT, ckey BIGINT, "
              "price BIGINT)")
    s.execute("CREATE TABLE stk_cust (ckey2 BIGINT, cname STRING)")
    s.execute("INSERT INTO stk_ord VALUES (1, 1, 10), (2, 1, 20), "
              "(3, 2, 5)")
    s.execute("INSERT INTO stk_cust VALUES (1, 'ann'), (2, 'bob')")
    join_body = ("SELECT cname, price FROM stk_ord "
                 "JOIN stk_cust ON ckey = ckey2")
    s.execute(f"CREATE MATERIALIZED VIEW stk_join WITH (MAINTENANCE "
              f"'delta') AS {join_body}")
    s.execute("CREATE MATERIALIZED VIEW stk_agg WITH (MAINTENANCE "
              "'delta') AS SELECT cname, SUM(price) AS rev, "
              "COUNT(*) AS n FROM stk_join GROUP BY cname")
    s.execute("CREATE MATERIALIZED VIEW stk_hot WITH (MAINTENANCE "
              "'delta') AS SELECT cname, rev FROM stk_agg "
              "WHERE rev > 12")
    agg_body = (f"SELECT cname, SUM(price) AS rev, COUNT(*) AS n "
                f"FROM ({join_body}) GROUP BY cname")
    hot_body = (f"SELECT cname, rev FROM ({agg_body}) WHERE rev > 12")
    next_ok, live = [4], [(1, 1, 10), (2, 1, 20), (3, 2, 5)]
    custs = {1: "ann", 2: "bob"}
    for i in range(14):
        r = rng.random()
        if r < 0.45 or not live:
            ok, ck = next_ok[0], rng.randrange(1, 4)
            price = rng.randrange(1, 30)
            next_ok[0] += 1
            live.append((ok, ck, price))
            s.execute(f"INSERT INTO stk_ord VALUES ({ok}, {ck}, "
                      f"{price})")
        elif r < 0.7:
            ok, ck, price = live.pop(rng.randrange(len(live)))
            s.execute(f"DELETE FROM stk_ord WHERE okey = {ok}")
        elif r < 0.85:
            ok, ck, price = live[rng.randrange(len(live))]
            live[[x[0] for x in live].index(ok)] = (ok, ck, price + 7)
            s.execute(f"UPDATE stk_ord SET price = price + 7 "
                      f"WHERE okey = {ok}")
        else:
            ck = rng.randrange(1, 4)
            if ck not in custs:
                custs[ck] = f"c{ck}"
                s.execute(f"INSERT INTO stk_cust VALUES ({ck}, "
                          f"'c{ck}')")
        assert _rows(s, "stk_join") == _recompute(s, join_body), \
            f"join level diverged at step {i}"
        assert _rows(s, "stk_agg") == _recompute(s, agg_body), \
            f"agg level diverged at step {i}"
        assert _rows(s, "stk_hot") == _recompute(s, hot_body), \
            f"filter level diverged at step {i}"
    for v in ("stk_hot", "stk_agg", "stk_join"):
        s.execute(f"DROP VIEW {v}")
    for t in ("stk_cust", "stk_ord"):
        s.execute(f"DROP TABLE {t}")


def test_stacked_agg_over_setop_mv(spark):
    """Reduce stacked on a set-op MV: commits on either EXCEPT side
    flow through the set-op state's published diff into the downstream
    grouped aggregate."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE sts_l (k STRING, v BIGINT)")
    s.execute("CREATE TABLE sts_r (k STRING, v BIGINT)")
    s.execute("INSERT INTO sts_l VALUES ('a', 1), ('a', 1), ('a', 2), "
              "('b', 3)")
    s.execute("INSERT INTO sts_r VALUES ('a', 1)")
    s.execute("CREATE MATERIALIZED VIEW sts_ex WITH (MAINTENANCE "
              "'delta') AS SELECT k, v FROM sts_l EXCEPT ALL "
              "SELECT k, v FROM sts_r")
    s.execute("CREATE MATERIALIZED VIEW sts_sum WITH (MAINTENANCE "
              "'delta') AS SELECT k, SUM(v) AS tot FROM sts_ex "
              "GROUP BY k")
    body = ("SELECT k, SUM(v) AS tot FROM (SELECT k, v FROM sts_l "
            "EXCEPT ALL SELECT k, v FROM sts_r) GROUP BY k")
    assert _rows(s, "sts_sum") == _recompute(s, body)
    s.execute("INSERT INTO sts_r VALUES ('a', 1), ('b', 3)")
    assert _rows(s, "sts_sum") == _recompute(s, body)
    s.execute("DELETE FROM sts_r WHERE v = 1")
    s.execute("INSERT INTO sts_l VALUES ('c', 9)")
    assert _rows(s, "sts_sum") == _recompute(s, body)
    for v in ("sts_sum", "sts_ex"):
        s.execute(f"DROP VIEW {v}")
    for t in ("sts_l", "sts_r"):
        s.execute(f"DROP TABLE {t}")


def test_stacked_drop_dependency_guard(spark):
    """Dropping a relation a delta MV reads errors without CASCADE;
    CASCADE drops the dependent chain (PG/reference dependency
    semantics — the downstream would otherwise silently stop
    updating)."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE stg_t (k STRING, v BIGINT)")
    s.execute("INSERT INTO stg_t VALUES ('a', 1)")
    s.execute("CREATE MATERIALIZED VIEW stg_a WITH (MAINTENANCE "
              "'delta') AS SELECT k, SUM(v) AS tot FROM stg_t "
              "GROUP BY k")
    s.execute("CREATE MATERIALIZED VIEW stg_b WITH (MAINTENANCE "
              "'delta') AS SELECT k, tot FROM stg_a WHERE tot > 0")
    with pytest.raises(Exception, match="depends on it"):
        s.execute("DROP VIEW stg_a")
    with pytest.raises(Exception, match="depends on it"):
        s.execute("DROP TABLE stg_t")
    s.execute("DROP VIEW stg_a CASCADE")
    assert "stg_a" not in s._delta_mvs
    assert "stg_b" not in s._delta_mvs
    s.execute("DROP TABLE stg_t")


def test_stacked_subscribe_downstream(spark):
    """SUBSCRIBE on a downstream stacked MV receives diffs caused by a
    base-table commit two levels up."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE stv_t (k STRING, v BIGINT)")
    s.execute("INSERT INTO stv_t VALUES ('a', 5)")
    s.execute("CREATE MATERIALIZED VIEW stv_a WITH (MAINTENANCE "
              "'delta') AS SELECT k, SUM(v) AS tot FROM stv_t "
              "GROUP BY k")
    s.execute("CREATE MATERIALIZED VIEW stv_b WITH (MAINTENANCE "
              "'delta') AS SELECT k, tot FROM stv_a WHERE tot >= 5")
    sid, first, _ = s.subscribe_open("SUBSCRIBE stv_b")
    assert sorted((r.k, r.tot) for r in first.collect()) == [("a", 5)]
    s.execute("INSERT INTO stv_t VALUES ('a', 3), ('b', 9)")
    delta = s.subscribe_poll(sid)
    got = sorted((r.k, r.tot, r.diff) for r in delta.collect())
    assert got == [("a", 5, -1), ("a", 8, 1), ("b", 9, 1)]
    s.subscribe_close(sid)
    s.execute("DROP VIEW stv_b")
    s.execute("DROP VIEW stv_a")
    s.execute("DROP TABLE stv_t")


def test_explain_maintenance(spark):
    """EXPLAIN MAINTENANCE FOR <delta MV> renders the maintained
    operator tree (reduce/join/topk/setop/union nodes, upstream MV
    imports); snapshot MVs and unknown names error."""
    import pytest

    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE exm_t (k STRING, v BIGINT)")
    s.execute("INSERT INTO exm_t VALUES ('a', 1)")
    s.execute("CREATE MATERIALIZED VIEW exm_agg WITH (MAINTENANCE "
              "'delta') AS SELECT k, SUM(v) AS tot FROM exm_t "
              "GROUP BY k")
    s.execute("CREATE MATERIALIZED VIEW exm_hot WITH (MAINTENANCE "
              "'delta') AS SELECT k, tot FROM exm_agg WHERE tot > 0")
    plan = [r.plan for r in s.sql(
        "EXPLAIN MAINTENANCE FOR MATERIALIZED VIEW exm_agg")
        .orderBy("seq").collect()]
    assert any("Reduce keys=['k']" in ln for ln in plan)
    assert any("Scan exm_t" in ln for ln in plan)
    plan2 = [r.plan for r in s.sql(
        "EXPLAIN MAINTENANCE FOR MATERIALIZED VIEW exm_hot")
        .orderBy("seq").collect()]
    assert any("Import exm_agg (upstream delta MV)" in ln
               for ln in plan2)
    s.execute("CREATE MATERIALIZED VIEW exm_win WITH (MAINTENANCE "
              "'delta') AS SELECT k, v, SUM(v) OVER (PARTITION BY k) "
              "AS sk, SUM(v) OVER () AS total FROM exm_t")
    plan3 = [r.plan for r in s.sql(
        "EXPLAIN MAINTENANCE FOR MATERIALIZED VIEW exm_win")
        .orderBy("seq").collect()]
    assert any("partition=['k']" in ln for ln in plan3)
    assert any("(global)" in ln for ln in plan3)
    s.execute("DROP VIEW exm_win")
    s.execute("CREATE MATERIALIZED VIEW exm_snap AS "
              "SELECT k FROM exm_t")
    with pytest.raises(Exception, match="not delta-maintained"):
        s.execute("EXPLAIN MAINTENANCE FOR MATERIALIZED VIEW exm_snap")
    with pytest.raises(Exception, match="unknown materialized view"):
        s.execute("EXPLAIN MAINTENANCE FOR MATERIALIZED VIEW nope")
    for v in ("exm_snap", "exm_hot", "exm_agg"):
        s.execute(f"DROP VIEW {v}")
    s.execute("DROP TABLE exm_t")


def test_mv_join_base_table_comma_from(spark):
    """A comma-FROM join whose FROM item is an upstream delta MV (the
    views-over-views join a Materialize user writes as
    ``FROM my_agg_mv, dim WHERE ...``): the desugar's identity aliases
    on qualified references must not knock the projection out of the
    maintained join shape, and SELECT-list aliases rename the
    published columns."""
    s = MzSession(spark)
    s.run_script("""
        CREATE TABLE mjf (k BIGINT, x BIGINT);
        CREATE TABLE mjd (k BIGINT, nm STRING);
        INSERT INTO mjf VALUES (1, 10), (1, 20), (2, 5);
        INSERT INTO mjd VALUES (1, 'a'), (2, 'b');
        CREATE MATERIALIZED VIEW mj_agg WITH (MAINTENANCE 'delta') AS
          SELECT k, SUM(x) AS sx FROM mjf GROUP BY k;
        CREATE MATERIALIZED VIEW mj_join WITH (MAINTENANCE 'delta') AS
          SELECT mjd.nm AS customer, mj_agg.sx AS revenue
          FROM mj_agg, mjd WHERE mj_agg.k = mjd.k;
    """)
    out = s.sql("SELECT * FROM mj_join")
    assert out.columns == ["customer", "revenue"]
    assert _rows(s, "mj_join") == sorted(
        [("a", 30), ("b", 5)], key=_key)
    s.execute("INSERT INTO mjf VALUES (2, 50)")
    assert _rows(s, "mj_join") == sorted(
        [("a", 30), ("b", 55)], key=_key)
    s.execute("DELETE FROM mjf WHERE x = 10")
    assert _rows(s, "mj_join") == sorted(
        [("a", 20), ("b", 55)], key=_key)
    s.execute("INSERT INTO mjd VALUES (3, 'c')")
    s.execute("INSERT INTO mjf VALUES (3, 7)")
    assert _rows(s, "mj_join") == sorted(
        [("a", 20), ("b", 55), ("c", 7)], key=_key)
    s.run_script("DROP MATERIALIZED VIEW mj_join; "
                 "DROP MATERIALIZED VIEW mj_agg; "
                 "DROP TABLE mjf; DROP TABLE mjd;")


def test_join_projection_aliases_base_tables(spark):
    """SELECT-list aliases on a plain-column join projection over base
    tables publish the aliased schema and keep maintaining (the spine
    consolidates on the OUTPUT names)."""
    s = MzSession(spark)
    s.run_script("""
        CREATE TABLE ja_a (i BIGINT, v STRING);
        CREATE TABLE ja_b (i BIGINT, w STRING);
        INSERT INTO ja_a VALUES (1, 'x'), (2, 'y');
        INSERT INTO ja_b VALUES (1, 'p'), (1, 'q');
        CREATE MATERIALIZED VIEW ja_mv WITH (MAINTENANCE 'delta') AS
          SELECT ja_a.v AS left_v, ja_b.w AS right_w
          FROM ja_a JOIN ja_b ON ja_a.i = ja_b.i;
    """)
    assert s.sql("SELECT * FROM ja_mv").columns \
        == ["left_v", "right_w"]
    assert _rows(s, "ja_mv") == sorted(
        [("x", "p"), ("x", "q")], key=_key)
    s.execute("INSERT INTO ja_b VALUES (2, 'r')")
    s.execute("DELETE FROM ja_b WHERE w = 'p'")
    assert _rows(s, "ja_mv") == sorted(
        [("x", "q"), ("y", "r")], key=_key)
    s.run_script("DROP MATERIALIZED VIEW ja_mv; "
                 "DROP TABLE ja_a; DROP TABLE ja_b;")
