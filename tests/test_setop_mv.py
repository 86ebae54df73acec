"""Delta-maintained set operations: EXCEPT [ALL] / INTERSECT [ALL] /
UNION [DISTINCT] MVs stay always-fresh through INSERT / DELETE / UPDATE
churn with no REFRESH, every step compared against a full recompute of
the body — the reference compiles set ops into Union/Negate/Threshold
compositions and maintains them like any dataflow
(src/sql/src/plan/query.rs plan_set_expr; Negate/Threshold at
src/expr/src/relation.rs:278-288)."""

import pytest

from materialize_spark.plans.sqlfront import MzSession

SF_DIR = "/root/testdata/sf0.001"

BODIES = {
    "so_exall": "SELECT k, v FROM so_l EXCEPT ALL SELECT k, v FROM so_r",
    "so_exd": "SELECT k, v FROM so_l EXCEPT SELECT k, v FROM so_r",
    "so_inall": "SELECT k, v FROM so_l INTERSECT ALL "
                "SELECT k, v FROM so_r",
    "so_ind": "SELECT k, v FROM so_l INTERSECT SELECT k, v FROM so_r",
    "so_und": "SELECT k, v FROM so_l UNION SELECT k, v FROM so_r",
}


def _key(t):
    return tuple((v is None, str(v)) for v in t)


def _rows(s, name):
    return sorted((tuple(r) for r in s.sql(f"SELECT * FROM {name}")
                   .collect()), key=_key)


def _recompute(s, body):
    return sorted((tuple(r) for r in s.spark.sql(body).collect()),
                  key=_key)


def _mk(spark):
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE so_l (k STRING, v BIGINT)")
    s.execute("CREATE TABLE so_r (k STRING, v BIGINT)")
    return s


def _teardown(s, *views):
    for v in views:
        s.execute(f"DROP VIEW {v}")
    for t in ("so_l", "so_r"):
        s.execute(f"DROP TABLE {t}")


def test_setop_mv_random_soak(spark):
    """18-step random churn over both inputs of all five set-op MVs at
    once; duplicates are deliberately common (small key space) so the
    ALL-vs-DISTINCT multiplicity arithmetic is exercised, and deletes
    can drive either side's net to zero."""
    import random

    rng = random.Random(7)
    s = _mk(spark)
    s.execute("INSERT INTO so_l VALUES ('a', 1), ('a', 1), ('b', 2)")
    s.execute("INSERT INTO so_r VALUES ('a', 1), ('c', 3)")
    for name, body in BODIES.items():
        s.execute(f"CREATE MATERIALIZED VIEW {name} WITH "
                  f"(MAINTENANCE 'delta') AS {body}")
    live = {"so_l": [("a", 1), ("a", 1), ("b", 2)],
            "so_r": [("a", 1), ("c", 3)]}

    def step():
        t = rng.choice(["so_l", "so_r"])
        r = rng.random()
        if r < 0.5 or not live[t]:
            k = rng.choice("abcd")
            v = rng.randrange(1, 4)
            live[t].append((k, v))
            s.execute(f"INSERT INTO {t} VALUES ('{k}', {v})")
        elif r < 0.8:
            k, v = live[t][rng.randrange(len(live[t]))]
            live[t] = [x for x in live[t] if x != (k, v)]
            s.execute(f"DELETE FROM {t} WHERE k = '{k}' AND v = {v}")
        else:
            k, v = live[t][rng.randrange(len(live[t]))]
            nv = v + 10
            live[t] = [(k, nv) if x == (k, v) else x for x in live[t]]
            s.execute(f"UPDATE {t} SET v = {nv} "
                      f"WHERE k = '{k}' AND v = {v}")

    for i in range(18):
        step()
        for name, body in BODIES.items():
            assert _rows(s, name) == _recompute(s, body), \
                f"{name} diverged at step {i}"
    _teardown(s, *BODIES)


def test_setop_mv_empty_sides(spark):
    """Edge shapes: one side drained to empty, then refilled — EXCEPT
    returns the full left multiset, INTERSECT empties, and the refill
    restores both without a REFRESH."""
    s = _mk(spark)
    s.execute("INSERT INTO so_l VALUES ('x', 1), ('x', 1), ('y', 2)")
    s.execute("INSERT INTO so_r VALUES ('x', 1), ('y', 2)")
    s.execute("CREATE MATERIALIZED VIEW soe_ex WITH (MAINTENANCE "
              "'delta') AS SELECT k, v FROM so_l EXCEPT ALL "
              "SELECT k, v FROM so_r")
    s.execute("CREATE MATERIALIZED VIEW soe_in WITH (MAINTENANCE "
              "'delta') AS SELECT k, v FROM so_l INTERSECT ALL "
              "SELECT k, v FROM so_r")
    s.execute("DELETE FROM so_r")
    assert _rows(s, "soe_ex") == [("x", 1), ("x", 1), ("y", 2)]
    assert _rows(s, "soe_in") == []
    s.execute("INSERT INTO so_r VALUES ('x', 1), ('x', 1), ('x', 1)")
    assert _rows(s, "soe_ex") == [("y", 2)]
    assert _rows(s, "soe_in") == [("x", 1), ("x", 1)]
    _teardown(s, "soe_ex", "soe_in")


def test_setop_mv_branch_filters_and_exprs(spark):
    """Branch WHERE filters and aliased expression columns apply per
    delta before the set-op state (stateless Map/Filter composition,
    the same mfp fusion the union branches get)."""
    s = _mk(spark)
    s.execute("INSERT INTO so_l VALUES ('a', 1), ('b', 20), ('c', 3)")
    s.execute("INSERT INTO so_r VALUES ('a', 2), ('c', 6)")
    body = ("SELECT k, v * 2 AS d FROM so_l WHERE v < 10 "
            "EXCEPT ALL SELECT k, v AS d FROM so_r")
    s.execute(f"CREATE MATERIALIZED VIEW sof WITH (MAINTENANCE "
              f"'delta') AS {body}")
    assert _rows(s, "sof") == _recompute(s, body)
    s.execute("INSERT INTO so_l VALUES ('d', 4), ('e', 50)")
    s.execute("DELETE FROM so_r WHERE k = 'a'")
    assert _rows(s, "sof") == _recompute(s, body)
    _teardown(s, "sof")


def test_setop_mv_three_branch_chain(spark):
    """Uniform left-associative chains fold into the closed per-side
    forms: A EXCEPT ALL B EXCEPT ALL C and A INTERSECT B INTERSECT C
    maintain with one three-sided state."""
    s = _mk(spark)
    s.execute("CREATE TABLE so_m (k STRING, v BIGINT)")
    s.execute("INSERT INTO so_l VALUES ('a', 1), ('a', 1), ('a', 1), "
              "('b', 2), ('c', 3)")
    s.execute("INSERT INTO so_m VALUES ('a', 1), ('c', 3)")
    s.execute("INSERT INTO so_r VALUES ('a', 1), ('b', 2)")
    ex_body = ("SELECT k, v FROM so_l EXCEPT ALL SELECT k, v FROM so_m "
               "EXCEPT ALL SELECT k, v FROM so_r")
    in_body = ("SELECT k, v FROM so_l INTERSECT SELECT k, v FROM so_m "
               "INTERSECT SELECT k, v FROM so_r")
    s.execute(f"CREATE MATERIALIZED VIEW so3_ex WITH (MAINTENANCE "
              f"'delta') AS {ex_body}")
    s.execute(f"CREATE MATERIALIZED VIEW so3_in WITH (MAINTENANCE "
              f"'delta') AS {in_body}")
    assert _rows(s, "so3_ex") == _recompute(s, ex_body)
    assert _rows(s, "so3_in") == _recompute(s, in_body)
    s.execute("INSERT INTO so_m VALUES ('b', 2)")
    s.execute("DELETE FROM so_r WHERE k = 'a'")
    s.execute("INSERT INTO so_r VALUES ('c', 3)")
    assert _rows(s, "so3_ex") == _recompute(s, ex_body)
    assert _rows(s, "so3_in") == _recompute(s, in_body)
    s.execute("DROP VIEW so3_ex")
    s.execute("DROP VIEW so3_in")
    for t in ("so_m", "so_l", "so_r"):
        s.execute(f"DROP TABLE {t}")


def test_setop_mv_mixed_chain_maintains(spark):
    """Mixed-operator chains maintain via pairwise stacked internal
    MVs with SQL precedence (INTERSECT binds tighter; UNION/EXCEPT
    left-assoc) — the reference plans such chains as nested
    Threshold/Union/Negate trees (plan_set_expr)."""
    s = _mk(spark)
    body = ("SELECT k, v FROM so_l UNION ALL "
            "SELECT k, v FROM so_r EXCEPT "
            "SELECT k, v FROM so_l")
    s.execute("INSERT INTO so_l VALUES ('a', 1), ('b', 2)")
    s.execute("INSERT INTO so_r VALUES ('b', 2), ('c', 3)")
    s.execute("CREATE MATERIALIZED VIEW so_mix WITH (MAINTENANCE "
              f"'delta') AS {body}")
    assert _rows(s, "so_mix") == _recompute(s, body)
    s.execute("INSERT INTO so_r VALUES ('d', 4)")
    s.execute("DELETE FROM so_l WHERE k = 'a'")
    s.execute("INSERT INTO so_l VALUES ('c', 3)")
    assert _rows(s, "so_mix") == _recompute(s, body)
    # precedence: INTERSECT groups before the EXCEPT applies
    body2 = ("SELECT k, v FROM so_l EXCEPT "
             "SELECT k, v FROM so_r INTERSECT "
             "SELECT k, v FROM so_l")
    s.execute("CREATE MATERIALIZED VIEW so_mix2 WITH (MAINTENANCE "
              f"'delta') AS {body2}")
    assert _rows(s, "so_mix2") == _recompute(s, body2)
    s.execute("DELETE FROM so_r WHERE k = 'b'")
    assert _rows(s, "so_mix") == _recompute(s, body)
    assert _rows(s, "so_mix2") == _recompute(s, body2)
    # DROP takes the planner-internal pair nodes with it
    s.execute("DROP VIEW so_mix")
    s.execute("DROP VIEW so_mix2")
    assert not [n for n in s._delta_mvs if n.startswith("__setop_")]
    for t in ("so_l", "so_r"):
        s.execute(f"DROP TABLE {t}")


def test_setop_subscribe_query(spark):
    """SUBSCRIBE (A EXCEPT ALL B): the set-op body plans as an
    ephemeral delta-maintained view; a commit on either side pushes
    exactly the touched rows' diff."""
    from pyspark.sql import functions as F  # noqa: F401

    s = _mk(spark)
    s.execute("INSERT INTO so_l VALUES ('a', 1), ('b', 2)")
    s.execute("INSERT INTO so_r VALUES ('b', 2)")
    sid, first, _ = s.subscribe_open(
        "SUBSCRIBE (SELECT k, v FROM so_l EXCEPT ALL "
        "SELECT k, v FROM so_r)")
    snap = sorted((r.k, r.v) for r in first.collect())
    assert snap == [("a", 1)]
    s.execute("INSERT INTO so_r VALUES ('a', 1)")
    delta = s.subscribe_poll(sid)
    got = sorted((r.k, r.v, r.diff) for r in delta.collect())
    assert got == [("a", 1, -1)]
    s.subscribe_close(sid)
    assert not any(n.startswith("__subq") for n in s._delta_mvs)
    for t in ("so_l", "so_r"):
        s.execute(f"DROP TABLE {t}")
