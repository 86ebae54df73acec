"""Catalog durability: DDL/DML journal persisted and replayed on boot.

Reference: the catalog is a durable record of DDL; on restart the
coordinator re-opens it and re-creates every object and dataflow
(src/catalog's durable layer). The Spark analog journals every
state-changing statement; restore_catalog replays it against the same
immutable base parquet, reconstructing tables (with their DML applied),
views, materialized views, comments, roles, and grants.
"""

import pytest

from materialize_spark.plans.sqlfront import MzSession

SF_DIR = "/root/testdata/sf0.001"


def test_restore_reconstructs_objects_and_data(spark, tmp_path):
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE dur_t (k STRING, v BIGINT)")
    s.execute("INSERT INTO dur_t VALUES ('a', 1), ('b', 2)")
    s.execute("UPDATE dur_t SET v = v * 10 WHERE k = 'a'")
    s.execute("DELETE FROM dur_t WHERE k = 'b'")
    s.execute("CREATE VIEW dur_v AS SELECT k, v + 1 AS v1 FROM dur_t")
    s.execute("CREATE MATERIALIZED VIEW dur_mv AS "
              "SELECT count(*) AS n FROM dur_t")
    s.execute("COMMENT ON TABLE dur_t IS 'durable'")
    s.execute("CREATE ROLE dur_role")
    s.execute("GRANT SELECT ON dur_t TO dur_role")
    path = str(tmp_path / "catalog.json")
    s.persist_catalog(path)

    s2 = MzSession.restore_catalog(spark.newSession(), SF_DIR, path)
    assert [(r.k, r.v) for r in s2.sql(
        "SELECT * FROM dur_t ORDER BY k").collect()] == [("a", 10)]
    assert s2.sql("SELECT * FROM dur_v").first().v1 == 11
    assert s2.sql("SELECT * FROM dur_mv").first().n == 1
    got = {r.name: r.comment for r in s2.sql(
        "SELECT * FROM mz_comments WHERE name = 'dur_t'").collect()}
    assert got == {"dur_t": "durable"}
    # RBAC state survived: the restored role still has exactly its grant
    s2.execute("SET ROLE dur_role")
    assert s2.sql("SELECT count(*) AS n FROM dur_t").first().n == 1
    with pytest.raises(PermissionError):
        s2.execute("INSERT INTO dur_t VALUES ('c', 3)")


def test_drops_replay_too(spark, tmp_path):
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE dd_t (x BIGINT)")
    s.execute("CREATE VIEW dd_v AS SELECT x FROM dd_t")
    s.execute("DROP VIEW dd_v")
    path = str(tmp_path / "cat2.json")
    s.persist_catalog(path)
    s2 = MzSession.restore_catalog(spark.newSession(), SF_DIR, path)
    views = {r.name for r in s2.execute("SHOW VIEWS").collect()}
    assert "dd_v" not in views
    assert s2.sql("SELECT count(*) AS n FROM dd_t").first().n == 0


def test_queries_not_journaled(spark, tmp_path):
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE qj_t (x BIGINT)")
    s.sql("SELECT 1 AS one").collect()
    s.execute("SHOW TABLES")
    assert s._journal == ["CREATE TABLE qj_t (x BIGINT)"]


def test_every_statement_has_a_durability_decision():
    """Partition check: every dispatched statement type is either
    journaled (catalog-mutating) or explicitly classified as a read /
    transient / external-effect statement. A new statement type must
    pick a side or this fails."""
    from materialize_spark.plans import parser as ast
    from materialize_spark.plans.sqlfront import MzSession

    dispatched = set(MzSession._DISPATCH)
    journaled = set(MzSession._JOURNALED)
    # reads, transient session state (cursors/prepared/txns/role
    # identity), and external side effects (COPY TO, live Kafka sink —
    # re-producing on replay would duplicate records in the broker)
    non_durable = {
        ast.Peek, ast.SelectAsOf, ast.TableStmt, ast.Wmr, ast.Show,
        ast.ShowCreate, ast.ShowColumns, ast.ShowVar, ast.Explain,
        ast.ExplainTimestamp, ast.ExplainMaintenance,  # plan preview
        ast.Subscribe, ast.CopyTo, ast.Prepare,
        ast.Execute, ast.Deallocate, ast.Declare, ast.Fetch, ast.Close,
        ast.Begin, ast.Commit, ast.Rollback, ast.SetRole,
        ast.Discard,  # resets transient session state by definition
        ast.ExplainSinkSchema,  # schema preview: creates nothing
        ast.CreateSinkKafka,
        ast.Validate,  # endpoint probe: no catalog mutation
    }
    assert journaled <= dispatched
    missing = dispatched - journaled - non_durable
    assert not missing, f"undeclared durability for: {missing}"
    overlap = journaled & non_durable
    assert not overlap, f"contradictory classification: {overlap}"


def test_namespaces_and_clusters_survive_restore(spark, tmp_path):
    """Round-7 DDL (CREATE DATABASE/SCHEMA, CREATE CLUSTER) is journaled
    and replays on restore: namespaced objects resolve by qualified name
    and search_path in the fresh session, and the cluster catalog is
    rebuilt."""
    import os

    from materialize_spark.plans.sqlfront import MzSession

    s = MzSession(spark, SF_DIR)
    s.run_script("""
        CREATE SCHEMA stage;
        CREATE TABLE stage.ev (k STRING, v BIGINT);
        INSERT INTO stage.ev VALUES ('a', 1), ('b', 2);
        CREATE DATABASE wh;
        CREATE SCHEMA wh.facts;
        CREATE TABLE wh.facts.f (x BIGINT);
        INSERT INTO wh.facts.f VALUES (42);
        CREATE CLUSTER pool (SIZE '200cc', REPLICATION FACTOR 2);
        SET search_path = stage, public
    """)
    path = os.path.join(tmp_path, "catalog.json")
    s.persist_catalog(path)
    restored = MzSession.restore_catalog(spark.newSession(), SF_DIR, path)
    # qualified + search_path resolution against the replayed namespaces
    assert restored.sql(
        "SELECT sum(v) AS s FROM stage.ev").first().s == 3
    assert restored.sql("SELECT v FROM ev WHERE k = 'a'").first().v == 1
    assert restored.sql(
        "SELECT x FROM wh.facts.f").first().x == 42
    names = {r.name for r in restored.execute("SHOW SCHEMAS").collect()}
    assert "stage" in names
    clusters = {r.name: r.replicas
                for r in restored.execute("SHOW CLUSTERS").collect()}
    assert clusters.get("pool") == 2


def test_restore_replays_kafka_source(spark, tmp_path):
    """A journaled CREATE SOURCE ... FROM KAFKA re-drains the (still
    live) broker on restore — the restart model for wire sources."""
    import json as _json

    from materialize_spark.sources.kafka_wire import (
        KafkaWireClient, MiniBroker,
    )
    with MiniBroker() as b:
        b.create_topic("durable_feed", partitions=1)
        with KafkaWireClient(b.host, b.port) as c:
            c.produce("durable_feed", 0, [
                (b"k1", _json.dumps({"v": 1}).encode(), 1),
                (b"k1", _json.dumps({"v": 9}).encode(), 2),
            ])
        s = MzSession(spark, SF_DIR)
        s.execute(f"CREATE CONNECTION dkc TO KAFKA (host = '{b.host}', "
                  f"port = {b.port})")
        s.execute("CREATE SOURCE dks FROM KAFKA CONNECTION dkc "
                  "(TOPIC 'durable_feed') FORMAT JSON ENVELOPE UPSERT")
        before = {(r.key, r.data) for r in
                  s.sql("SELECT key, data FROM dks").collect()}
        path = str(tmp_path / "cat")
        s.persist_catalog(path)
        s2 = MzSession.restore_catalog(spark.newSession(), SF_DIR, path)
        after = {(r.key, r.data) for r in
                 s2.sql("SELECT key, data FROM dks").collect()}
        assert after == before == {("k1", '{"v": 9}')}


def test_restore_replays_stacked_and_setop_mvs(spark, tmp_path):
    """Round-11 MV kinds survive restore: the journal replays CREATEs
    in execution order, so a stacked chain re-forms with its upstream
    first, a set-op MV rebuilds its per-side state, and a post-restore
    commit flows through every level always-fresh."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE dsr_l (k STRING, v BIGINT)")
    s.execute("CREATE TABLE dsr_r (k STRING, v BIGINT)")
    s.execute("INSERT INTO dsr_l VALUES ('a', 1), ('a', 1), ('b', 2)")
    s.execute("INSERT INTO dsr_r VALUES ('a', 1)")
    s.execute("CREATE MATERIALIZED VIEW dsr_ex WITH (MAINTENANCE "
              "'delta') AS SELECT k, v FROM dsr_l EXCEPT ALL "
              "SELECT k, v FROM dsr_r")
    s.execute("CREATE MATERIALIZED VIEW dsr_sum WITH (MAINTENANCE "
              "'delta') AS SELECT k, SUM(v) AS tot FROM dsr_ex "
              "GROUP BY k")
    s.execute("CREATE MATERIALIZED VIEW dsr_win WITH (MAINTENANCE "
              "'delta') AS SELECT k, v, SUM(v) OVER () AS total "
              "FROM dsr_l")
    path = str(tmp_path / "catalog.json")
    s.persist_catalog(path)

    s2 = MzSession.restore_catalog(spark.newSession(), SF_DIR, path)
    assert sorted((r.k, r.tot) for r in s2.sql(
        "SELECT * FROM dsr_sum").collect()) == [("a", 1), ("b", 2)]
    # post-restore commit propagates through the restored chain
    s2.execute("INSERT INTO dsr_r VALUES ('b', 2)")
    s2.execute("INSERT INTO dsr_l VALUES ('c', 9)")
    assert sorted((r.k, r.tot) for r in s2.sql(
        "SELECT * FROM dsr_sum").collect()) == [("a", 1), ("c", 9)]
    assert sorted((r.k, r.v, r.total) for r in s2.sql(
        "SELECT * FROM dsr_win").collect()) == [
        ("a", 1, 13), ("a", 1, 13), ("b", 2, 13), ("c", 9, 13)]


def test_restore_replays_from_subquery_join_mv(spark, tmp_path):
    """A FROM-subquery join MV restores by re-desugaring: the journal
    replays the CREATE, the planner recreates its internal view, and a
    post-restore commit flows through both."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE drj_o (okey BIGINT, ckey BIGINT, "
              "price BIGINT)")
    s.execute("CREATE TABLE drj_c (ck2 BIGINT, cname STRING)")
    s.execute("INSERT INTO drj_o VALUES (1, 1, 10), (2, 1, 900)")
    s.execute("INSERT INTO drj_c VALUES (1, 'ann')")
    s.execute("CREATE MATERIALIZED VIEW drj WITH (MAINTENANCE "
              "'delta') AS SELECT cname, SUM(dbl) AS rev FROM "
              "(SELECT ckey, price * 2 AS dbl FROM drj_o "
              "WHERE price < 100) JOIN drj_c ON ckey = ck2 "
              "GROUP BY cname")
    path = str(tmp_path / "catalog.json")
    s.persist_catalog(path)

    s2 = MzSession.restore_catalog(spark.newSession(), SF_DIR, path)
    assert "__jsub_drj" in s2._delta_mvs
    assert [(r.cname, r.rev) for r in s2.sql(
        "SELECT * FROM drj").collect()] == [("ann", 20)]
    s2.execute("INSERT INTO drj_o VALUES (3, 1, 5)")
    assert [(r.cname, r.rev) for r in s2.sql(
        "SELECT * FROM drj").collect()] == [("ann", 30)]
