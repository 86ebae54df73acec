"""mz_internal health introspection: mz_source_statuses /
mz_sink_statuses / mz_source_statistics.

Semantics mirrored: the reference's source/sink healthcheck model
(src/storage-client/src/healthcheck.rs — statuses starting → running →
stalled with the last error retained) and the ingestion counters of
mz_internal.mz_source_statistics. These are the first relations a
production operator queries ("is my source healthy? is it ingesting?").
"""

import pytest

from materialize_spark.plans.sqlfront import MzSession

SF_DIR = "/root/testdata/sf0.001"


def test_source_statuses_and_statistics(spark, tmp_path):
    sess = MzSession(spark, SF_DIR)
    spark.range(7).toDF("v").write.parquet(f"{tmp_path}/seven")
    sess.execute(
        f"CREATE SOURCE f7 FROM FILE '{tmp_path}/seven' FORMAT PARQUET")
    sess.execute("CREATE SOURCE hooks FROM WEBHOOK BODY FORMAT JSON")
    sess.webhook("hooks").post({"event": "signup", "user": 7})
    sess.webhook("hooks").post({"event": "login", "user": 7})

    st = {r.name: (r.type, r.status, r.error)
          for r in sess.sql("SELECT * FROM mz_source_statuses").collect()}
    assert st["f7"] == ("file", "running", None)
    assert st["hooks"] == ("webhook", "running", None)

    stats = {r.name: (r.snapshot_committed, r.messages_received)
             for r in
             sess.sql("SELECT * FROM mz_source_statistics").collect()}
    assert stats["hooks"] == (True, 2)  # two POSTs received
    # lazy file registration: counter unreported (NULL), snapshot done
    assert stats["f7"] == (True, None)

    # SHOW SOURCES and mz_sources list every kind with its type
    shown = {r.name: r.type
             for r in sess.execute("SHOW SOURCES").collect()}
    assert shown == {"f7": "file", "hooks": "webhook"}
    mz = {r.name: r.type
          for r in sess.sql("SELECT * FROM mz_sources").collect()}
    assert mz == shown


def test_loadgen_source_status(spark):
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE SOURCE gen FROM LOAD GENERATOR TPCH "
                 "(SCALE FACTOR 0)")
    st = {r.name: (r.type, r.status)
          for r in sess.sql("SELECT name, type, status "
                            "FROM mz_source_statuses").collect()}
    assert st["gen"] == ("load-generator", "running")


def test_stalled_source_keeps_error(spark):
    """A wire failure records a 'stalled' row with the error — the
    reference's status history answers "why is my source broken" even
    after the ingestion task died."""
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE CONNECTION dead TO KAFKA (BROKER '127.0.0.1:1')")
    with pytest.raises(Exception):
        sess.execute(
            "CREATE SOURCE k FROM KAFKA CONNECTION dead (TOPIC 't') "
            "FORMAT JSON")
    st = {r.name: (r.type, r.status)
          for r in sess.sql("SELECT name, type, status "
                            "FROM mz_source_statuses").collect()}
    assert st["k"] == ("kafka", "stalled")
    [err] = [r.error for r in
             sess.sql("SELECT error FROM mz_source_statuses "
                      "WHERE name = 'k'").collect()]
    assert err  # the connection failure text is retained
    # a broken source is not a usable catalog object: absent from the
    # listings, present only in the status history
    assert "k" not in {r.name
                       for r in sess.execute("SHOW SOURCES").collect()}
    assert "k" not in {r.name
                       for r in sess.sql("SELECT * FROM mz_sources")
                       .collect()}


def test_show_indexes_shape(spark):
    """SHOW INDEXES reports (name, on, cluster, key) like the
    reference's mz_indexes-backed listing, not just names."""
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE INDEX nat_by_region ON nation (n_regionkey)")
    rows = {r.name: (r.on, r.cluster, r.key)
            for r in sess.execute("SHOW INDEXES").collect()}
    assert rows["nat_by_region"] == \
        ("nation", "quickstart", "n_regionkey")
    liked = sess.execute("SHOW INDEXES LIKE 'nat%'").collect()
    assert [r.name for r in liked] == ["nat_by_region"]


def test_sink_statuses(spark, tmp_path):
    sess = MzSession(spark, SF_DIR)
    sess.execute(f"CREATE SINK snk FROM region INTO FILE '{tmp_path}/s' "
                 f"FORMAT JSON")
    st = {r.name: (r.status, r.error)
          for r in sess.sql("SELECT * FROM mz_sink_statuses").collect()}
    assert st["snk"] == ("running", None)


def test_activity_log(spark):
    """mz_activity_log records every statement with role, cluster,
    outcome, and latency (reference mz_internal.mz_recent_activity_log
    statement logging), including failures with their error text."""
    sess = MzSession(spark, SF_DIR)
    sess.execute("SET application_name = 'audit'")
    sess.sql("SELECT count(*) AS n FROM region").collect()
    with pytest.raises(Exception):
        sess.execute("SELECT * FROM no_such_rel_al")
    rows = sess.sql(
        "SELECT sql, role, cluster, status, error, duration_ms "
        "FROM mz_activity_log ORDER BY id").collect()
    texts = [r.sql for r in rows]
    assert "SET application_name = 'audit'" in texts
    assert any(r.sql.startswith("SELECT count(*)")
               and r.status == "success" and r.error is None
               and r.duration_ms >= 0 for r in rows)
    [bad] = [r for r in rows if "no_such_rel_al" in r.sql]
    assert bad.status == "error" and bad.error
    assert all(r.role == "materialize" and r.cluster == "quickstart"
               for r in rows)
    # the ring is bounded at 1000 entries
    for i in range(1100):
        sess._log_activity(f"SELECT {i}", "success", None, 0.0)
    assert len(sess._activity) == 1000


def test_show_create_all_object_kinds(spark, tmp_path):
    """SHOW CREATE covers TABLE/SOURCE/SINK/INDEX/CONNECTION beyond
    views (reference ShowCreate* statements): each returns the object's
    defining SQL."""
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE TABLE sc_t (k STRING, v BIGINT)")
    sess.execute("CREATE SOURCE sc_h FROM WEBHOOK")
    sess.execute(f"CREATE SINK sc_s FROM region INTO FILE "
                 f"'{tmp_path}/sc' FORMAT JSON")
    sess.execute("CREATE INDEX sc_i ON nation (n_nationkey)")
    sess.execute("CREATE CONNECTION sc_c TO KAFKA (BROKER 'h:9092')")
    for name, frag in [("sc_t", "CREATE TABLE sc_t"),
                       ("sc_h", "CREATE SOURCE sc_h FROM WEBHOOK"),
                       ("sc_s", "CREATE SINK sc_s FROM region"),
                       ("sc_i", "CREATE INDEX sc_i ON nation"),
                       ("sc_c", "CREATE CONNECTION sc_c TO KAFKA")]:
        kind = {"sc_t": "TABLE", "sc_h": "SOURCE", "sc_s": "SINK",
                "sc_i": "INDEX", "sc_c": "CONNECTION"}[name]
        row = sess.sql(f"SHOW CREATE {kind} {name}").first()
        assert row.name == name and row.create_sql.startswith(frag)
    with pytest.raises(KeyError, match="unknown object"):
        sess.sql("SHOW CREATE TABLE no_such_obj")
