"""Queries exercising the SQL front-end (plans/): PG-dialect text in,
Spark execution, DuckDB oracle on the ANSI equivalent."""

from __future__ import annotations

from materialize_spark.plans.sqlfront import MzSession
from materialize_spark.queries import register


@register(
    "sqlfront_pg_idioms",
    """
    -- NB: engine CAST(double AS int) truncates toward zero (ANSI/Spark);
    -- PG/DuckDB round — oracle uses trunc() to pin the documented semantics
    SELECT c_custkey, CAST(trunc(c_acctbal) AS BIGINT) AS bal_int,
           c_name LIKE 'Customer#00000001%' AS name_like,
           CAST(json_extract_string(
               '{"seg": "' || c_mktsegment || '"}', '$.seg') AS VARCHAR) AS seg_json
    FROM customer WHERE c_custkey <= 100
    """,
    "sqlfront", "dialect",
)
def sqlfront_pg_idioms(spark, sf_dir):
    sess = MzSession(spark, sf_dir)
    # ::casts, ~~ like operator, jsonb ->> arrow — all PG spellings.
    return sess.sql("""
        SELECT c_custkey, c_acctbal::int8 AS bal_int,
               c_name ~~ 'Customer#00000001%' AS name_like,
               concat('{"seg": "', c_mktsegment, '"}') ->> 'seg' AS seg_json
        FROM customer WHERE c_custkey <= 100
    """)


@register(
    "sqlfront_distinct_on",
    """
    SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey
    FROM orders WHERE o_custkey <= 200
    ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
    "sqlfront", "distinct-on",
)
def sqlfront_distinct_on(spark, sf_dir):
    sess = MzSession(spark, sf_dir)
    return sess.sql("""SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey
        FROM orders WHERE o_custkey <= 200
        ORDER BY o_custkey, o_totalprice DESC, o_orderkey""")


@register(
    "sqlfront_matview_roundtrip",
    """
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    "sqlfront", "matview", "ddl",
)
def sqlfront_matview_roundtrip(spark, sf_dir):
    sess = MzSession(spark, sf_dir)
    sess.execute("""CREATE MATERIALIZED VIEW cust_by_nation AS
        SELECT n_name, count(*)::int8 AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name""")
    # served from the maintained snapshot (fast path), not re-planned
    out = sess.sql("SELECT n_name, n_cust FROM cust_by_nation")
    sess.execute("DROP VIEW cust_by_nation")
    return out


@register(
    "sqlfront_update_delete",
    """
    WITH base AS (SELECT o_orderkey, o_totalprice, o_orderpriority
                  FROM orders WHERE o_orderkey <= 1000),
    upd AS (SELECT o_orderkey,
                   CASE WHEN o_orderpriority = '1-URGENT'
                        THEN round(o_totalprice * 1.1, 2)
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderpriority
            FROM base),
    del AS (SELECT * FROM upd
            WHERE NOT coalesce(o_totalprice > 200000, false))
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM del
    """,
    "sqlfront", "update-delete", "ddl",
)
def sqlfront_update_delete(spark, sf_dir):
    """UPDATE / DELETE on a registered table (reference UpdateStatement /
    DeleteStatement, src/sql-parser/src/ast/defs/statement.rs:526,558):
    create, mutate twice, read back an aggregate of the final state."""
    sess = MzSession(spark, sf_dir)
    sess.execute("""CREATE TABLE ord_mut AS
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey <= 1000""")
    sess.execute("""UPDATE ord_mut
        SET o_totalprice = round(o_totalprice * 1.1, 2)
        WHERE o_orderpriority = '1-URGENT'""")
    sess.execute("DELETE FROM ord_mut WHERE o_totalprice > 200000")
    out = sess.sql("""SELECT count(*)::int8 AS n,
                             round(sum(o_totalprice), 2) AS total
                      FROM ord_mut""")
    sess.execute("DROP TABLE ord_mut")
    return out


@register(
    "sqlfront_wmr",
    """
    WITH RECURSIVE reach(src, dst) AS (
      SELECT n_nationkey AS src, n_nationkey // 2 AS dst
      FROM nation WHERE n_nationkey > 0
      UNION
      SELECT r.src, e.dst
      FROM reach r JOIN (SELECT n_nationkey AS src, n_nationkey // 2 AS dst
                         FROM nation WHERE n_nationkey > 0) e
        ON r.dst = e.src)
    SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM reach
    """,
    "sqlfront", "wmr", "letrec",
)
def sqlfront_wmr(spark, sf_dir):
    """WITH MUTUALLY RECURSIVE via SQL text (reference
    test/sqllogictest/with_mutually_recursive.slt; MIR LetRec
    src/expr/src/relation.rs:154): transitive closure of the halving
    chain over nation keys, hash-matched against DuckDB WITH RECURSIVE."""
    sess = MzSession(spark, sf_dir)
    return sess.sql("""
        WITH MUTUALLY RECURSIVE
          reach (src int8, dst int8) AS (
            SELECT n_nationkey AS src, n_nationkey DIV 2 AS dst
            FROM nation WHERE n_nationkey > 0
            UNION
            SELECT r.src AS src, e.dst AS dst
            FROM reach r JOIN (SELECT n_nationkey AS src,
                                      n_nationkey DIV 2 AS dst
                               FROM nation WHERE n_nationkey > 0) e
              ON r.dst = e.src)
        SELECT src::int8 AS src, dst::int8 AS dst FROM reach
    """)


@register(
    "sqlfront_create_sink",
    """
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation
    """,
    "sqlfront", "sink",
)
def sqlfront_create_sink(spark, sf_dir):
    """CREATE SINK ... INTO FILE (the reference's continuous-sink surface,
    src/storage-types/src/sinks.rs:137-140, mapped to file export):
    write the snapshot through the SQL statement, read the files back."""
    import tempfile

    sess = MzSession(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="mz_sink_")
    sess.execute(
        f"CREATE SINK nation_sink FROM nation INTO FILE '{d}/nation' "
        f"FORMAT JSON")
    back = spark.read.json(f"{d}/nation")
    return back.selectExpr("CAST(n_nationkey AS BIGINT) AS n_nationkey",
                           "n_name")


@register(
    "sqlfront_pg_catalog",
    """
    -- oracle: literal truth of the deterministic DDL this entry issues.
    SELECT * FROM (VALUES
        ('pgcat_t', 'r', CAST(2 AS BIGINT), 'table doc'),
        ('pgcat_v', 'v', CAST(1 AS BIGINT), NULL)
    ) AS t(relname, relkind, ncols, description)
    ORDER BY relname
    """,
    "sqlfront", "introspection", "pg_catalog",
)
def sqlfront_pg_catalog(spark, sf_dir):
    """pg_catalog compatibility shim exercised end-to-end: pg_class /
    pg_attribute / pg_description reflect fresh DDL + COMMENT ON, via
    the join shapes PG tooling uses (obj_description-style). Reference:
    the pg_catalog builtins in src/catalog (the reference ships the same
    shim so psql/BI tools can introspect)."""
    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE pgcat_t (a BIGINT NOT NULL, b TEXT)")
    sess.execute("CREATE VIEW pgcat_v AS SELECT a FROM pgcat_t")
    sess.execute("COMMENT ON TABLE pgcat_t IS 'table doc'")
    return sess.sql("""
        SELECT c.relname, c.relkind,
               (SELECT count(*) FROM pg_attribute a
                WHERE a.attrelid = c.oid) AS ncols,
               (SELECT d.description FROM pg_description d
                WHERE d.objoid = c.oid AND d.objsubid = 0) AS description
        FROM pg_class c
        WHERE c.relname IN ('pgcat_t', 'pgcat_v')
        ORDER BY c.relname
    """)


@register(
    "sqlfront_rbac",
    """
    -- oracle: literal truth of the deterministic role/grant script
    SELECT * FROM (VALUES
        ('analyst', TRUE,  CAST(5 AS BIGINT)),
        ('intern',  FALSE, CAST(0 AS BIGINT))
    ) AS t(role, can_select, visible_rows)
    ORDER BY role
    """,
    "sqlfront", "rbac",
)
def sqlfront_rbac(spark, sf_dir):
    """RBAC end-to-end: a granted role reads the table, an ungranted one
    is denied (reference GRANT/REVOKE statements + rbac.rs checks).
    The result encodes both outcomes so the oracle pins enforcement,
    not just the catalog bookkeeping."""
    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE rbacq_t AS "
                 "SELECT r_regionkey FROM region")
    sess.execute("CREATE ROLE analyst")
    sess.execute("CREATE ROLE intern")
    sess.execute("GRANT SELECT ON rbacq_t TO analyst")
    rows = []
    for role in ("analyst", "intern"):
        sess.execute(f"SET ROLE {role}")
        try:
            n = sess.sql(
                "SELECT count(*) AS n FROM rbacq_t").first().n
            rows.append((role, True, n))
        except PermissionError:
            rows.append((role, False, 0))
        finally:
            sess.execute("RESET ROLE")
    return spark.createDataFrame(
        rows, "role string, can_select boolean, visible_rows long"
    ).orderBy("role")


@register(
    "sqlfront_catalog_restore",
    """
    -- oracle: literal truth of the journaled script after restart replay
    SELECT * FROM (VALUES
        ('a', CAST(10 AS BIGINT), CAST(11 AS BIGINT))
    ) AS t(k, v, v1)
    """,
    "sqlfront", "durability",
)
def sqlfront_catalog_restore(spark, sf_dir):
    """Catalog durability end-to-end: DDL+DML journaled, persisted,
    replayed into a FRESH session (spark.newSession — separate temp-view
    namespace, like a restart), and the restored objects are queried.
    Reference: the durable catalog re-opened on boot (src/catalog)."""
    import os
    import tempfile

    s = MzSession(spark, sf_dir)
    s.execute("CREATE TABLE durq_t (k STRING, v BIGINT)")
    s.execute("INSERT INTO durq_t VALUES ('a', 1), ('b', 2)")
    s.execute("UPDATE durq_t SET v = v * 10 WHERE k = 'a'")
    s.execute("DELETE FROM durq_t WHERE k = 'b'")
    s.execute("CREATE VIEW durq_v AS SELECT k, v, v + 1 AS v1 FROM durq_t")
    path = os.path.join(tempfile.mkdtemp(prefix="mz_cat_"), "catalog.json")
    s.persist_catalog(path)
    restored = MzSession.restore_catalog(spark.newSession(), sf_dir, path)
    return restored.sql("SELECT k, v, v1 FROM durq_v")


@register(
    "sqlfront_pgwire_roundtrip",
    """
    -- oracle: literal truth of the statements issued over the wire
    SELECT * FROM (VALUES
        ('a', CAST(1 AS BIGINT), 'bigint'),
        ('b', NULL, 'bigint')
    ) AS t(k, v, v_type)
    ORDER BY k
    """,
    "sqlfront", "pgwire",
)
def sqlfront_pgwire_roundtrip(spark, sf_dir):
    """The pgwire front-end exercised end-to-end: DDL + DML + a typed
    SELECT travel the PG wire protocol (startup, simple query, T/D/C/Z)
    through a real socket, and the text-format rows the client decodes
    are compared against the oracle. Reference: src/pgwire serving psql
    clients."""
    from materialize_spark.plans.pgwire import MzPgServer, PgWireClient

    sess = MzSession(spark, sf_dir)
    with MzPgServer(sess) as srv:
        with PgWireClient(srv.host, srv.port) as c:
            c.query("CREATE TABLE pgw_t (k STRING, v BIGINT)")
            c.query("INSERT INTO pgw_t VALUES ('a', 1), ('b', NULL)")
            [res] = c.query(
                "SELECT k, v, pg_typeof(v) AS v_type FROM pgw_t ORDER BY k")
    rows = [(k, int(v) if v is not None else None, t)
            for k, v, t in res["rows"]]
    return spark.createDataFrame(rows, "k string, v long, v_type string")


@register(
    "sqlfront_namespaces",
    """
    -- oracle: literal truth of the deterministic schema/search_path script
    SELECT * FROM (VALUES
        ('analytics', 'm1', CAST(10 AS BIGINT)),
        ('staging',   'm1', CAST(1 AS BIGINT)),
        ('path',      'm1', CAST(1 AS BIGINT)),
        ('threepart', 'm1', CAST(10 AS BIGINT))
    ) AS t(via, k, v)
    ORDER BY via
    """,
    "sqlfront", "namespaces",
)
def sqlfront_namespaces(spark, sf_dir):
    """Database/schema namespaces end-to-end: two schemas holding
    same-named tables, resolved via qualified 2-part and 3-part names
    and via search_path precedence. Reference: 3-part naming +
    search_path resolution (src/sql/src/names.rs PartialItemName;
    session vars database/search_path, src/sql/src/session/vars.rs)."""
    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE SCHEMA analytics;
        CREATE SCHEMA staging;
        CREATE TABLE analytics.metrics (k STRING, v BIGINT);
        CREATE TABLE staging.metrics (k STRING, v BIGINT);
        INSERT INTO analytics.metrics VALUES ('m1', 10);
        INSERT INTO staging.metrics VALUES ('m1', 1);
        SET search_path = staging, public
    """)
    a = s.sql("SELECT 'analytics' AS via, k, v FROM analytics.metrics")
    b = s.sql("SELECT 'staging' AS via, k, v FROM staging.metrics")
    # unqualified: staging wins (first in search_path)
    p = s.sql("SELECT 'path' AS via, k, v FROM metrics")
    t = s.sql("SELECT 'threepart' AS via, k, v "
              "FROM materialize.analytics.metrics")
    return a.unionByName(b).unionByName(p).unionByName(t).orderBy("via")


@register(
    "sqlfront_pgwire_extended",
    """
    -- oracle: literal truth of the Parse/Bind/Execute round-trips
    SELECT * FROM (VALUES
        (CAST(3 AS BIGINT), 'r3'),
        (CAST(4 AS BIGINT), 'r4')
    ) AS t(rk, tag)
    ORDER BY rk
    """,
    "sqlfront", "pgwire",
)
def sqlfront_pgwire_extended(spark, sf_dir):
    """pgwire EXTENDED protocol end-to-end: a parameterized SELECT runs
    through Parse (with a typed $1), Bind (text parameter), Describe,
    Execute, Sync over a real socket — the path every production driver
    (psycopg/JDBC) takes. Reference: src/pgwire/src/protocol.rs
    extended-query state machine."""
    from materialize_spark.plans.pgwire import MzPgServer, PgWireClient

    sess = MzSession(spark, sf_dir)
    with MzPgServer(sess) as srv:
        with PgWireClient(srv.host, srv.port) as c:
            c.prepare(
                "q", "SELECT r_regionkey, 'r' || r_regionkey AS tag "
                     "FROM region WHERE r_regionkey > $1 "
                     "AND r_regionkey < $2 ORDER BY r_regionkey",
                param_oids=(20, 20))
            res = c.execute_prepared("q", ["2", "5"])
    rows = [(int(rk), tag) for rk, tag in res["rows"]]
    return spark.createDataFrame(rows, "rk long, tag string")


@register(
    "sqlfront_clusters",
    """
    -- oracle: literal truth of the deterministic cluster DDL script
    SELECT * FROM (VALUES
        ('compute',    '400cc', CAST(2 AS BIGINT)),
        ('quickstart', '1',     CAST(1 AS BIGINT)),
        ('serving',    '100cc', CAST(3 AS BIGINT))
    ) AS t(name, size, replicas)
    ORDER BY name
    """,
    "sqlfront", "clusters",
)
def sqlfront_clusters(spark, sf_dir):
    """Cluster surface end-to-end: CREATE CLUSTER (sized, replicated),
    CREATE CLUSTER REPLICA, SET cluster routing queries to a scheduler
    pool, and introspection via SHOW CLUSTERS / mz_cluster_replicas.
    Reference: CREATE CLUSTER / CLUSTER REPLICA DDL
    (src/sql-parser/src/ast/defs/statement.rs) and compute pools
    (src/cluster/). Spark-first: a cluster IS a scheduler pool."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE CLUSTER compute (SIZE '400cc', REPLICATION FACTOR 2);
        CREATE CLUSTER serving (SIZE '100cc', REPLICATION FACTOR 2);
        CREATE CLUSTER REPLICA serving.r3;
        SET cluster = compute
    """)
    # the peek below runs in the 'compute' pool (SET cluster routing)
    assert s.sql("SELECT 1 AS one").first().one == 1
    assert (spark.sparkContext.getLocalProperty("spark.scheduler.pool")
            == "compute")
    return (s.execute("SHOW CLUSTERS")
            .select("name", "size",
                    F.col("replicas").cast("long").alias("replicas"))
            .orderBy("name"))


@register(
    "sqlfront_pgwire_secure",
    """
    -- oracle: literal truth of the SCRAM+TLS+binary round-trip
    SELECT * FROM (VALUES
        (CAST(0 AS BIGINT), 'AFRICA',  CAST(42 AS BIGINT)),
        (CAST(1 AS BIGINT), 'AMERICA', CAST(42 AS BIGINT)),
        (CAST(2 AS BIGINT), 'ASIA',    CAST(42 AS BIGINT))
    ) AS t(rk, name, param_echo)
    ORDER BY rk
    """,
    "sqlfront", "pgwire", "auth", "tls",
)
def sqlfront_pgwire_secure(spark, sf_dir):
    """The production pgwire posture end-to-end: TLS upgrade
    (SSLRequest → 'S' → handshake), SCRAM-SHA-256 login (RFC 7677 —
    server stores only derived verifiers), then an extended-protocol
    query with a BINARY int8 parameter and binary result format.
    Reference: src/pgwire/src/server.rs TlsMode + protocol.rs
    AuthenticationSASL / format codes. Falls back to plaintext+SCRAM
    when the cryptography package (test certs) is unavailable."""
    import struct as _s

    from materialize_spark.plans.pgwire import MzPgServer, PgWireClient

    sctx = cctx = None
    try:
        from tests.tlsutil import client_ctx, server_ctx
        sctx, cctx = server_ctx(), client_ctx()
    except Exception:
        pass  # cert tooling unavailable: exercise SCRAM in plaintext

    sess = MzSession(spark, sf_dir)
    with MzPgServer(sess, auth={"materialize": "wire-pass"},
                    ssl_context=sctx) as srv:
        with PgWireClient(srv.host, srv.port, password="wire-pass",
                          ssl_context=cctx) as c:
            c.prepare(
                "q", "SELECT r_regionkey, r_name, $1 AS param_echo "
                     "FROM region WHERE r_regionkey < 3 "
                     "ORDER BY r_regionkey",
                param_oids=(20,))
            res = c.execute_prepared(
                "q", [_s.pack(">q", 42)], binary_results=True)
    rows = [(_s.unpack(">q", rk)[0] if len(rk) == 8
             else _s.unpack(">i", rk)[0],
             name.decode(), _s.unpack(">q", echo)[0])
            for rk, name, echo in res["rows"]]
    return spark.createDataFrame(rows, "rk long, name string, "
                                       "param_echo long")


@register(
    "sqlfront_http_api",
    """
    -- oracle: literal truth of the HTTP round-trips
    SELECT * FROM (VALUES
        (CAST(0 AS BIGINT), 'AFRICA', 'simple'),
        (CAST(2 AS BIGINT), 'ASIA',   'extended')
    ) AS t(rk, name, via)
    ORDER BY rk
    """,
    "sqlfront", "http",
)
def sqlfront_http_api(spark, sf_dir):
    """The reference's HTTP SQL endpoint end-to-end
    (/root/reference/src/environmentd/src/http/sql.rs): POST /api/sql
    with a simple batch and an extended request with $n parameters,
    HTTP Basic auth verified against the SCRAM-derived verifier store,
    JSON response in the reference's results shape."""
    import base64 as _b64
    import json as _json
    import urllib.request as _rq

    from materialize_spark.plans.http_api import MzHttpServer

    sess = MzSession(spark, sf_dir)
    rows = []
    with MzHttpServer(sess, auth={"materialize": "api-pass"}) as srv:
        url = f"http://{srv.host}:{srv.port}/api/sql"

        def post(payload):
            req = _rq.Request(url,
                              data=_json.dumps(payload).encode(),
                              headers={"Content-Type":
                                       "application/json"})
            tok = _b64.b64encode(b"materialize:api-pass").decode()
            req.add_header("Authorization", f"Basic {tok}")
            with _rq.urlopen(req, timeout=30) as r:
                return _json.loads(r.read())

        simple = post({"query": "SELECT r_regionkey, r_name FROM region "
                                "WHERE r_regionkey = 0"})
        for rk, name in simple["results"][0]["rows"]:
            rows.append((int(rk), name, "simple"))
        ext = post({"queries": [
            {"query": "SELECT r_regionkey, r_name FROM region "
                      "WHERE r_regionkey = $1", "params": ["2"]}]})
        for rk, name in ext["results"][0]["rows"]:
            rows.append((int(rk), name, "extended"))
    return spark.createDataFrame(rows,
                                 "rk long, name string, via string")


@register(
    "sqlfront_delta_mv",
    """
    -- oracle: literal truth of the write sequence against the delta-
    -- maintained view (threshold 10; 'a' crosses up then back down,
    -- 'b' crosses up via UPDATE)
    SELECT * FROM (VALUES
        ('mid',   'a', CAST(12 AS BIGINT)),
        ('final', 'b', CAST(112 AS BIGINT))
    ) AS t(at, k, total)
    ORDER BY at, k
    """,
    "sqlfront", "ivm", "delta-maintenance",
)
def sqlfront_delta_mv(spark, sf_dir):
    """Always-fresh MVs at the SQL surface: WITH (MAINTENANCE 'delta')
    routes the grouped-sum HAVING shape through the delta-IVM operator
    and every INSERT/UPDATE/DELETE feeds its diff on WRITE — no REFRESH
    anywhere in this sequence (the reference's defining behavior;
    delta_join.rs / reduce.rs retractions)."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dmv_reg_t (k STRING, v BIGINT);
        INSERT INTO dmv_reg_t VALUES ('a', 6), ('a', 6), ('b', 4);
        CREATE MATERIALIZED VIEW dmv_reg WITH (MAINTENANCE 'delta') AS
          SELECT k, SUM(v) AS total FROM dmv_reg_t
          GROUP BY k HAVING SUM(v) > 10;
    """)
    mid = (s.sql("SELECT k, total FROM dmv_reg")
           .withColumn("at", F.lit("mid")))
    s.run_script("""
        INSERT INTO dmv_reg_t VALUES ('b', 8);
        DELETE FROM dmv_reg_t WHERE k = 'a' AND v = 6;
        UPDATE dmv_reg_t SET v = v + 100 WHERE k = 'b' AND v = 4;
    """)
    fin = (s.sql("SELECT k, total FROM dmv_reg")
           .withColumn("at", F.lit("final")))
    return (mid.unionByName(fin)
            .select("at", "k", F.col("total").cast("long").alias("total"))
            .orderBy("at", "k"))


@register(
    "sqlfront_source_status",
    """
    -- oracle: literal truth of the deterministic source-health script
    -- (reference mz_internal.mz_source_statuses / mz_source_statistics,
    --  src/storage-client/src/healthcheck.rs)
    SELECT * FROM (VALUES
        ('hooks', 'webhook', 'running', TRUE,  CAST(3 AS BIGINT)),
        ('k',     'kafka',   'stalled', FALSE, CAST(NULL AS BIGINT)),
        ('src_f', 'file',    'running', TRUE,  CAST(NULL AS BIGINT))
    ) AS t(name, type, status, snapshot_committed, messages_received)
    ORDER BY name
    """,
    "sqlfront", "introspection", "health",
)
def sqlfront_source_status(spark, sf_dir):
    """Source health introspection end-to-end: running sources report
    status + ingest counters, and a wire failure leaves a 'stalled' row
    whose error survives for the operator's "why is my source broken"
    query. Reference: mz_internal.mz_source_statuses /
    mz_source_statistics over the healthcheck status model
    (src/storage-client/src/healthcheck.rs)."""
    import tempfile

    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    spool = tempfile.mkdtemp(prefix="mz_status_src_")
    spark.range(5).toDF("v").write.mode("overwrite").parquet(spool)
    s.execute(f"CREATE SOURCE src_f FROM FILE '{spool}' FORMAT PARQUET")
    s.execute("CREATE SOURCE hooks FROM WEBHOOK BODY FORMAT JSON")
    for i in range(3):
        s.webhook("hooks").post({"n": i})
    s.execute("CREATE CONNECTION dead TO KAFKA (BROKER '127.0.0.1:1')")
    try:
        s.execute("CREATE SOURCE k FROM KAFKA CONNECTION dead "
                  "(TOPIC 't') FORMAT JSON")
    except Exception:
        pass  # the stalled status row is the artifact under test
    assert s.sql("SELECT error FROM mz_source_statuses "
                 "WHERE name = 'k'").first().error
    return s.sql("""
        SELECT st.name, st.type, st.status,
               x.snapshot_committed, x.messages_received
        FROM mz_source_statuses st
        JOIN mz_source_statistics x ON st.name = x.name
        ORDER BY st.name
    """).select("name", "type", "status", "snapshot_committed",
                F.col("messages_received").cast("long")
                .alias("messages_received"))


@register(
    "sqlfront_system_vars",
    """
    -- oracle: literal truth of the deterministic variable script
    -- (reference vars.rs precedence: session > system > default)
    SELECT * FROM (VALUES
        ('cluster',           'quickstart'),
        ('max_result_size',   '1MB'),
        ('statement_timeout', '30s')
    ) AS t(name, setting)
    ORDER BY name
    """,
    "sqlfront", "variables",
)
def sqlfront_system_vars(spark, sf_dir):
    """Variable lifecycle end-to-end: ALTER SYSTEM SET installs a
    default the session observes, an explicit session SET shadows it,
    RESET falls back to the system layer, and SHOW ALL reads the live
    values (reference ShowAllStatement / AlterSystemSetStatement /
    ResetVariableStatement over vars.rs)."""
    s = MzSession(spark, sf_dir)
    s.run_script("""
        ALTER SYSTEM SET statement_timeout = '30s';
        SET max_result_size = '512kB';
        SET max_result_size = '1MB';
        SET cluster = quickstart;
        RESET cluster
    """)
    # session SET survives an ALTER SYSTEM on the same name
    s.execute("ALTER SYSTEM SET max_result_size = '2MB'")
    from pyspark.sql import functions as F
    return (s.execute("SHOW ALL")
            .filter(F.col("name").isin(
                "statement_timeout", "max_result_size", "cluster"))
            .select("name", "setting").orderBy("name"))


@register(
    "sqlfront_role_membership",
    """
    -- oracle: literal truth of the deterministic membership script
    SELECT * FROM (VALUES
        ('rm_dev',    TRUE,  CAST(5 AS BIGINT)),
        ('rm_intern', TRUE,  CAST(5 AS BIGINT)),
        ('rm_lone',   FALSE, CAST(0 AS BIGINT))
    ) AS t(role, can_select, visible_rows)
    ORDER BY role
    """,
    "sqlfront", "role-membership",
)
def sqlfront_role_membership(spark, sf_dir):
    """Role membership end-to-end: GRANT <role> TO <member> confers
    privileges through the transitive closure — a direct member and a
    member-of-a-member both read; an unrelated role is denied
    (reference GrantRoleStatement, statement.rs; rbac.rs role graph
    with unconditional INHERIT)."""
    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE rmq_t AS SELECT r_regionkey FROM region")
    for r in ("rm_eng", "rm_dev", "rm_intern", "rm_lone"):
        sess.execute(f"CREATE ROLE {r}")
    sess.execute("GRANT SELECT ON rmq_t TO rm_eng")
    sess.execute("GRANT rm_eng TO rm_dev")        # direct membership
    sess.execute("GRANT rm_dev TO rm_intern")     # transitive membership
    rows = []
    for role in ("rm_dev", "rm_intern", "rm_lone"):
        sess.execute(f"SET ROLE {role}")
        try:
            n = sess.sql("SELECT count(*) AS n FROM rmq_t").first().n
            rows.append((role, True, n))
        except PermissionError:
            rows.append((role, False, 0))
        finally:
            sess.execute("RESET ROLE")
    return spark.createDataFrame(
        rows, "role string, can_select boolean, visible_rows long"
    ).orderBy("role")


@register(
    "sqlfront_ownership",
    """
    -- oracle: literal truth of the ownership-administration script
    SELECT * FROM (VALUES
        ('alice_owner_reads',      CAST(5  AS BIGINT)),
        ('bob_denied',             CAST(-1 AS BIGINT)),
        ('bob_after_reassign',     CAST(5  AS BIGINT)),
        ('alice_after_reassign',   CAST(-1 AS BIGINT)),
        ('owned_objs_after_drop',  CAST(0  AS BIGINT))
    ) AS t(step, outcome)
    ORDER BY step
    """,
    "sqlfront", "ownership",
)
def sqlfront_ownership(spark, sf_dir):
    """Ownership administration end-to-end: ALTER ... OWNER TO makes the
    new owner read without a grant, REASSIGN OWNED moves every owned
    object, DROP OWNED removes them (reference AlterOwnerStatement,
    ReassignOwnedStatement, DropOwnedStatement; rbac.rs ownership
    checks). -1 encodes permission-denied."""
    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE ROLE own_alice")
    sess.execute("CREATE ROLE own_bob")
    sess.execute("CREATE TABLE ownq_t AS SELECT r_regionkey FROM region")
    sess.execute("ALTER TABLE ownq_t OWNER TO own_alice")

    def reads(role):
        sess.execute(f"SET ROLE {role}")
        try:
            return sess.sql("SELECT count(*) AS n FROM ownq_t").first().n
        except PermissionError:
            return -1
        finally:
            sess.execute("RESET ROLE")

    rows = [("alice_owner_reads", reads("own_alice")),
            ("bob_denied", reads("own_bob"))]
    sess.execute("REASSIGN OWNED BY own_alice TO own_bob")
    rows += [("bob_after_reassign", reads("own_bob")),
             ("alice_after_reassign", reads("own_alice"))]
    sess.execute("DROP OWNED BY own_bob")
    left = sum(1 for o, r in sess._owners.items() if r == "own_bob")
    rows.append(("owned_objs_after_drop", left))
    return spark.createDataFrame(
        rows, "step string, outcome long").orderBy("step")


@register(
    "sqlfront_create_type",
    """
    -- oracle: literal truth of the custom-type script
    SELECT * FROM (VALUES
        ('cast_list',   '1,2,3',  CAST(3 AS BIGINT)),
        ('cast_map',    'k=9',    CAST(1 AS BIGINT)),
        ('table_col',   '4,5',    CAST(2 AS BIGINT)),
        ('mz_types',    'ctq_ints:list,ctq_scores:map', CAST(2 AS BIGINT))
    ) AS t(step, rendered, n)
    ORDER BY step
    """,
    "sqlfront", "create-type",
)
def sqlfront_create_type(spark, sf_dir):
    """Custom types end-to-end: CREATE TYPE ... AS LIST/MAP resolves at
    cast sites and in column definitions, and mz_types lists the
    catalog (reference CreateTypeStatement, statement.rs;
    sql/src/plan/statement/ddl.rs plan_create_type). Outputs stringify
    per the registry convention."""
    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TYPE ctq_ints AS LIST (ELEMENT TYPE = int4)")
    sess.execute("CREATE TYPE ctq_scores AS MAP (KEY TYPE = text, "
                 "VALUE TYPE = int8)")
    r1 = sess.sql(
        "SELECT array_join(array(1,2,3)::ctq_ints, ',') AS s, "
        "size(array(1,2,3)::ctq_ints) AS n").first()
    r2 = sess.sql(
        "SELECT concat_ws('=', map_keys(CAST(map('k', 9) AS "
        "ctq_scores))[0], map_values(CAST(map('k', 9) AS "
        "ctq_scores))[0]) AS s, size(map('k', 9)::ctq_scores) AS n"
    ).first()
    sess.execute("CREATE TABLE ctq_t (k STRING, vals ctq_ints)")
    sess.execute("INSERT INTO ctq_t VALUES ('a', array(4,5))")
    r3 = sess.sql("SELECT array_join(vals, ',') AS s, size(vals) AS n "
                  "FROM ctq_t").first()
    r4 = sess.sql(
        "SELECT concat_ws(',', collect_list(concat(name, ':', "
        "category))) AS s, count(*) AS n FROM (SELECT name, category "
        "FROM mz_types ORDER BY name)").first()
    rows = [("cast_list", r1.s, r1.n), ("cast_map", r2.s, r2.n),
            ("table_col", r3.s, r3.n), ("mz_types", r4.s, r4.n)]
    return spark.createDataFrame(
        rows, "step string, rendered string, n long").orderBy("step")


@register(
    "sqlfront_network_policy",
    """
    -- oracle: literal truth of the network-policy script
    SELECT * FROM (VALUES
        ('default_localhost',  TRUE),
        ('office_localhost',   FALSE),
        ('office_intranet',    TRUE),
        ('pgwire_denied',      TRUE),
        ('pgwire_readmitted',  TRUE)
    ) AS t(step, outcome)
    ORDER BY step
    """,
    "sqlfront", "network-policy",
)
def sqlfront_network_policy(spark, sf_dir):
    """Network policies end-to-end: the active policy's CIDR allow
    rules gate new sessions — checked at the session layer and over a
    real pgwire connection that is denied, then re-admitted after
    ALTER NETWORK POLICY (reference CreateNetworkPolicyStatement /
    AlterNetworkPolicyStatement + the adapter's session deny)."""
    from materialize_spark.plans.pgwire import MzPgServer, PgWireClient
    sess = MzSession(spark, sf_dir)
    rows = []

    def allowed(ip):
        try:
            sess.check_network(ip)
            return True
        except PermissionError:
            return False

    rows.append(("default_localhost", allowed("127.0.0.1")))
    sess.execute("CREATE NETWORK POLICY npq_office (RULES (ny (ACTION "
                 "= 'allow', DIRECTION = 'ingress', ADDRESS = "
                 "'10.1.0.0/16')))")
    sess.execute("ALTER SYSTEM SET network_policy = npq_office")
    rows.append(("office_localhost", allowed("127.0.0.1")))
    rows.append(("office_intranet", allowed("10.1.2.3")))
    with MzPgServer(sess) as srv:
        try:
            PgWireClient(srv.host, srv.port)
            denied = False
        except ValueError:
            denied = True
        rows.append(("pgwire_denied", denied))
        sess.execute("ALTER NETWORK POLICY npq_office SET (RULES (lo "
                     "(ACTION = 'allow', DIRECTION = 'ingress', "
                     "ADDRESS = '127.0.0.0/8')))")
        client = PgWireClient(srv.host, srv.port)
        ok = client.query("SELECT 1 AS x")[0]["rows"] == [["1"]]
        client.close()
        rows.append(("pgwire_readmitted", ok))
    sess.execute("ALTER SYSTEM RESET network_policy")
    return spark.createDataFrame(
        rows, "step string, outcome boolean").orderBy("step")


@register(
    "sqlfront_delta_mv_minmax",
    """
    -- oracle: recompute over the same deterministic write script
    WITH base(k, v) AS (VALUES
        ('a', 10), ('a', 3), ('b', 7), ('b', 25), ('c', 4),
        ('a', 30), ('b', 1)),
    after_del AS (SELECT * FROM base WHERE NOT (k = 'b' AND v < 5)),
    after_upd AS (SELECT k, CASE WHEN k = 'a' THEN v + 5 ELSE v END AS v
                  FROM after_del)
    SELECT k, CAST(SUM(v) AS BIGINT) AS total,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(v) AS BIGINT) AS lo, CAST(MAX(v) AS BIGINT) AS hi
    FROM after_upd GROUP BY k ORDER BY k
    """,
    "sqlfront", "delta-mv-minmax",
)
def sqlfront_delta_mv_minmax(spark, sf_dir):
    """Always-fresh multi-aggregate delta MV: MIN/MAX stay exact under
    DELETE (which can evict the current extreme) and UPDATE, without
    any REFRESH — the reference's Hierarchical reduce plan next to the
    Accumulable one (src/compute-types/src/plan/reduce.rs:253-258;
    maintained by streaming/retraction.RetractionAwareAgg)."""
    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE dmq_t (k STRING, v BIGINT)")
    sess.execute("CREATE MATERIALIZED VIEW dmq_mv WITH (MAINTENANCE "
                 "'delta') AS SELECT k, SUM(v) AS total, COUNT(*) AS n, "
                 "MIN(v) AS lo, MAX(v) AS hi FROM dmq_t GROUP BY k")
    sess.execute("INSERT INTO dmq_t VALUES ('a', 10), ('a', 3), "
                 "('b', 7), ('b', 25), ('c', 4)")
    sess.execute("INSERT INTO dmq_t VALUES ('a', 30), ('b', 1)")
    # delete a group's current MIN: the hierarchical path must re-derive
    sess.execute("DELETE FROM dmq_t WHERE k = 'b' AND v < 5")
    # update shifts every 'a' value (retract old + insert new)
    sess.execute("UPDATE dmq_t SET v = v + 5 WHERE k = 'a'")
    return sess.sql("SELECT k, total, n, lo, hi FROM dmq_mv "
                    "ORDER BY k")


@register(
    "sqlfront_delta_mv_topk",
    """
    -- oracle: recompute over the same deterministic write script
    WITH base(k, v) AS (VALUES
        ('a', 5), ('a', 9), ('a', 2), ('b', 30), ('b', 8), ('b', 12)),
    after_del AS (SELECT * FROM base WHERE NOT (k = 'b' AND v = 30)),
    ranked AS (SELECT k, v, ROW_NUMBER() OVER (PARTITION BY k
               ORDER BY v DESC) AS rn FROM after_del)
    SELECT k, CAST(v AS BIGINT) AS v FROM ranked WHERE rn <= 2
    ORDER BY k, v
    """,
    "sqlfront", "delta-mv-topk",
)
def sqlfront_delta_mv_topk(spark, sf_dir):
    """Always-fresh grouped-TopK delta MV: deleting the current #1 of a
    group pulls the previously-evicted row back into the top k with no
    refresh — the reference's non-monotonic TopK plan guarantee
    (src/compute-types/src/plan/top_k.rs:28-120; maintained by
    streaming/retraction.RetractionAwareTopK)."""
    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE tkq_t (k STRING, v BIGINT)")
    sess.execute("CREATE MATERIALIZED VIEW tkq_mv WITH (MAINTENANCE "
                 "'delta') AS SELECT k, v FROM (SELECT k, v, "
                 "ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) "
                 "AS rn FROM tkq_t) WHERE rn <= 2")
    sess.execute("INSERT INTO tkq_t VALUES ('a', 5), ('a', 9), "
                 "('a', 2), ('b', 30), ('b', 8), ('b', 12)")
    # evict b's current maximum: 8 must re-enter the top 2
    sess.execute("DELETE FROM tkq_t WHERE k = 'b' AND v = 30")
    return sess.sql("SELECT k, v FROM tkq_mv ORDER BY k, v")


@register(
    "sqlfront_delta_mv_join",
    """
    -- oracle: recompute over the same deterministic write script
    WITH ord0(ok, o_ck, amt) AS (VALUES
        (100, 1, 8), (101, 2, 12), (102, 1, 3), (103, 2, 20)),
    cust0(c_ck, seg) AS (VALUES (1, 'AUTO'), (2, 'BLDG'), (3, 'MACH')),
    ord1 AS (SELECT * FROM ord0 WHERE amt <> 12
             UNION ALL VALUES (104, 3, 7)),
    cust1 AS (SELECT * FROM cust0 WHERE c_ck <> 1)
    SELECT seg, CAST(SUM(amt) AS BIGINT) AS rev,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ord1 JOIN cust1 ON o_ck = c_ck GROUP BY seg ORDER BY seg
    """,
    "sqlfront", "delta-mv-join",
)
def sqlfront_delta_mv_join(spark, sf_dir):
    """Always-fresh equi-join + grouped-sum delta MV: each write folds
    through the bilinear delta-join (dA JOIN B + A JOIN dB + dA JOIN
    dB) into the
    grouped aggregate; deleting a CUSTOMER retracts every joined order
    row from the result with no refresh (reference
    src/compute/src/render/join/linear_join.rs; operators
    streaming/ivm_join.py + retraction.py)."""
    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE djq_ord (ok BIGINT, o_ck BIGINT, "
                 "amt BIGINT)")
    sess.execute("CREATE TABLE djq_cust (c_ck BIGINT, seg STRING)")
    sess.execute("INSERT INTO djq_cust VALUES (1, 'AUTO'), "
                 "(2, 'BLDG'), (3, 'MACH')")
    sess.execute("CREATE MATERIALIZED VIEW djq_mv WITH (MAINTENANCE "
                 "'delta') AS SELECT seg, SUM(amt) AS rev, COUNT(*) "
                 "AS n FROM djq_ord JOIN djq_cust ON o_ck = c_ck "
                 "GROUP BY seg")
    sess.execute("INSERT INTO djq_ord VALUES (100, 1, 8), "
                 "(101, 2, 12), (102, 1, 3), (103, 2, 20)")
    sess.execute("DELETE FROM djq_ord WHERE amt = 12")
    sess.execute("INSERT INTO djq_ord VALUES (104, 3, 7)")
    # right-side churn: the join must retract AUTO's joined rows
    sess.execute("DELETE FROM djq_cust WHERE c_ck = 1")
    return sess.sql("SELECT seg, rev, n FROM djq_mv ORDER BY seg")


@register(
    "sqlfront_explain_pushdown",
    """
    -- oracle: literal truth of the pushdown report
    SELECT * FROM (VALUES
        ('arrangement_scan_pushed', TRUE),
        ('parquet_scan_pushed',     TRUE)
    ) AS t(step, outcome)
    ORDER BY step
    """,
    "sqlfront", "explain-pushdown",
)
def sqlfront_explain_pushdown(spark, sf_dir):
    """EXPLAIN FILTER PUSHDOWN end-to-end (reference
    ExplainPushdownStatement): a filtered query over the cached
    arrangement reports its batch-pruning predicates, and the same
    query over a raw parquet view reports PushedFilters reaching the
    reader — the 'did my predicate reach storage' check."""
    sess = MzSession(spark, sf_dir)
    arr = sess.sql(
        "EXPLAIN FILTER PUSHDOWN FOR SELECT l_orderkey FROM lineitem "
        "WHERE l_quantity > 40").collect()
    arrangement_ok = any("l_quantity" in r.pushed_filters for r in arr)
    spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .createOrReplaceTempView("epq_orders_raw")
    raw = sess.sql(
        "EXPLAIN FILTER PUSHDOWN FOR SELECT o_orderkey FROM "
        "epq_orders_raw WHERE o_totalprice > 100000").collect()
    parquet_ok = any("GreaterThan(o_totalprice" in r.pushed_filters
                     for r in raw)
    return spark.createDataFrame(
        [("arrangement_scan_pushed", arrangement_ok),
         ("parquet_scan_pushed", parquet_ok)],
        "step string, outcome boolean").orderBy("step")


@register(
    "sqlfront_delta_mv_outer_join",
    """
    -- oracle: recompute over the net state of the write script
    -- (orders 101/102 survive; customers AUTO and MACH survive —
    --  o_ck=2's match was deleted, so its rows fall into the NULL
    --  group, here COALESCEd for deterministic ordering)
    WITH ord(ok, o_ck, amt) AS (VALUES (101, 2, 12), (102, 3, 5)),
         cust(c_ck, seg) AS (VALUES (1, 'AUTO'), (3, 'MACH'))
    SELECT COALESCE(seg, 'unmatched') AS seg,
           CAST(SUM(amt) AS BIGINT) AS rev,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ord LEFT JOIN cust ON o_ck = c_ck
    GROUP BY seg ORDER BY 1
    """,
    "sqlfront", "delta-mv-join", "outer-join",
)
def sqlfront_delta_mv_outer_join(spark, sf_dir):
    """outer-join→agg delta MV: a LEFT JOIN maintained as inner +
    null-padded anti parts (the reference lowers outer joins to unions
    of inner joins, src/sql/src/plan/lowering.rs; the delta rule
    follows), composed with the retraction-aware aggregate. The write
    script crosses the first-match boundary in BOTH directions: a
    customer insert retracts the NULL-group rows, a customer delete
    restores them — with no REFRESH anywhere."""
    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE djo_ord (ok BIGINT, o_ck BIGINT, "
                 "amt BIGINT)")
    sess.execute("CREATE TABLE djo_cust (c_ck BIGINT, seg STRING)")
    sess.execute("INSERT INTO djo_cust VALUES (1, 'AUTO'), (2, 'BLDG')")
    sess.execute("CREATE MATERIALIZED VIEW djo_mv WITH (MAINTENANCE "
                 "'delta') AS SELECT seg, SUM(amt) AS rev, COUNT(*) "
                 "AS n FROM djo_ord LEFT JOIN djo_cust ON o_ck = c_ck "
                 "GROUP BY seg")
    # o_ck=3 has no customer yet: NULL group forms
    sess.execute("INSERT INTO djo_ord VALUES (100, 1, 8), "
                 "(101, 2, 12), (102, 3, 5)")
    # first match for o_ck=3: the NULL-group rows migrate to MACH
    sess.execute("INSERT INTO djo_cust VALUES (3, 'MACH')")
    # last match for o_ck=2 vanishes: its rows fall back to NULL group
    sess.execute("DELETE FROM djo_cust WHERE c_ck = 2")
    sess.execute("DELETE FROM djo_ord WHERE ok = 100")
    return sess.sql(
        "SELECT COALESCE(seg, 'unmatched') AS seg, rev, n "
        "FROM djo_mv ORDER BY 1")


@register(
    "sqlfront_delta_mv_join_topk",
    """
    -- oracle: recompute of the final net state (order 103 deleted —
    -- it was BLDG's maximum, so 101 re-enters the top 2; customer
    -- AUTO deleted — its whole group vanishes)
    WITH ord(ok, o_ck, amt) AS (VALUES
        (101, 2, 12), (102, 2, 20), (104, 2, 3)),
         cust(c_ck, seg) AS (VALUES (2, 'BLDG'), (3, 'MACH'))
    SELECT seg, ok, CAST(amt AS BIGINT) AS amt FROM (
        SELECT seg, ok, amt, ROW_NUMBER() OVER (
            PARTITION BY seg ORDER BY amt DESC) AS rn
        FROM ord JOIN cust ON o_ck = c_ck) t
    WHERE rn <= 2 ORDER BY seg, amt
    """,
    "sqlfront", "delta-mv-join", "topk",
)
def sqlfront_delta_mv_join_topk(spark, sf_dir):
    """join→TopK delta MV: the bilinear delta-join's output delta feeds
    the retraction-aware grouped TopK (the per-operator plan
    composition the reference's render.rs assembles; TopK plan
    selection src/compute-types/src/plan/top_k.rs). Deleting the
    current per-group maximum pulls a previously-evicted row back into
    the top k — the non-monotonic guarantee — and deleting a customer
    retracts its entire group, all with no REFRESH."""
    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE tkj_ord (ok BIGINT, o_ck BIGINT, "
                 "amt BIGINT)")
    sess.execute("CREATE TABLE tkj_cust (c_ck BIGINT, seg STRING)")
    sess.execute("INSERT INTO tkj_cust VALUES (1, 'AUTO'), "
                 "(2, 'BLDG'), (3, 'MACH')")
    sess.execute("CREATE MATERIALIZED VIEW tkj_mv WITH (MAINTENANCE "
                 "'delta') AS SELECT seg, ok, amt FROM (SELECT seg, "
                 "ok, amt, ROW_NUMBER() OVER (PARTITION BY seg ORDER "
                 "BY amt DESC) AS rn FROM tkj_ord JOIN tkj_cust ON "
                 "o_ck = c_ck) t WHERE rn <= 2")
    sess.execute("INSERT INTO tkj_ord VALUES (100, 1, 9), "
                 "(101, 2, 12), (102, 2, 20), (103, 2, 31), "
                 "(104, 2, 3)")
    # delete BLDG's current #1: evicted 101 must re-enter the top 2
    sess.execute("DELETE FROM tkj_ord WHERE ok = 103")
    # dimension churn: AUTO vanishes entirely
    sess.execute("DELETE FROM tkj_cust WHERE c_ck = 1")
    return sess.sql("SELECT seg, ok, amt FROM tkj_mv ORDER BY seg, amt")


@register(
    "sqlfront_delta_mv_distinct",
    """
    -- oracle: recompute of the final net state (okey 1 deleted — one
    -- of two copies of (10, 100), so the distinct row SURVIVES; okey 3
    -- deleted — the only (11, 50) row, so that one retires)
    WITH ord(ok, ck, price) AS (VALUES (2, 10, 100), (4, 12, 75))
    SELECT DISTINCT CAST(ck AS BIGINT) AS ck,
                    CAST(price AS BIGINT) AS price
    FROM ord ORDER BY ck, price
    """,
    "sqlfront", "delta-mv", "distinct",
)
def sqlfront_delta_mv_distinct(spark, sf_dir):
    """SELECT DISTINCT under delta maintenance (the reference's
    reduce-with-no-aggregates plan, src/compute-types/src/plan/
    reduce.rs Distinct): visibility follows NET row multiplicity —
    deleting one of two duplicates keeps the distinct row, deleting
    the last copy retires it. No REFRESH anywhere."""
    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE ddq_t (ok BIGINT, ck BIGINT, "
                 "price BIGINT)")
    sess.execute("CREATE MATERIALIZED VIEW ddq_mv WITH (MAINTENANCE "
                 "'delta') AS SELECT DISTINCT ck, price FROM ddq_t")
    sess.execute("INSERT INTO ddq_t VALUES (1, 10, 100), "
                 "(2, 10, 100), (3, 11, 50), (4, 12, 75)")
    sess.execute("DELETE FROM ddq_t WHERE ok = 1")  # dup copy: survives
    sess.execute("DELETE FROM ddq_t WHERE ok = 3")  # last copy: retires
    return sess.sql("SELECT ck, price FROM ddq_mv ORDER BY ck, price")


@register(
    "sqlfront_delta_mv_having",
    """
    -- oracle: recompute of the final net state over the join
    WITH ord(ok, o_ck, amt) AS (VALUES
        (101, 1, 30), (103, 2, 99), (104, 2, 2)),
    cust(c_ck, seg) AS (VALUES (1, 'AUTO'), (2, 'BLDG'))
    SELECT seg, CAST(SUM(amt) AS BIGINT) AS rev,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ord JOIN cust ON o_ck = c_ck
    GROUP BY seg HAVING SUM(amt) > 50 ORDER BY seg
    """,
    "sqlfront", "delta-mv", "having",
)
def sqlfront_delta_mv_having(spark, sf_dir):
    """HAVING over multi-aggregate join delta MVs: the threshold is a
    filter above the maintained reduce (reference lowering), so groups
    cross it in BOTH directions under churn — AUTO crosses down when
    its big order is deleted, BLDG crosses up on a later insert."""
    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE dhq_ord (ok BIGINT, o_ck BIGINT, "
                 "amt BIGINT)")
    sess.execute("CREATE TABLE dhq_cust (c_ck BIGINT, seg STRING)")
    sess.execute("INSERT INTO dhq_cust VALUES (1, 'AUTO'), (2, 'BLDG')")
    sess.execute("CREATE MATERIALIZED VIEW dhq_mv WITH (MAINTENANCE "
                 "'delta') AS SELECT seg, SUM(amt) AS rev, COUNT(*) "
                 "AS n FROM dhq_ord JOIN dhq_cust ON o_ck = c_ck "
                 "GROUP BY seg HAVING SUM(amt) > 50")
    sess.execute("INSERT INTO dhq_ord VALUES (100, 1, 80), "
                 "(101, 1, 30), (103, 2, 99)")
    sess.execute("INSERT INTO dhq_ord VALUES (104, 2, 2)")  # BLDG up
    sess.execute("DELETE FROM dhq_ord WHERE ok = 100")      # AUTO down
    return sess.sql("SELECT seg, rev, n FROM dhq_mv ORDER BY seg")


@register(
    "sqlfront_delta_mv_ast_filter",
    """
    -- oracle: recompute of the final net state — the WHERE mixes
    -- columns of BOTH join sides with parens, OR, and a string
    -- literal containing SQL keywords (regex-immune; the AST
    -- dispatcher captures the span token-exactly)
    WITH ord(ok, o_ck, amt, note) AS (VALUES
        (101, 1, 12, 'x'), (102, 2, 60, 'JOIN ON WHERE'),
        (105, 2, 9, 'x')),
    cust(c_ck, seg) AS (VALUES (1, 'AUTO'), (2, 'BLDG'))
    SELECT CAST(ok AS BIGINT) AS ok, seg, CAST(amt AS BIGINT) AS amt
    FROM ord JOIN cust ON o_ck = c_ck
    WHERE (amt > 50 AND seg = 'BLDG') OR note = 'JOIN ON WHERE'
       OR (seg = 'AUTO' AND amt < 20)
    ORDER BY ok
    """,
    "sqlfront", "delta-mv", "ast-dispatch",
)
def sqlfront_delta_mv_ast_filter(spark, sf_dir):
    """Delta MV whose WHERE filters the JOIN OUTPUT with a compound
    predicate over both sides — parenthesized OR branches and a string
    literal full of SQL keywords. The regex-era matcher misparsed
    bodies like this; the AST dispatcher (plans/select_ast.py walked
    by _plan_delta_mv) captures clause spans at token level, the way
    the reference plans from its parsed MIR rather than SQL text
    (src/compute/src/render.rs). Churn crosses the predicate in both
    directions with no REFRESH."""
    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE daf_ord (ok BIGINT, o_ck BIGINT, "
                 "amt BIGINT, note STRING)")
    sess.execute("CREATE TABLE daf_cust (c_ck BIGINT, seg STRING)")
    sess.execute("INSERT INTO daf_cust VALUES (1, 'AUTO'), (2, 'BLDG')")
    sess.execute(
        "CREATE MATERIALIZED VIEW daf_mv WITH (MAINTENANCE 'delta') AS "
        "SELECT ok, seg, amt FROM daf_ord JOIN daf_cust ON o_ck = c_ck "
        "WHERE (amt > 50 AND seg = 'BLDG') OR note = 'JOIN ON WHERE' "
        "OR (seg = 'AUTO' AND amt < 20)")
    sess.execute("INSERT INTO daf_ord VALUES "
                 "(100, 1, 80, 'x'), (101, 1, 30, 'x'), "
                 "(102, 2, 60, 'JOIN ON WHERE'), (103, 2, 99, 'x')")
    # churn: 103 leaves (delete), 101 enters (amt drops under 20),
    # 105 arrives below every branch except none (stays out… then the
    # AUTO branch is irrelevant: seg BLDG, amt 9 → filtered out)
    sess.execute("DELETE FROM daf_ord WHERE ok = 103")
    sess.execute("UPDATE daf_ord SET amt = 12 WHERE ok = 101")
    sess.execute("INSERT INTO daf_ord VALUES (105, 2, 9, 'x')")
    sess.execute("DELETE FROM daf_ord WHERE ok = 100")
    return sess.sql("SELECT ok, seg, amt FROM daf_mv ORDER BY ok")


@register(
    "sqlfront_delta_mv_ast_subquery",
    """
    -- oracle: recompute of the final net state of the agg-over-
    -- subquery body (inner stateless Map/Filter, outer grouped SUM)
    WITH t(k, v, tag) AS (VALUES
        ('aa', 4, 'keep'), ('ab', 6, 'keep'), ('ba', 10, 'keep'),
        ('bb', 3, 'keep'))
    SELECT upper(substr(k, 1, 1)) AS grp,
           CAST(SUM(v * 2) AS BIGINT) AS doubled,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM t WHERE tag = 'keep' AND v > 3
    GROUP BY upper(substr(k, 1, 1)) ORDER BY grp
    """,
    "sqlfront", "delta-mv", "ast-dispatch",
)
def sqlfront_delta_mv_ast_subquery(spark, sf_dir):
    """Aggregate over a SUBQUERY under delta maintenance: the inner
    SELECT is a stateless Map/Filter (scalar expressions + WHERE), so
    it composes as a per-delta transform in front of the maintained
    reduce — the reference's map/filter/project fusion into rendered
    operators (src/compute/src/render.rs). The regex-era matcher had
    no nested-FROM form at all. Churn exercises retraction through
    the inner projection (UPDATE moves a row across the inner filter)."""
    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE das_t (k STRING, v BIGINT, tag STRING)")
    sess.execute(
        "CREATE MATERIALIZED VIEW das_mv WITH (MAINTENANCE 'delta') AS "
        "SELECT grp, SUM(dv) AS doubled, COUNT(*) AS n FROM "
        "(SELECT upper(substr(k, 1, 1)) AS grp, v * 2 AS dv FROM das_t "
        "WHERE tag = 'keep' AND v > 3) GROUP BY grp")
    sess.execute("INSERT INTO das_t VALUES ('aa', 4, 'keep'), "
                 "('ab', 6, 'keep'), ('ba', 2, 'keep'), "
                 "('bb', 3, 'keep'), ('ca', 9, 'drop')")
    # churn: 'ba' crosses INTO the inner filter via UPDATE; the 'drop'
    # row stays invisible; one qualifying row is deleted and re-added
    sess.execute("UPDATE das_t SET v = 10 WHERE k = 'ba'")
    sess.execute("DELETE FROM das_t WHERE k = 'ab'")
    sess.execute("INSERT INTO das_t VALUES ('ab', 6, 'keep')")
    return sess.sql("SELECT grp, doubled, n FROM das_mv ORDER BY grp")


@register(
    "sqlfront_delta_mv_ast_join_subquery",
    """
    -- oracle: recompute of the final net state of the
    -- join→Map/Filter→aggregate body (inner subquery renames a key,
    -- computes an expression column, and filters; outer filters on
    -- the computed column and aggregates)
    WITH ord(ok, ck, amt) AS (VALUES
        (11, 1, 7), (12, 2, 60), (13, 2, 9)),
    cust(ck2, seg) AS (VALUES (1, 'A'), (2, 'B'))
    SELECT grp, CAST(SUM(amt2) AS BIGINT) AS total,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT seg AS grp, amt * 2 AS amt2
          FROM ord JOIN cust ON ck = ck2 WHERE amt > 2)
    WHERE amt2 < 100 GROUP BY grp ORDER BY grp
    """,
    "sqlfront", "delta-mv", "ast-dispatch",
)
def sqlfront_delta_mv_ast_join_subquery(spark, sf_dir):
    """The 'join, clean, aggregate' MV under delta maintenance: the
    body nests a join chain inside a subquery whose select list
    RENAMES a key column and computes expression columns, with filters
    at both levels. The dispatcher flattens it — plain-column aliases
    become renames of the bilinear chain's output delta, expression
    aliases substitute into the outer clauses — onto the existing
    join+reduce operators (the reference's optimizer inlines such
    subqueries before render.rs assembles the dataflow). Churn crosses
    both filters in both directions; no REFRESH anywhere."""
    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE djs_ord (ok BIGINT, ck BIGINT, "
                 "amt BIGINT)")
    sess.execute("CREATE TABLE djs_cust (ck2 BIGINT, seg STRING)")
    sess.execute("INSERT INTO djs_cust VALUES (1, 'A'), (2, 'B')")
    sess.execute("INSERT INTO djs_ord VALUES (10, 1, 5), (11, 1, 7), "
                 "(12, 2, 3)")
    sess.execute(
        "CREATE MATERIALIZED VIEW djs_mv WITH (MAINTENANCE 'delta') AS "
        "SELECT grp, SUM(amt2) AS total, COUNT(*) AS n FROM "
        "(SELECT seg AS grp, amt * 2 AS amt2 FROM djs_ord "
        "JOIN djs_cust ON ck = ck2 WHERE amt > 2) "
        "WHERE amt2 < 100 GROUP BY grp")
    # churn: ok=12 crosses OUT through the OUTER filter via UPDATE
    # (amt2 = 120), ok=10 retracts, ok=13 arrives
    sess.execute("UPDATE djs_ord SET amt = 60 WHERE ok = 12")
    sess.execute("DELETE FROM djs_ord WHERE ok = 10")
    sess.execute("INSERT INTO djs_ord VALUES (13, 2, 9)")
    return sess.sql("SELECT grp, total, n FROM djs_mv ORDER BY grp")


@register(
    "sqlfront_delta_mv_global_topk",
    """
    -- oracle: recompute of the final net state of the global-TopK
    -- body (top 2 by score after the churn: deleting the leader pulls
    -- the previously evicted row back in, then a new leader arrives)
    WITH t(name, score) AS (VALUES
        ('a', 10), ('c', 20), ('d', 5), ('e', 99))
    SELECT name, CAST(score AS BIGINT) AS score
    FROM t WHERE score > 6 ORDER BY score DESC LIMIT 2
    """,
    "sqlfront", "delta-mv", "topk", "ast-dispatch",
)
def sqlfront_delta_mv_global_topk(spark, sf_dir):
    """Global TopK under delta maintenance: ``ORDER BY score DESC
    LIMIT 2`` — the reference's TopK plan with an EMPTY group key
    (src/compute-types/src/plan/top_k.rs; the leaderboard MV).
    Deleting the current leader must pull the previously EVICTED row
    back into the result (the non-monotonic guarantee the full
    compacted support provides). No REFRESH anywhere."""
    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE dgt_t (name STRING, score BIGINT)")
    sess.execute("INSERT INTO dgt_t VALUES ('a', 10), ('b', 30), "
                 "('c', 20), ('d', 5)")
    sess.execute(
        "CREATE MATERIALIZED VIEW dgt_mv WITH (MAINTENANCE 'delta') AS "
        "SELECT name, score FROM dgt_t WHERE score > 6 "
        "ORDER BY score DESC LIMIT 2")
    sess.execute("DELETE FROM dgt_t WHERE name = 'b'")  # leader out
    sess.execute("INSERT INTO dgt_t VALUES ('e', 99)")  # new leader
    return sess.sql("SELECT name, score FROM dgt_mv "
                    "ORDER BY score DESC, name")


@register(
    "sqlfront_subscribe_push_cursors",
    """
    -- oracle: literal truth of the two-subscriber conversation — both
    -- cursors see the identical snapshot AND the identical delta
    -- sequence (the old shared per-object cursor split deltas between
    -- pollers); the late row arrives at both with diff +1 and the
    -- delete at both with diff -1
    SELECT * FROM (VALUES
        ('s1', 'snap',  'a', 1, 1),
        ('s2', 'snap',  'a', 1, 1),
        ('s1', 'delta', 'a', 1, -1),
        ('s1', 'delta', 'b', 2, 1),
        ('s2', 'delta', 'a', 1, -1),
        ('s2', 'delta', 'b', 2, 1)
    ) AS t(sub, phase, k, v, diff)
    ORDER BY sub, phase, k
    """,
    "sqlfront", "subscribe", "serving",
)
def sqlfront_subscribe_push_cursors(spark, sf_dir):
    """Per-subscriber SUBSCRIBE cursors (the reference's one-dataflow-
    sink-per-SUBSCRIBE model, src/compute/src/sink/subscribe.rs): two
    concurrent subscriptions on one object each receive the COMPLETE
    snapshot and the COMPLETE delta sequence, fed by each commit's own
    diff frames — never a shared per-object cursor that the first
    poller consumes, and never a full-table diff on the poll path."""
    from pyspark.sql import functions as F

    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE spc_t (k STRING, v BIGINT)")
    sess.execute("INSERT INTO spc_t VALUES ('a', 1)")
    s1, first1, _ = sess.subscribe_open("SUBSCRIBE spc_t")
    s2, first2, _ = sess.subscribe_open("SUBSCRIBE spc_t")
    sess.execute("INSERT INTO spc_t VALUES ('b', 2)")
    sess.execute("DELETE FROM spc_t WHERE k = 'a'")
    d1 = sess.subscribe_poll(s1)
    d2 = sess.subscribe_poll(s2)
    sess.subscribe_close(s1)
    sess.subscribe_close(s2)

    def tag(df, sub, phase):
        return df.select(F.lit(sub).alias("sub"),
                         F.lit(phase).alias("phase"),
                         "k", "v", F.col("diff").cast("int").alias("diff"))

    return (tag(first1, "s1", "snap")
            .unionByName(tag(first2, "s2", "snap"))
            .unionByName(tag(d1, "s1", "delta"))
            .unionByName(tag(d2, "s2", "delta"))
            .orderBy("sub", "phase", "k"))


@register(
    "sqlfront_ws_api",
    """
    -- oracle: literal truth of the WS conversation — two ad-hoc rows,
    -- then a SUBSCRIBE snapshot row plus one streamed delta row
    SELECT * FROM (VALUES
        ('adhoc',  0, 'AFRICA'),
        ('adhoc',  1, 'AMERICA'),
        ('stream', 1, 'one'),
        ('stream', 2, 'two')
    ) AS t(phase, k, v) ORDER BY phase, k
    """,
    "sqlfront", "serving", "websocket",
)
def sqlfront_ws_api(spark, sf_dir):
    """The WebSocket SQL surface end-to-end (reference environmentd
    GET /api/experimental/sql, src/environmentd/src/http): an RFC 6455
    client runs an ad-hoc query, then SUBSCRIBEs — the snapshot row
    arrives, a write committed WHILE THE STREAM IS OPEN arrives as a
    pushed Row with no client action, and a client frame cancels with
    PG 57014 leaving the connection usable."""
    import base64 as _b64
    import json as _json
    import os as _os
    import socket as _socket
    import struct as _struct

    from materialize_spark.plans.http_api import MzHttpServer

    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE wsq_t (k BIGINT, v STRING)")
    sess.execute("INSERT INTO wsq_t VALUES (1, 'one')")
    rows = []
    with MzHttpServer(sess, port=0) as srv:
        sock = _socket.create_connection((srv.host, srv.port),
                                         timeout=30)
        key = _b64.b64encode(_os.urandom(16)).decode()
        sock.sendall((f"GET /api/experimental/sql HTTP/1.1\r\n"
                      f"Host: x\r\nUpgrade: websocket\r\n"
                      f"Connection: Upgrade\r\n"
                      f"Sec-WebSocket-Key: {key}\r\n"
                      f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
        buf = b""
        while b"\r\n\r\n" not in buf:
            buf += sock.recv(4096)
        tail = [buf.split(b"\r\n\r\n", 1)[1]]

        def exact(n):
            b = b""
            while len(b) < n:
                if tail[0]:
                    take = tail[0][:n - len(b)]
                    tail[0] = tail[0][len(take):]
                    b += take
                    continue
                c = sock.recv(n - len(b))
                if not c:
                    return None
                b += c
            return b

        def recv():
            head = exact(2)
            op, n = head[0] & 0x0F, head[1] & 0x7F
            if n == 126:
                (n,) = _struct.unpack(">H", exact(2))
            data = exact(n) if n else b""
            return op, (_json.loads(data.decode()) if op == 1 else None)

        def send(obj):
            data = _json.dumps(obj).encode()
            mask = _os.urandom(4)
            hdr = bytes([0x81, 0x80 | len(data)])
            sock.sendall(hdr + mask + bytes(
                b ^ mask[i % 4] for i, b in enumerate(data)))

        assert recv()[1]["type"] == "ReadyForQuery"
        send({"query": "SELECT r_regionkey AS k, r_name AS v "
                       "FROM region WHERE r_regionkey < 2 ORDER BY 1"})
        while True:
            _op, m = recv()
            if m["type"] == "Row":
                rows.append(("adhoc", *m["payload"]))
            if m["type"] == "ReadyForQuery":
                break
        send({"query": "SUBSCRIBE wsq_t"})
        _op, m = recv()
        assert m["type"] == "Rows"
        _op, m = recv()  # the snapshot row
        rows.append(("stream", *m["payload"][:2]))
        # a commit while the portal is open: pushed, not polled
        sess.execute("INSERT INTO wsq_t VALUES (2, 'two')")
        _op, m = recv()
        rows.append(("stream", *m["payload"][:2]))
        send({"cancel": True})  # ends the stream (57014 + RFQ)
        while True:
            _op, m = recv()
            if m["type"] == "ReadyForQuery":
                break
        sock.close()
    sess.execute("DROP TABLE wsq_t")
    return spark.createDataFrame(
        rows, "phase string, k long, v string").orderBy("phase", "k")


@register(
    "sqlfront_subscribe_query",
    """
    -- oracle: literal truth of the conversation — the snapshot of the
    -- query's result, then the touched group's diff pair after a commit
    SELECT * FROM (VALUES
        ('snap',  'a', 1, 1),
        ('snap',  'b', 2, 1),
        ('delta', 'a', 1, -1),
        ('delta', 'a', 11, 1)
    ) AS t(phase, k, total, diff)
    ORDER BY phase, k, total
    """,
    "sqlfront", "subscribe", "serving",
)
def sqlfront_subscribe_query(spark, sf_dir):
    """SUBSCRIBE (SELECT ...) — subscribing to a QUERY, not a named
    object (reference: SubscribeStatement's relation is a full query,
    src/sql-parser/src/ast/defs/statement.rs, rendered as its own
    dataflow in src/compute/src/sink/subscribe.rs). The body becomes an
    ephemeral maintained view — delta-maintained here (grouped SUM), so
    each commit pushes exactly the touched group's diff pair; close
    tears the ephemeral view down."""
    from pyspark.sql import functions as F

    sess = MzSession(spark, sf_dir)
    sess.execute("CREATE TABLE sq_t (k STRING, v BIGINT)")
    sess.execute("INSERT INTO sq_t VALUES ('a', 1), ('b', 2)")
    sid, first, _ = sess.subscribe_open(
        "SUBSCRIBE (SELECT k, SUM(v) AS total FROM sq_t GROUP BY k)")
    sess.execute("INSERT INTO sq_t VALUES ('a', 10)")
    delta = sess.subscribe_poll(sid)
    sess.subscribe_close(sid)
    assert not any(n.startswith("__subq") for n in sess._delta_mvs)

    def tag(df, phase):
        return df.select(
            F.lit(phase).alias("phase"), "k",
            F.col("total").cast("int").alias("total"),
            F.col("diff").cast("int").alias("diff"))

    return (tag(first.withColumn("diff", F.col("diff")), "snap")
            .unionByName(tag(delta, "delta"))
            .orderBy("phase", "k", "total"))


@register(
    "sqlfront_delta_mv_union",
    """
    -- oracle: literal truth of the write sequence against a UNION ALL
    -- delta MV over two tables (branch filters apply; duplicates kept)
    SELECT * FROM (VALUES
        ('mid',   'a', CAST(5 AS BIGINT)),
        ('mid',   'a', CAST(5 AS BIGINT)),
        ('mid',   'y', CAST(20 AS BIGINT)),
        ('final', 'a', CAST(5 AS BIGINT)),
        ('final', 'y', CAST(20 AS BIGINT)),
        ('final', 'z', CAST(30 AS BIGINT)),
        ('final', 'q', CAST(7 AS BIGINT))
    ) AS t(at, k, v)
    ORDER BY at, k, v
    """,
    "sqlfront", "ivm", "delta-maintenance", "union",
)
def sqlfront_delta_mv_union(spark, sf_dir):
    """UNION ALL delta maintenance: Union is linear in diff algebra
    (reference MirRelationExpr::Union, src/expr/src/relation/mod.rs;
    render just concatenates the input streams), so each branch
    maintains independently and a commit to either table publishes the
    branches' diff-sum — duplicates across branches are preserved
    (multiset semantics), and branch WHERE filters apply per delta."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dmu_l (k STRING, v BIGINT);
        CREATE TABLE dmu_r (k STRING, v BIGINT);
        INSERT INTO dmu_l VALUES ('a', 5), ('skip', 100);
        INSERT INTO dmu_r VALUES ('a', 5), ('y', 20);
        CREATE MATERIALIZED VIEW dmu WITH (MAINTENANCE 'delta') AS
          SELECT k, v FROM dmu_l WHERE v < 50
          UNION ALL
          SELECT k, v FROM dmu_r;
    """)
    mid = s.sql("SELECT k, v FROM dmu").withColumn("at", F.lit("mid"))
    s.run_script("""
        INSERT INTO dmu_l VALUES ('z', 30), ('skip2', 99);
        DELETE FROM dmu_r WHERE k = 'a';
        UPDATE dmu_l SET k = 'q', v = 7 WHERE k = 'a';
        DELETE FROM dmu_l WHERE k = 'q' AND v = 7;
        INSERT INTO dmu_r VALUES ('q', 7);
        INSERT INTO dmu_l VALUES ('a', 5);
    """)
    fin = s.sql("SELECT k, v FROM dmu").withColumn("at", F.lit("final"))
    return (mid.unionByName(fin)
            .select("at", "k", F.col("v").cast("long").alias("v"))
            .orderBy("at", "k", "v"))


@register(
    "sqlfront_delta_mv_nested_subquery",
    """
    -- oracle: literal truth of the write sequence against a delta MV
    -- whose body nests TWO stateless subquery layers under the reduce
    SELECT * FROM (VALUES
        ('mid',   'a', CAST(10 AS BIGINT)),
        ('mid',   'b', CAST(8 AS BIGINT)),
        ('final', 'a', CAST(4 AS BIGINT)),
        ('final', 'b', CAST(18 AS BIGINT))
    ) AS t(at, grp, total)
    ORDER BY at, grp
    """,
    "sqlfront", "ivm", "delta-maintenance", "subquery",
)
def sqlfront_delta_mv_nested_subquery(spark, sf_dir):
    """Reduce over arbitrarily nested STATELESS subqueries: every layer
    (Map + Filter) composes as a per-delta transform in front of the
    maintained reduce — the reference's optimizer flattens such nests
    into one MapFilterProject before rendering (mfp fusion,
    src/compute/src/render.rs), and round 11 lifts the one-level
    restriction on this engine's dispatcher the same way."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dnst_t (k STRING, v BIGINT);
        INSERT INTO dnst_t VALUES ('a', 1), ('a', 2), ('b', 3),
                                  ('b', -5);
        CREATE MATERIALIZED VIEW dnst WITH (MAINTENANCE 'delta') AS
          SELECT grp, SUM(dbl) AS total FROM
            (SELECT k2 AS grp, v2 * 2 AS dbl FROM
              (SELECT k AS k2, v + 1 AS v2 FROM dnst_t WHERE v > 0)
             WHERE v2 < 100)
          GROUP BY grp;
    """)
    mid = s.sql("SELECT grp, total FROM dnst").withColumn(
        "at", F.lit("mid"))
    s.run_script("""
        INSERT INTO dnst_t VALUES ('b', 4), ('c', -1);
        DELETE FROM dnst_t WHERE k = 'a' AND v = 2;
    """)
    fin = s.sql("SELECT grp, total FROM dnst").withColumn(
        "at", F.lit("final"))
    return (mid.unionByName(fin)
            .select("at", "grp",
                    F.col("total").cast("long").alias("total"))
            .orderBy("at", "grp"))


@register(
    "sqlfront_delta_mv_nonequi_join",
    """
    -- oracle: literal truth of the write sequence against a delta MV
    -- whose join carries a non-equi ON conjunct (amt < cap)
    SELECT * FROM (VALUES
        ('mid',   CAST(1 AS BIGINT), CAST(5 AS BIGINT),  CAST(30 AS BIGINT)),
        ('final', CAST(2 AS BIGINT), CAST(50 AS BIGINT), CAST(60 AS BIGINT)),
        ('final', CAST(4 AS BIGINT), CAST(2 AS BIGINT),  CAST(3 AS BIGINT))
    ) AS t(at, ok, amt, cap)
    ORDER BY at, ok
    """,
    "sqlfront", "ivm", "delta-maintenance", "join",
)
def sqlfront_delta_mv_nonequi_join(spark, sf_dir):
    """Delta-maintained join with a NON-EQUI ON conjunct: the equi
    pairs key the bilinear terms and the residual (amt < cap) filters
    each term — join-then-filter is linear, so Δ(A ⋈σ B) follows the
    same three-term rule (the reference plans residuals as an MFP over
    the join closure, src/compute-types/src/plan/join.rs). Dim updates
    that flip qualification retract/insert the affected rows."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dne_o (ok BIGINT, ck BIGINT, amt BIGINT);
        CREATE TABLE dne_c (cst BIGINT, cap BIGINT);
        INSERT INTO dne_o VALUES (1, 10, 5), (2, 10, 50), (3, 20, 7);
        INSERT INTO dne_c VALUES (10, 30), (20, 3);
        CREATE MATERIALIZED VIEW dne WITH (MAINTENANCE 'delta') AS
          SELECT ok, amt, cap FROM dne_o
          JOIN dne_c ON ck = cst AND amt < cap;
    """)
    mid = s.sql("SELECT ok, amt, cap FROM dne").withColumn(
        "at", F.lit("mid"))
    s.run_script("""
        INSERT INTO dne_o VALUES (4, 20, 2);
        UPDATE dne_c SET cap = 60 WHERE cst = 10;
        DELETE FROM dne_o WHERE ok = 1;
    """)
    fin = s.sql("SELECT ok, amt, cap FROM dne").withColumn(
        "at", F.lit("final"))
    return (mid.unionByName(fin)
            .select("at", "ok", "amt", "cap").orderBy("at", "ok"))


@register(
    "sqlfront_delta_mv_union_agg",
    """
    -- oracle: literal truth of the write sequence against a grouped
    -- SUM over a UNION ALL subquery, delta-maintained
    SELECT * FROM (VALUES
        ('mid',   'a', CAST(11 AS BIGINT)),
        ('mid',   'b', CAST(2 AS BIGINT)),
        ('mid',   'c', CAST(3 AS BIGINT)),
        ('final', 'a', CAST(10 AS BIGINT)),
        ('final', 'b', CAST(22 AS BIGINT)),
        ('final', 'c', CAST(3 AS BIGINT))
    ) AS t(at, k, total)
    ORDER BY at, k
    """,
    "sqlfront", "ivm", "delta-maintenance", "union",
)
def sqlfront_delta_mv_union_agg(spark, sf_dir):
    """Reduce over a UNION ALL subquery: the union's diff-sum feeds the
    maintained RetractionAwareAgg — per-operator composition over a
    Union input, exactly how the reference stacks a reduce over any
    rendered collection (render.rs; Union src/expr/src/relation/
    mod.rs:292). Commits on EITHER branch update only touched groups."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dua_l (k STRING, v BIGINT);
        CREATE TABLE dua_r (k STRING, v BIGINT);
        INSERT INTO dua_l VALUES ('a', 1), ('b', 2);
        INSERT INTO dua_r VALUES ('a', 10), ('c', 3);
        CREATE MATERIALIZED VIEW dua WITH (MAINTENANCE 'delta') AS
          SELECT k, SUM(v) AS total FROM
            (SELECT k, v FROM dua_l WHERE v < 100
             UNION ALL SELECT k, v FROM dua_r)
          GROUP BY k;
    """)
    mid = s.sql("SELECT k, total FROM dua").withColumn(
        "at", F.lit("mid"))
    s.run_script("""
        INSERT INTO dua_r VALUES ('b', 20);
        DELETE FROM dua_l WHERE k = 'a';
    """)
    fin = s.sql("SELECT k, total FROM dua").withColumn(
        "at", F.lit("final"))
    return (mid.unionByName(fin)
            .select("at", "k",
                    F.col("total").cast("long").alias("total"))
            .orderBy("at", "k"))


@register(
    "sqlfront_delta_mv_except",
    """
    -- oracle: literal truth of the write sequence against EXCEPT ALL /
    -- EXCEPT delta MVs over two tables (multiset vs distinct semantics)
    SELECT * FROM (VALUES
        ('mid',   'all',  'a', CAST(1 AS BIGINT)),
        ('mid',   'all',  'c', CAST(3 AS BIGINT)),
        ('mid',   'dist', 'c', CAST(3 AS BIGINT)),
        ('final', 'all',  'a', CAST(1 AS BIGINT)),
        ('final', 'all',  'a', CAST(1 AS BIGINT)),
        ('final', 'all',  'c', CAST(9 AS BIGINT)),
        ('final', 'dist', 'a', CAST(1 AS BIGINT)),
        ('final', 'dist', 'c', CAST(9 AS BIGINT))
    ) AS t(at, mv, k, v)
    ORDER BY at, mv, k, v
    """,
    "sqlfront", "ivm", "delta-maintenance", "setops",
)
def sqlfront_delta_mv_except(spark, sf_dir):
    """EXCEPT [ALL] delta maintenance: the reference compiles EXCEPT
    into Threshold(Union(A, Negate(B))) and maintains it like any
    dataflow (src/sql/src/plan/query.rs plan_set_expr; Negate/Threshold
    at src/expr/src/relation.rs:278-288); here one per-side
    multiplicity state derives the visible count max(mA - mB, 0) — or
    the 0/1 distinct form — re-deriving only the committed rows."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dse_l (k STRING, v BIGINT);
        CREATE TABLE dse_r (k STRING, v BIGINT);
        INSERT INTO dse_l VALUES ('a', 1), ('a', 1), ('b', 2), ('c', 3);
        INSERT INTO dse_r VALUES ('a', 1), ('b', 2), ('b', 2);
        CREATE MATERIALIZED VIEW dse_all WITH (MAINTENANCE 'delta') AS
          SELECT k, v FROM dse_l EXCEPT ALL SELECT k, v FROM dse_r;
        CREATE MATERIALIZED VIEW dse_d WITH (MAINTENANCE 'delta') AS
          SELECT k, v FROM dse_l EXCEPT SELECT k, v FROM dse_r;
    """)

    def snap(at):
        a = s.sql("SELECT k, v FROM dse_all").select(
            F.lit(at).alias("at"), F.lit("all").alias("mv"), "k", "v")
        d = s.sql("SELECT k, v FROM dse_d").select(
            F.lit(at).alias("at"), F.lit("dist").alias("mv"), "k", "v")
        return a.unionByName(d)

    mid = snap("mid")
    s.run_script("""
        INSERT INTO dse_l VALUES ('b', 2);
        DELETE FROM dse_r WHERE k = 'a';
        INSERT INTO dse_r VALUES ('c', 3);
        UPDATE dse_l SET v = 9 WHERE k = 'c';
    """)
    fin = snap("final")
    return (mid.unionByName(fin)
            .select("at", "mv", "k", F.col("v").cast("long").alias("v"))
            .orderBy("at", "mv", "k", "v"))


@register(
    "sqlfront_delta_mv_intersect",
    """
    -- oracle: literal truth of the write sequence against INTERSECT
    -- ALL / INTERSECT / UNION DISTINCT delta MVs over two tables
    SELECT * FROM (VALUES
        ('mid',   'iall', 'a', CAST(1 AS BIGINT)),
        ('mid',   'iall', 'a', CAST(1 AS BIGINT)),
        ('mid',   'iall', 'b', CAST(2 AS BIGINT)),
        ('mid',   'id',   'a', CAST(1 AS BIGINT)),
        ('mid',   'id',   'b', CAST(2 AS BIGINT)),
        ('mid',   'ud',   'a', CAST(1 AS BIGINT)),
        ('mid',   'ud',   'b', CAST(2 AS BIGINT)),
        ('mid',   'ud',   'c', CAST(3 AS BIGINT)),
        ('mid',   'ud',   'd', CAST(4 AS BIGINT)),
        ('final', 'iall', 'c', CAST(3 AS BIGINT)),
        ('final', 'iall', 'd', CAST(4 AS BIGINT)),
        ('final', 'id',   'c', CAST(3 AS BIGINT)),
        ('final', 'id',   'd', CAST(4 AS BIGINT)),
        ('final', 'ud',   'a', CAST(1 AS BIGINT)),
        ('final', 'ud',   'b', CAST(2 AS BIGINT)),
        ('final', 'ud',   'c', CAST(3 AS BIGINT)),
        ('final', 'ud',   'd', CAST(4 AS BIGINT))
    ) AS t(at, mv, k, v)
    ORDER BY at, mv, k, v
    """,
    "sqlfront", "ivm", "delta-maintenance", "setops",
)
def sqlfront_delta_mv_intersect(spark, sf_dir):
    """INTERSECT [ALL] and UNION [DISTINCT] delta maintenance:
    INTERSECT ALL's visible count is min(mA, mB) over the per-side
    nets; UNION DISTINCT is the Distinct reduce over the ALL-form
    Union (reference plan_set_expr, src/sql/src/plan/query.rs) — all
    three stay fresh through deletes that drain one side."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dsi_l (k STRING, v BIGINT);
        CREATE TABLE dsi_r (k STRING, v BIGINT);
        INSERT INTO dsi_l VALUES ('a', 1), ('a', 1), ('b', 2), ('c', 3);
        INSERT INTO dsi_r VALUES ('a', 1), ('a', 1), ('a', 1), ('b', 2),
                                 ('d', 4);
        CREATE MATERIALIZED VIEW dsi_iall WITH (MAINTENANCE 'delta') AS
          SELECT k, v FROM dsi_l INTERSECT ALL SELECT k, v FROM dsi_r;
        CREATE MATERIALIZED VIEW dsi_id WITH (MAINTENANCE 'delta') AS
          SELECT k, v FROM dsi_l INTERSECT SELECT k, v FROM dsi_r;
        CREATE MATERIALIZED VIEW dsi_ud WITH (MAINTENANCE 'delta') AS
          SELECT k, v FROM dsi_l UNION SELECT k, v FROM dsi_r;
    """)

    def snap(at):
        out = None
        for mv, name in (("iall", "dsi_iall"), ("id", "dsi_id"),
                         ("ud", "dsi_ud")):
            part = s.sql(f"SELECT k, v FROM {name}").select(
                F.lit(at).alias("at"), F.lit(mv).alias("mv"), "k", "v")
            out = part if out is None else out.unionByName(part)
        return out

    mid = snap("mid")
    s.run_script("""
        DELETE FROM dsi_l WHERE k = 'a';
        INSERT INTO dsi_l VALUES ('d', 4);
        DELETE FROM dsi_r WHERE k = 'b';
        INSERT INTO dsi_r VALUES ('c', 3), ('c', 3);
    """)
    fin = snap("final")
    return (mid.unionByName(fin)
            .select("at", "mv", "k", F.col("v").cast("long").alias("v"))
            .orderBy("at", "mv", "k", "v"))


@register(
    "sqlfront_delta_mv_window_agg",
    """
    -- oracle: literal truth of the write sequence against a frameless
    -- window-aggregate delta MV (WHERE applies before the window)
    SELECT * FROM (VALUES
        ('mid',   'a', CAST(1 AS BIGINT), CAST(3 AS BIGINT),
         CAST(2 AS BIGINT)),
        ('mid',   'a', CAST(2 AS BIGINT), CAST(3 AS BIGINT),
         CAST(2 AS BIGINT)),
        ('mid',   'b', CAST(5 AS BIGINT), CAST(5 AS BIGINT),
         CAST(1 AS BIGINT)),
        ('final', 'a', CAST(2 AS BIGINT), CAST(12 AS BIGINT),
         CAST(2 AS BIGINT)),
        ('final', 'a', CAST(10 AS BIGINT), CAST(12 AS BIGINT),
         CAST(2 AS BIGINT)),
        ('final', 'c', CAST(4 AS BIGINT), CAST(4 AS BIGINT),
         CAST(1 AS BIGINT))
    ) AS t(at, k, v, tot, n)
    ORDER BY at, k, v
    """,
    "sqlfront", "ivm", "delta-maintenance", "window",
)
def sqlfront_delta_mv_window_agg(spark, sf_dir):
    """Frameless window aggregates (SUM/COUNT OVER (PARTITION BY k))
    delta-maintained: with no ORDER BY the window value is the whole
    partition's aggregate, which the reference lowers to a Reduce
    joined back to its input (window planning in
    src/sql/src/plan/query.rs) — here a RetractionAwareAgg plus a
    touched-partition row refresh, so a commit re-derives only its own
    partitions' rows."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dwa_t (k STRING, v BIGINT);
        INSERT INTO dwa_t VALUES ('a', 1), ('a', 2), ('b', 5),
                                 ('b', 500);
        CREATE MATERIALIZED VIEW dwa WITH (MAINTENANCE 'delta') AS
          SELECT k, v, SUM(v) OVER (PARTITION BY k) AS tot,
                 COUNT(*) OVER (PARTITION BY k) AS n
          FROM dwa_t WHERE v < 100;
    """)
    mid = s.sql("SELECT k, v, tot, n FROM dwa").withColumn(
        "at", F.lit("mid"))
    s.run_script("""
        INSERT INTO dwa_t VALUES ('a', 10), ('c', 4);
        DELETE FROM dwa_t WHERE k = 'b' AND v = 5;
        DELETE FROM dwa_t WHERE k = 'a' AND v = 1;
    """)
    fin = s.sql("SELECT k, v, tot, n FROM dwa").withColumn(
        "at", F.lit("final"))
    return (mid.unionByName(fin)
            .select("at", "k", F.col("v").cast("long").alias("v"),
                    F.col("tot").cast("long").alias("tot"),
                    F.col("n").cast("long").alias("n"))
            .orderBy("at", "k", "v"))


@register(
    "sqlfront_delta_mv_stacked",
    """
    -- oracle: literal truth of the write sequence against a THREE-level
    -- stacked delta-MV chain (join MV -> grouped agg over it ->
    -- stateless filter over that); a base-table commit propagates
    -- through every level
    SELECT * FROM (VALUES
        ('mid',   'agg', 'ann', CAST(30 AS BIGINT), CAST(2 AS BIGINT)),
        ('mid',   'agg', 'bob', CAST(5 AS BIGINT),  CAST(1 AS BIGINT)),
        ('mid',   'hot', 'ann', CAST(30 AS BIGINT), CAST(NULL AS BIGINT)),
        ('final', 'agg', 'ann', CAST(99 AS BIGINT), CAST(1 AS BIGINT)),
        ('final', 'agg', 'bob', CAST(55 AS BIGINT), CAST(2 AS BIGINT)),
        ('final', 'hot', 'ann', CAST(99 AS BIGINT), CAST(NULL AS BIGINT)),
        ('final', 'hot', 'bob', CAST(55 AS BIGINT), CAST(NULL AS BIGINT))
    ) AS t(at, lvl, cname, rev, n)
    ORDER BY at, lvl, cname
    """,
    "sqlfront", "ivm", "delta-maintenance", "stacked",
)
def sqlfront_delta_mv_stacked(spark, sf_dir):
    """Stacked delta MVs — a MAINTENANCE 'delta' view whose base
    relation is ANOTHER delta MV: each level's published diff is the
    next level's commit, the reference's views-over-views dataflow
    composition (a dependent dataflow imports the upstream arrangement,
    src/compute/src/render.rs). The chain here is join MV -> grouped
    aggregate -> stateless filter; one UPDATE/DELETE/INSERT script on
    the base tables must refresh all three levels."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dst_ord (okey BIGINT, ckey BIGINT, price BIGINT);
        CREATE TABLE dst_cust (ck2 BIGINT, cname STRING);
        INSERT INTO dst_ord VALUES (1, 1, 10), (2, 1, 20), (3, 2, 5);
        INSERT INTO dst_cust VALUES (1, 'ann'), (2, 'bob');
        CREATE MATERIALIZED VIEW dst_join WITH (MAINTENANCE 'delta') AS
          SELECT cname, price FROM dst_ord
          JOIN dst_cust ON ckey = ck2;
        CREATE MATERIALIZED VIEW dst_agg WITH (MAINTENANCE 'delta') AS
          SELECT cname, SUM(price) AS rev, COUNT(*) AS n FROM dst_join
          GROUP BY cname;
        CREATE MATERIALIZED VIEW dst_hot WITH (MAINTENANCE 'delta') AS
          SELECT cname, rev FROM dst_agg WHERE rev > 12;
    """)

    def snap(at):
        a = s.sql("SELECT cname, rev, n FROM dst_agg").select(
            F.lit(at).alias("at"), F.lit("agg").alias("lvl"),
            "cname", "rev", "n")
        h = s.sql("SELECT cname, rev FROM dst_hot").select(
            F.lit(at).alias("at"), F.lit("hot").alias("lvl"),
            "cname", "rev", F.lit(None).cast("long").alias("n"))
        return a.unionByName(h)

    mid = snap("mid")
    s.run_script("""
        INSERT INTO dst_ord VALUES (4, 2, 50);
        DELETE FROM dst_ord WHERE okey = 1;
        UPDATE dst_ord SET price = 99 WHERE okey = 2;
    """)
    fin = snap("final")
    return (mid.unionByName(fin)
            .select("at", "lvl", "cname",
                    F.col("rev").cast("long").alias("rev"),
                    F.col("n").cast("long").alias("n"))
            .orderBy("at", "lvl", "cname"))


@register(
    "sqlfront_delta_mv_rank_topk",
    """
    -- oracle: literal truth of the write sequence against RANK /
    -- DENSE_RANK <= k delta MVs (ties share a rank: RANK keeps whole
    -- tie groups past k; DENSE_RANK keeps the k best distinct values)
    SELECT * FROM (VALUES
        ('mid',   'rank',  'a', CAST(1 AS BIGINT), CAST(10 AS BIGINT)),
        ('mid',   'rank',  'a', CAST(2 AS BIGINT), CAST(10 AS BIGINT)),
        ('mid',   'rank',  'b', CAST(5 AS BIGINT), CAST(7 AS BIGINT)),
        ('mid',   'rank',  'b', CAST(6 AS BIGINT), CAST(7 AS BIGINT)),
        ('mid',   'rank',  'b', CAST(7 AS BIGINT), CAST(7 AS BIGINT)),
        ('mid',   'dense', 'a', CAST(1 AS BIGINT), CAST(10 AS BIGINT)),
        ('mid',   'dense', 'a', CAST(2 AS BIGINT), CAST(10 AS BIGINT)),
        ('mid',   'dense', 'a', CAST(3 AS BIGINT), CAST(5 AS BIGINT)),
        ('mid',   'dense', 'b', CAST(5 AS BIGINT), CAST(7 AS BIGINT)),
        ('mid',   'dense', 'b', CAST(6 AS BIGINT), CAST(7 AS BIGINT)),
        ('mid',   'dense', 'b', CAST(7 AS BIGINT), CAST(7 AS BIGINT)),
        ('final', 'rank',  'a', CAST(1 AS BIGINT), CAST(10 AS BIGINT)),
        ('final', 'rank',  'a', CAST(8 AS BIGINT), CAST(9 AS BIGINT)),
        ('final', 'rank',  'b', CAST(5 AS BIGINT), CAST(7 AS BIGINT)),
        ('final', 'rank',  'b', CAST(7 AS BIGINT), CAST(3 AS BIGINT)),
        ('final', 'dense', 'a', CAST(1 AS BIGINT), CAST(10 AS BIGINT)),
        ('final', 'dense', 'a', CAST(8 AS BIGINT), CAST(9 AS BIGINT)),
        ('final', 'dense', 'b', CAST(5 AS BIGINT), CAST(7 AS BIGINT)),
        ('final', 'dense', 'b', CAST(7 AS BIGINT), CAST(3 AS BIGINT))
    ) AS t(at, mv, g, item, score)
    ORDER BY at, mv, g, item
    """,
    "sqlfront", "ivm", "delta-maintenance", "topk",
)
def sqlfront_delta_mv_rank_topk(spark, sf_dir):
    """Grouped TopK via RANK / DENSE_RANK <= k, delta-maintained: the
    reference's TopK plan covers the whole ranking family
    (src/compute-types/src/plan/top_k.rs); under RANK a tie group
    straddling the cut line survives whole, and a delete that breaks
    the tie re-derives only that group from its compacted support."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE drk_t (g STRING, item BIGINT, score BIGINT);
        INSERT INTO drk_t VALUES ('a', 1, 10), ('a', 2, 10),
            ('a', 3, 5), ('a', 4, 4), ('b', 5, 7), ('b', 6, 7),
            ('b', 7, 7);
        CREATE MATERIALIZED VIEW drk_rank WITH (MAINTENANCE 'delta') AS
          SELECT g, item, score FROM (SELECT g, item, score,
            RANK() OVER (PARTITION BY g ORDER BY score DESC) AS rnk
            FROM drk_t) t WHERE rnk <= 2;
        CREATE MATERIALIZED VIEW drk_dense WITH (MAINTENANCE 'delta')
          AS SELECT g, item, score FROM (SELECT g, item, score,
            DENSE_RANK() OVER (PARTITION BY g ORDER BY score DESC)
            AS rnk FROM drk_t) t WHERE rnk <= 2;
    """)

    def snap(at):
        r = s.sql("SELECT g, item, score FROM drk_rank").select(
            F.lit(at).alias("at"), F.lit("rank").alias("mv"),
            "g", "item", "score")
        d = s.sql("SELECT g, item, score FROM drk_dense").select(
            F.lit(at).alias("at"), F.lit("dense").alias("mv"),
            "g", "item", "score")
        return r.unionByName(d)

    mid = snap("mid")
    s.run_script("""
        DELETE FROM drk_t WHERE item = 2;
        INSERT INTO drk_t VALUES ('a', 8, 9);
        DELETE FROM drk_t WHERE item = 6;
        UPDATE drk_t SET score = 3 WHERE item = 7;
    """)
    fin = snap("final")
    return (mid.unionByName(fin)
            .select("at", "mv", "g",
                    F.col("item").cast("long").alias("item"),
                    F.col("score").cast("long").alias("score"))
            .orderBy("at", "mv", "g", "item"))


@register(
    "sqlfront_delta_mv_global_agg",
    """
    -- oracle: literal truth of the write sequence against a keyless
    -- (no GROUP BY) aggregate delta MV, incl. the one-row empty-input
    -- guarantee after a full drain
    SELECT * FROM (VALUES
        ('mid',   CAST(6 AS BIGINT),  CAST(2 AS BIGINT),
         CAST(1 AS BIGINT),    CAST(5 AS BIGINT)),
        ('empty', CAST(NULL AS BIGINT), CAST(0 AS BIGINT),
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        ('final', CAST(77 AS BIGINT), CAST(2 AS BIGINT),
         CAST(7 AS BIGINT),    CAST(70 AS BIGINT))
    ) AS t(at, s, n, lo, hi)
    ORDER BY at
    """,
    "sqlfront", "ivm", "delta-maintenance", "aggregates",
)
def sqlfront_delta_mv_global_agg(spark, sf_dir):
    """Keyless aggregates delta-maintained: the reference's reduce with
    an EMPTY key (src/compute-types/src/plan/reduce.rs renders keyless
    reduces like any other; SQL guarantees one output row even on empty
    input). MIN/MAX survive deletes through the hierarchical support;
    a full drain publishes the empty-input row (COUNT = 0, rest
    NULL)."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dga_t (k STRING, v BIGINT);
        INSERT INTO dga_t VALUES ('a', 1), ('b', 5), ('c', 500);
        CREATE MATERIALIZED VIEW dga WITH (MAINTENANCE 'delta') AS
          SELECT SUM(v) AS s, COUNT(*) AS n, MIN(v) AS lo,
                 MAX(v) AS hi
          FROM dga_t WHERE v < 100;
    """)

    def snap(at):
        return s.sql("SELECT s, n, lo, hi FROM dga").select(
            F.lit(at).alias("at"), "s", "n", "lo", "hi")

    mid = snap("mid")
    s.execute("DELETE FROM dga_t")
    empty = snap("empty")
    s.run_script("INSERT INTO dga_t VALUES ('z', 7), ('y', 70);")
    fin = snap("final")
    return (mid.unionByName(empty).unionByName(fin)
            .select("at", F.col("s").cast("long").alias("s"),
                    F.col("n").cast("long").alias("n"),
                    F.col("lo").cast("long").alias("lo"),
                    F.col("hi").cast("long").alias("hi"))
            .orderBy("at"))


@register(
    "sqlfront_explain_maintenance",
    """
    -- oracle: the rendered maintained-operator trees are deterministic
    -- strings (reduce over a table; stateless map/filter importing an
    -- upstream delta MV)
    SELECT * FROM (VALUES
        ('agg', 0, 'Reduce keys=[''k''] aggs={''tot'': ''accumulable''}'),
        ('agg', 1, '  Scan dxm_t'),
        ('hot', 0, 'Union (diff-sum, linear)'),
        ('hot', 1, '  MapFilterProject [filter: coalesce((tot > 0), false)]'),
        ('hot', 2, '    Import dxm_agg (upstream delta MV)')
    ) AS t(mv, seq, plan)
    ORDER BY mv, seq
    """,
    "sqlfront", "explain", "delta-maintenance",
)
def sqlfront_explain_maintenance(spark, sf_dir):
    """EXPLAIN MAINTENANCE FOR <delta MV>: the maintained-operator
    tree the dispatcher assembled, one line per operator — the
    reference's EXPLAIN over an installed dataflow renders its
    per-operator incremental plans the same way
    (src/compute-types/src/plan/{reduce,top_k,join}.rs). Includes the
    stacked-MV case: the downstream view's leaf is an Import of the
    upstream arrangement, not a table scan."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dxm_t (k STRING, v BIGINT);
        INSERT INTO dxm_t VALUES ('a', 1);
        CREATE MATERIALIZED VIEW dxm_agg WITH (MAINTENANCE 'delta') AS
          SELECT k, SUM(v) AS tot FROM dxm_t GROUP BY k;
        CREATE MATERIALIZED VIEW dxm_hot WITH (MAINTENANCE 'delta') AS
          SELECT k, tot FROM dxm_agg WHERE tot > 0;
    """)
    a = s.sql("EXPLAIN MAINTENANCE FOR MATERIALIZED VIEW dxm_agg") \
        .select(F.lit("agg").alias("mv"), "seq", "plan")
    h = s.sql("EXPLAIN MAINTENANCE FOR MATERIALIZED VIEW dxm_hot") \
        .select(F.lit("hot").alias("mv"), "seq", "plan")
    return a.unionByName(h).orderBy("mv", "seq")


@register(
    "sqlfront_delta_mv_expr_group_keys",
    """
    -- oracle: literal truth of the write sequence against delta MVs
    -- grouped on EXPRESSION keys (a date_trunc bucket and a
    -- concatenation, incl. the GROUP BY-alias form)
    SELECT * FROM (VALUES
        ('mid',   'day',  '2024-01-01', CAST(3 AS BIGINT),
         CAST(2 AS BIGINT)),
        ('mid',   'day',  '2024-01-02', CAST(30 AS BIGINT),
         CAST(1 AS BIGINT)),
        ('mid',   'tag',  'A',          CAST(2 AS BIGINT),
         CAST(NULL AS BIGINT)),
        ('mid',   'tag',  'B',          CAST(30 AS BIGINT),
         CAST(NULL AS BIGINT)),
        ('final', 'day',  '2024-01-01', CAST(2 AS BIGINT),
         CAST(2 AS BIGINT)),
        ('final', 'day',  '2024-01-02', CAST(37 AS BIGINT),
         CAST(2 AS BIGINT)),
        ('final', 'tag',  'A',          CAST(7 AS BIGINT),
         CAST(NULL AS BIGINT)),
        ('final', 'tag',  'B',          CAST(30 AS BIGINT),
         CAST(NULL AS BIGINT))
    ) AS t(at, mv, key, agg1, agg2)
    ORDER BY at, mv, key
    """,
    "sqlfront", "ivm", "delta-maintenance", "aggregates",
)
def sqlfront_delta_mv_expr_group_keys(spark, sf_dir):
    """Expression GROUP BY keys delta-maintained: the key expression
    (date_trunc bucket / upper()) computes on each delta before the
    keyed reduce, the reference's pre-reduce Map — its reduce group_key
    is a list of scalar EXPRESSIONS, not column refs
    (src/compute-types/src/plan/reduce.rs). Both the repeated-
    expression and GROUP BY-alias spellings plan."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dek_t (k STRING, ts TIMESTAMP, v BIGINT);
        INSERT INTO dek_t VALUES
            ('a', TIMESTAMP '2024-01-01 10:30:00', 1),
            ('a', TIMESTAMP '2024-01-01 23:00:00', 2),
            ('b', TIMESTAMP '2024-01-02 05:00:00', 30);
        CREATE MATERIALIZED VIEW dek_day WITH (MAINTENANCE 'delta') AS
          SELECT date_trunc('day', ts) AS day, SUM(v) AS tot,
                 COUNT(*) AS n
          FROM dek_t GROUP BY date_trunc('day', ts);
        CREATE MATERIALIZED VIEW dek_tag WITH (MAINTENANCE 'delta') AS
          SELECT upper(k) AS tag, MAX(v) AS hi FROM dek_t
          GROUP BY tag;
    """)

    def snap(at):
        d = s.sql("SELECT day, tot, n FROM dek_day").select(
            F.lit(at).alias("at"), F.lit("day").alias("mv"),
            F.date_format("day", "yyyy-MM-dd").alias("key"),
            F.col("tot").alias("agg1"), F.col("n").alias("agg2"))
        t = s.sql("SELECT tag, hi FROM dek_tag").select(
            F.lit(at).alias("at"), F.lit("tag").alias("mv"),
            F.col("tag").alias("key"), F.col("hi").alias("agg1"),
            F.lit(None).cast("long").alias("agg2"))
        return d.unionByName(t)

    mid = snap("mid")
    s.run_script("""
        INSERT INTO dek_t VALUES
            ('a', TIMESTAMP '2024-01-02 09:00:00', 7),
            ('a', TIMESTAMP '2024-01-01 01:00:00', 8);
        DELETE FROM dek_t WHERE v = 2;
        UPDATE dek_t SET v = 1 WHERE v = 8;
    """)
    fin = snap("final")
    return (mid.unionByName(fin)
            .select("at", "mv", "key",
                    F.col("agg1").cast("long").alias("agg1"),
                    F.col("agg2").cast("long").alias("agg2"))
            .orderBy("at", "mv", "key"))


@register(
    "sqlfront_delta_mv_window_share",
    """
    -- oracle: literal truth of the write sequence against a delta MV
    -- mixing a per-partition window SUM and the global OVER () total
    -- (the share-of-total idiom)
    SELECT * FROM (VALUES
        ('mid',   'a', CAST(1 AS BIGINT), CAST(4 AS BIGINT),
         CAST(10 AS BIGINT)),
        ('mid',   'a', CAST(3 AS BIGINT), CAST(4 AS BIGINT),
         CAST(10 AS BIGINT)),
        ('mid',   'b', CAST(6 AS BIGINT), CAST(6 AS BIGINT),
         CAST(10 AS BIGINT)),
        ('final', 'a', CAST(3 AS BIGINT), CAST(3 AS BIGINT),
         CAST(13 AS BIGINT)),
        ('final', 'b', CAST(4 AS BIGINT), CAST(10 AS BIGINT),
         CAST(13 AS BIGINT)),
        ('final', 'b', CAST(6 AS BIGINT), CAST(10 AS BIGINT),
         CAST(13 AS BIGINT))
    ) AS t(at, k, v, sk, total)
    ORDER BY at, k, v
    """,
    "sqlfront", "ivm", "delta-maintenance", "window",
)
def sqlfront_delta_mv_window_share(spark, sf_dir):
    """Multiple frameless window sets in one delta MV — a per-partition
    SUM plus the global OVER () total (share-of-total): each distinct
    partition key set keeps its own maintained reduce (the empty set
    is the keyless reduce), and a commit re-derives rows through every
    set's join-back — the reference plans one Reduce per distinct
    window partition the same way (window planning in
    src/sql/src/plan/query.rs)."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dmw_t (k STRING, v BIGINT);
        INSERT INTO dmw_t VALUES ('a', 1), ('a', 3), ('b', 6);
        CREATE MATERIALIZED VIEW dmw WITH (MAINTENANCE 'delta') AS
          SELECT k, v, SUM(v) OVER (PARTITION BY k) AS sk,
                 SUM(v) OVER () AS total
          FROM dmw_t;
    """)

    def snap(at):
        return s.sql("SELECT k, v, sk, total FROM dmw").select(
            F.lit(at).alias("at"), "k", "v", "sk", "total")

    mid = snap("mid")
    s.run_script("""
        INSERT INTO dmw_t VALUES ('b', 4);
        DELETE FROM dmw_t WHERE k = 'a' AND v = 1;
    """)
    fin = snap("final")
    return (mid.unionByName(fin)
            .select("at", "k", F.col("v").cast("long").alias("v"),
                    F.col("sk").cast("long").alias("sk"),
                    F.col("total").cast("long").alias("total"))
            .orderBy("at", "k", "v"))


@register(
    "sqlfront_delta_mv_join_from_subquery",
    """
    -- oracle: literal truth of the write sequence against a delta MV
    -- joining a stateless FROM-subquery (computed column + filter)
    -- with a dimension table, grouped above the join
    SELECT * FROM (VALUES
        ('mid',   'ann', CAST(20 AS BIGINT), CAST(1 AS BIGINT)),
        ('mid',   'bob', CAST(10 AS BIGINT), CAST(1 AS BIGINT)),
        ('final', 'ann', CAST(180 AS BIGINT), CAST(2 AS BIGINT)),
        ('final', 'bob', CAST(24 AS BIGINT), CAST(2 AS BIGINT))
    ) AS t(at, cname, rev, n)
    ORDER BY at, cname
    """,
    "sqlfront", "ivm", "delta-maintenance", "subquery", "join",
)
def sqlfront_delta_mv_join_from_subquery(spark, sf_dir):
    """FROM (stateless subquery) JOIN dim — desugared into a STACKED
    plan: the subquery forms an internal delta MV (one-branch
    Map/Filter spine) that the bilinear join chain imports as its
    first base relation, the way the reference renders a Let binding
    feeding a join (src/compute/src/render.rs builds the subplan once
    and imports its arrangement). The internal view is planner-owned
    and dies with the outer view."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE djf_ord (okey BIGINT, ckey BIGINT, price BIGINT);
        CREATE TABLE djf_cust (ck2 BIGINT, cname STRING);
        INSERT INTO djf_ord VALUES (1, 1, 10), (2, 2, 5), (3, 1, 900);
        INSERT INTO djf_cust VALUES (1, 'ann'), (2, 'bob');
        CREATE MATERIALIZED VIEW djf WITH (MAINTENANCE 'delta') AS
          SELECT cname, SUM(dbl) AS rev, COUNT(*) AS n FROM
            (SELECT ckey, price * 2 AS dbl FROM djf_ord
             WHERE price < 100)
          JOIN djf_cust ON ckey = ck2 GROUP BY cname;
    """)

    def snap(at):
        return s.sql("SELECT cname, rev, n FROM djf").select(
            F.lit(at).alias("at"), "cname", "rev", "n")

    mid = snap("mid")
    s.run_script("""
        INSERT INTO djf_ord VALUES (4, 2, 7), (5, 1, 40);
        DELETE FROM djf_ord WHERE okey = 1;
        UPDATE djf_ord SET price = 50 WHERE okey = 3;
    """)
    fin = snap("final")
    return (mid.unionByName(fin)
            .select("at", "cname",
                    F.col("rev").cast("long").alias("rev"),
                    F.col("n").cast("long").alias("n"))
            .orderBy("at", "cname"))


@register(
    "sqlfront_delta_mv_distinct_aggs",
    """
    -- oracle: literal truth of the write sequence against
    -- COUNT(DISTINCT) / SUM(DISTINCT) delta MVs (grouped and keyless)
    SELECT * FROM (VALUES
        ('mid',   'a',   CAST(2 AS BIGINT), CAST(3 AS BIGINT),
         CAST(4 AS BIGINT)),
        ('mid',   'b',   CAST(1 AS BIGINT), CAST(5 AS BIGINT),
         CAST(5 AS BIGINT)),
        ('mid',   '_all', CAST(3 AS BIGINT), CAST(8 AS BIGINT),
         CAST(NULL AS BIGINT)),
        ('final', 'a',   CAST(1 AS BIGINT), CAST(2 AS BIGINT),
         CAST(4 AS BIGINT)),
        ('final', 'b',   CAST(2 AS BIGINT), CAST(12 AS BIGINT),
         CAST(17 AS BIGINT)),
        ('final', '_all', CAST(3 AS BIGINT), CAST(14 AS BIGINT),
         CAST(NULL AS BIGINT))
    ) AS t(at, k, nd, sd, tot)
    ORDER BY at, k
    """,
    "sqlfront", "ivm", "delta-maintenance", "aggregates",
)
def sqlfront_delta_mv_distinct_aggs(spark, sf_dir):
    """COUNT(DISTINCT) / SUM(DISTINCT) delta-maintained: both re-derive
    from the shared compacted (group, value) support the hierarchical
    aggregates keep — the reference collates distinct aggregates
    through a DistinctBy reduce over the group's values
    (src/compute-types/src/plan/reduce.rs). A delete that removes the
    LAST copy of a value drops it from the distinct set; earlier
    copies keep it. The keyless form rides the same global-agg path."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dda_t (k STRING, v BIGINT);
        INSERT INTO dda_t VALUES ('a', 1), ('a', 1), ('a', 2),
                                 ('b', 5);
        CREATE MATERIALIZED VIEW dda WITH (MAINTENANCE 'delta') AS
          SELECT k, COUNT(DISTINCT v) AS nd, SUM(DISTINCT v) AS sd,
                 SUM(v) AS tot
          FROM dda_t GROUP BY k;
        CREATE MATERIALIZED VIEW dda_g WITH (MAINTENANCE 'delta') AS
          SELECT COUNT(DISTINCT v) AS nd, SUM(DISTINCT v) AS sd
          FROM dda_t;
    """)

    def snap(at):
        g = s.sql("SELECT k, nd, sd, tot FROM dda").select(
            F.lit(at).alias("at"), "k", "nd", "sd", "tot")
        a = s.sql("SELECT nd, sd FROM dda_g").select(
            F.lit(at).alias("at"), F.lit("_all").alias("k"),
            "nd", "sd", F.lit(None).cast("long").alias("tot"))
        return g.unionByName(a)

    mid = snap("mid")
    s.run_script("""
        DELETE FROM dda_t WHERE k = 'a' AND v = 1;
        INSERT INTO dda_t VALUES ('b', 7), ('b', 5), ('a', 2);
    """)
    fin = snap("final")
    return (mid.unionByName(fin)
            .select("at", "k", F.col("nd").cast("long").alias("nd"),
                    F.col("sd").cast("long").alias("sd"),
                    F.col("tot").cast("long").alias("tot"))
            .orderBy("at", "k"))


@register(
    "sqlfront_delta_mv_exists",
    """
    -- oracle: literal truth of the write sequence against EXISTS /
    -- IN (SELECT ...) delta MVs (semi-join maintenance: keys appear
    -- and retract as the inner support crosses zero)
    SELECT * FROM (VALUES
        ('mid',   'ex', CAST(1 AS BIGINT), 'a'),
        ('mid',   'ex', CAST(3 AS BIGINT), 'c'),
        ('mid',   'in', CAST(1 AS BIGINT), 'a'),
        ('mid',   'in', CAST(3 AS BIGINT), 'c'),
        ('final', 'ex', CAST(2 AS BIGINT), 'b'),
        ('final', 'ex', CAST(3 AS BIGINT), 'c'),
        ('final', 'ex', CAST(4 AS BIGINT), 'd'),
        ('final', 'in', CAST(2 AS BIGINT), 'b'),
        ('final', 'in', CAST(3 AS BIGINT), 'c'),
        ('final', 'in', CAST(4 AS BIGINT), 'd')
    ) AS t(at, mv, k, v)
    ORDER BY at, mv, k
    """,
    "sqlfront", "ivm", "delta-maintenance", "subquery",
)
def sqlfront_delta_mv_exists(spark, sf_dir):
    """Correlated EXISTS and membership IN delta-maintained as
    semi-joins: the reference decorrelates both into semi-join
    dataflows during lowering (src/sql/src/plan/lowering.rs:10-37)
    and maintains the inner relation as an arrangement keyed by the
    correlation; here a SemiAntiFilterMV keeps (key -> support count)
    and inner-side commits emit ± the current outer rows of keys whose
    support crossed zero (streaming/semijoin.py). Churn hits BOTH
    sides: outer inserts probe the live support, inner deletes retract
    previously-qualified outer rows."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dex_t (k BIGINT, v STRING);
        CREATE TABLE dex_u (k2 BIGINT, w BIGINT);
        INSERT INTO dex_t VALUES (1, 'a'), (2, 'b'), (3, 'c');
        INSERT INTO dex_u VALUES (1, 10), (1, 11), (3, 20), (9, 30);
        CREATE MATERIALIZED VIEW dex_e WITH (MAINTENANCE 'delta') AS
          SELECT k, v FROM dex_t
          WHERE EXISTS (SELECT 1 FROM dex_u
                        WHERE dex_u.k2 = dex_t.k AND dex_u.w < 100);
        CREATE MATERIALIZED VIEW dex_i WITH (MAINTENANCE 'delta') AS
          SELECT k, v FROM dex_t
          WHERE k IN (SELECT k2 FROM dex_u WHERE w < 100);
    """)

    def snap(at):
        e = s.sql("SELECT k, v FROM dex_e").select(
            F.lit(at).alias("at"), F.lit("ex").alias("mv"), "k", "v")
        i = s.sql("SELECT k, v FROM dex_i").select(
            F.lit(at).alias("at"), F.lit("in").alias("mv"), "k", "v")
        return e.unionByName(i)

    mid = snap("mid")
    s.run_script("""
        DELETE FROM dex_u WHERE k2 = 1;
        INSERT INTO dex_u VALUES (2, 5), (4, 6);
        INSERT INTO dex_t VALUES (4, 'd');
        DELETE FROM dex_t WHERE k = 1;
    """)
    fin = snap("final")
    return (mid.unionByName(fin)
            .select("at", "mv", F.col("k").cast("long").alias("k"), "v")
            .orderBy("at", "mv", "k"))


@register(
    "sqlfront_delta_mv_not_exists",
    """
    -- oracle: literal truth of the write sequence against NOT EXISTS /
    -- NOT IN delta MVs, incl. SQL's three-valued NOT IN semantics (an
    -- inner NULL poisons every row; the empty inner set keeps all)
    SELECT * FROM (VALUES
        ('mid',    'nex', CAST(2 AS BIGINT), 'b'),
        ('mid',    'nex', NULL, 'n'),
        ('mid',    'nin', CAST(2 AS BIGINT), 'b'),
        ('poison', 'nex', CAST(2 AS BIGINT), 'b'),
        ('poison', 'nex', NULL, 'n'),
        ('final',  'nex', CAST(1 AS BIGINT), 'a'),
        ('final',  'nex', CAST(2 AS BIGINT), 'b'),
        ('final',  'nex', NULL, 'n'),
        ('final',  'nin', CAST(1 AS BIGINT), 'a'),
        ('final',  'nin', CAST(2 AS BIGINT), 'b')
    ) AS t(at, mv, k, v)
    ORDER BY at, mv, k, v
    """,
    "sqlfront", "ivm", "delta-maintenance", "subquery",
)
def sqlfront_delta_mv_not_exists(spark, sf_dir):
    """NOT EXISTS / NOT IN delta-maintained as anti-joins with exact
    SQL three-valued semantics: NOT EXISTS keeps NULL-keyed outer rows
    (a NULL key matches nothing, so the anti-join holds them), while
    NOT IN drops them unless the inner set is EMPTY, and one inner
    NULL poisons every outer row (x <> NULL is UNKNOWN). The inner
    null-count and total are scalar frontiers whose zero-crossings
    re-derive the outer side — the reference gets the same answers
    from its decorrelated anti-join plan (lowering.rs)."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dnx_t (k BIGINT, v STRING);
        CREATE TABLE dnx_u (j BIGINT);
        INSERT INTO dnx_t VALUES (1, 'a'), (2, 'b'), (NULL, 'n');
        INSERT INTO dnx_u VALUES (1), (1), (7);
        CREATE MATERIALIZED VIEW dnx_e WITH (MAINTENANCE 'delta') AS
          SELECT k, v FROM dnx_t
          WHERE NOT EXISTS (SELECT 1 FROM dnx_u
                            WHERE dnx_u.j = dnx_t.k);
        CREATE MATERIALIZED VIEW dnx_i WITH (MAINTENANCE 'delta') AS
          SELECT k, v FROM dnx_t WHERE k NOT IN (SELECT j FROM dnx_u);
    """)

    def snap(at):
        e = s.sql("SELECT k, v FROM dnx_e").select(
            F.lit(at).alias("at"), F.lit("nex").alias("mv"), "k", "v")
        i = s.sql("SELECT k, v FROM dnx_i").select(
            F.lit(at).alias("at"), F.lit("nin").alias("mv"), "k", "v")
        return e.unionByName(i)

    mid = snap("mid")
    s.run_script("INSERT INTO dnx_u VALUES (NULL);")
    poison = snap("poison")
    s.run_script("""
        DELETE FROM dnx_u WHERE j IS NULL;
        DELETE FROM dnx_u WHERE j = 1;
    """)
    fin = snap("final")
    return (mid.unionByName(poison).unionByName(fin)
            .select("at", "mv", F.col("k").cast("long").alias("k"), "v")
            .orderBy("at", "mv", "k", "v"))


@register(
    "sqlfront_delta_mv_q21_exists",
    """
    -- oracle: literal truth of the write sequence against the TPC-H
    -- q21 shape — join chain + EXISTS(other supplier) + NOT
    -- EXISTS(other LATE supplier) with <> correlation, GROUP BY count
    SELECT * FROM (VALUES
        ('mid',   's1', CAST(1 AS BIGINT)),
        ('final', 's1', CAST(1 AS BIGINT)),
        ('final', 's2', CAST(1 AS BIGINT))
    ) AS t(at, s_name, numwait)
    ORDER BY at, s_name
    """,
    "sqlfront", "ivm", "delta-maintenance", "subquery", "tpch",
)
def sqlfront_delta_mv_q21_exists(spark, sf_dir):
    """The reference's flagship maintained NOT-EXISTS shape — TPC-H
    q21 as written (test/sqllogictest/tpch_create_materialized_view.slt
    maintains all 22 queries, q21 included): a 4-relation join chain
    whose WHERE carries a self-correlated EXISTS and NOT EXISTS with a
    <> member exclusion, under a grouped COUNT(*). The <> support is
    kept per (order, supplier) with per-key totals — a pair qualifies
    iff ANOTHER member's (late) row exists — exactly the reference's
    decorrelated semi/anti join pair over the same arrangement
    (lowering.rs; delta_join.rs). Commits to ANY of the five roles
    (chain tables or either subquery side) keep the count fresh."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dq_supp (s_suppkey BIGINT, s_name STRING,
                              s_nationkey BIGINT);
        CREATE TABLE dq_li (l_orderkey BIGINT, l_suppkey BIGINT,
                            l_receiptdate BIGINT, l_commitdate BIGINT);
        CREATE TABLE dq_ord (o_orderkey BIGINT, o_orderstatus STRING);
        CREATE TABLE dq_nat (n_nationkey BIGINT, n_name STRING);
        INSERT INTO dq_supp VALUES (1, 's1', 10), (2, 's2', 10),
                                   (3, 's3', 20);
        INSERT INTO dq_nat VALUES (10, 'SAUDI ARABIA'), (20, 'FRANCE');
        INSERT INTO dq_ord VALUES (100, 'F'), (200, 'F'), (300, 'O');
        INSERT INTO dq_li VALUES (100, 1, 5, 3), (100, 2, 2, 3),
                                 (200, 1, 9, 3), (200, 2, 9, 3),
                                 (300, 1, 9, 3);
        CREATE MATERIALIZED VIEW dq21 WITH (MAINTENANCE 'delta') AS
          SELECT s_name, COUNT(*) AS numwait
          FROM dq_supp
          JOIN dq_li ON s_suppkey = l_suppkey
          JOIN dq_ord ON o_orderkey = l_orderkey
          JOIN dq_nat ON s_nationkey = n_nationkey
          WHERE o_orderstatus = 'F' AND l_receiptdate > l_commitdate
            AND n_name = 'SAUDI ARABIA'
            AND EXISTS (SELECT 1 FROM dq_li l2
                        WHERE l2.l_orderkey = dq_li.l_orderkey
                          AND l2.l_suppkey <> dq_li.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM dq_li l3
                            WHERE l3.l_orderkey = dq_li.l_orderkey
                              AND l3.l_suppkey <> dq_li.l_suppkey
                              AND l3.l_receiptdate > l3.l_commitdate)
          GROUP BY s_name;
    """)
    mid = s.sql("SELECT s_name, numwait FROM dq21").withColumn(
        "at", F.lit("mid"))
    # churn every role: a lineitem UPDATE flips order 200 to a
    # single-late-supplier order (s2 now waits there), and a new
    # F-order 400 gives s1 a second waiting line — but its other
    # supplier turns late in the same script, cancelling it again
    s.run_script("""
        UPDATE dq_li SET l_receiptdate = 2
          WHERE l_orderkey = 200 AND l_suppkey = 1;
        INSERT INTO dq_ord VALUES (400, 'F');
        INSERT INTO dq_li VALUES (400, 1, 9, 3), (400, 3, 2, 3);
        DELETE FROM dq_li WHERE l_orderkey = 400 AND l_suppkey = 3;
        INSERT INTO dq_li VALUES (400, 3, 9, 3);
    """)
    fin = s.sql("SELECT s_name, numwait FROM dq21").withColumn(
        "at", F.lit("final"))
    return (mid.unionByName(fin)
            .select("at", "s_name",
                    F.col("numwait").cast("long").alias("numwait"))
            .orderBy("at", "s_name"))


@register(
    "sqlfront_delta_mv_window_order",
    """
    -- oracle: literal truth of the write sequence against an ordered-
    -- window delta MV (running SUM, LAG, FIRST_VALUE); the mid-
    -- partition DELETE shifts every subsequent running sum
    SELECT * FROM (VALUES
        ('mid', 'a', CAST(1 AS BIGINT), CAST(10 AS BIGINT),
         CAST(10 AS BIGINT), CAST(NULL AS BIGINT), CAST(10 AS BIGINT)),
        ('mid', 'a', CAST(2 AS BIGINT), CAST(20 AS BIGINT),
         CAST(30 AS BIGINT), CAST(10 AS BIGINT), CAST(10 AS BIGINT)),
        ('mid', 'a', CAST(3 AS BIGINT), CAST(5 AS BIGINT),
         CAST(35 AS BIGINT), CAST(20 AS BIGINT), CAST(10 AS BIGINT)),
        ('mid', 'b', CAST(1 AS BIGINT), CAST(7 AS BIGINT),
         CAST(7 AS BIGINT), CAST(NULL AS BIGINT), CAST(7 AS BIGINT)),
        ('final', 'a', CAST(0 AS BIGINT), CAST(1 AS BIGINT),
         CAST(1 AS BIGINT), CAST(NULL AS BIGINT), CAST(1 AS BIGINT)),
        ('final', 'a', CAST(1 AS BIGINT), CAST(10 AS BIGINT),
         CAST(11 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        ('final', 'a', CAST(3 AS BIGINT), CAST(5 AS BIGINT),
         CAST(16 AS BIGINT), CAST(10 AS BIGINT), CAST(1 AS BIGINT)),
        ('final', 'b', CAST(1 AS BIGINT), CAST(7 AS BIGINT),
         CAST(7 AS BIGINT), CAST(NULL AS BIGINT), CAST(7 AS BIGINT)),
        ('final', 'c', CAST(1 AS BIGINT), CAST(9 AS BIGINT),
         CAST(9 AS BIGINT), CAST(NULL AS BIGINT), CAST(9 AS BIGINT))
    ) AS t(at, k, seq, v, run, prev, fv)
    ORDER BY at, k, seq
    """,
    "sqlfront", "ivm", "delta-maintenance", "window",
)
def sqlfront_delta_mv_window_order(spark, sf_dir):
    """Ordered window functions delta-maintained — running SUM, LAG,
    FIRST_VALUE with OVER (PARTITION BY k ORDER BY seq). The reference
    executes window functions as whole-group Reduce computations
    (src/expr/src/relation/func.rs:1960-1999), so per-commit it
    recomputes touched groups; this plan does exactly that — a commit
    re-derives ONLY its own partitions' rows through Spark's native
    window execution, untouched partitions pass through, and the
    published diff is the touched slice's old-vs-new consolidation.
    A mid-partition DELETE shifting every subsequent running sum is
    the churn case the oracle pins."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dwo_t (k STRING, seq BIGINT, v BIGINT);
        INSERT INTO dwo_t VALUES ('a', 1, 10), ('a', 2, 20),
                                 ('a', 3, 5), ('b', 1, 7);
        CREATE MATERIALIZED VIEW dwo WITH (MAINTENANCE 'delta') AS
          SELECT k, seq, v,
                 SUM(v) OVER (PARTITION BY k ORDER BY seq) AS run,
                 LAG(v) OVER (PARTITION BY k ORDER BY seq) AS prev,
                 FIRST_VALUE(v) OVER (PARTITION BY k ORDER BY seq)
                   AS fv
          FROM dwo_t;
    """)
    mid = s.sql("SELECT * FROM dwo").withColumn("at", F.lit("mid"))
    s.run_script("""
        DELETE FROM dwo_t WHERE k = 'a' AND seq = 2;
        INSERT INTO dwo_t VALUES ('a', 0, 1), ('c', 1, 9);
    """)
    fin = s.sql("SELECT * FROM dwo").withColumn("at", F.lit("final"))
    return (mid.unionByName(fin)
            .select("at", "k",
                    F.col("seq").cast("long").alias("seq"),
                    F.col("v").cast("long").alias("v"),
                    F.col("run").cast("long").alias("run"),
                    F.col("prev").cast("long").alias("prev"),
                    F.col("fv").cast("long").alias("fv"))
            .orderBy("at", "k", "seq"))


@register(
    "sqlfront_delta_mv_right_join",
    """
    -- oracle: literal truth of the write sequence against a RIGHT
    -- JOIN delta MV (unmatched right rows pad the left columns NULL)
    SELECT * FROM (VALUES
        ('mid', CAST(1 AS BIGINT), 'x', CAST(1 AS BIGINT), 'p'),
        ('mid', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
         CAST(3 AS BIGINT), 'q'),
        ('final', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
         CAST(1 AS BIGINT), 'p'),
        ('final', CAST(3 AS BIGINT), 'z', CAST(3 AS BIGINT), 'q'),
        ('final', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
         CAST(5 AS BIGINT), 'r')
    ) AS t(at, k, a, k2, b)
    ORDER BY at, k2
    """,
    "sqlfront", "ivm", "delta-maintenance", "join",
)
def sqlfront_delta_mv_right_join(spark, sf_dir):
    """RIGHT JOIN delta maintenance: the mirrored anti part keeps
    unmatched RIGHT rows null-padded on the left columns (the
    reference lowers RIGHT as the mirrored LEFT decomposition,
    src/sql/src/plan/lowering.rs) — left-side churn flips rows
    between matched and padded without recomputing the join."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE drj_l (k BIGINT, a STRING);
        CREATE TABLE drj_r (k2 BIGINT, b STRING);
        INSERT INTO drj_l VALUES (1, 'x'), (2, 'y');
        INSERT INTO drj_r VALUES (1, 'p'), (3, 'q');
        CREATE MATERIALIZED VIEW drj WITH (MAINTENANCE 'delta') AS
          SELECT k, a, k2, b FROM drj_l RIGHT JOIN drj_r ON k = k2;
    """)
    mid = s.sql("SELECT * FROM drj").withColumn("at", F.lit("mid"))
    s.run_script("""
        DELETE FROM drj_l WHERE k = 1;
        INSERT INTO drj_l VALUES (3, 'z');
        INSERT INTO drj_r VALUES (5, 'r');
    """)
    fin = s.sql("SELECT * FROM drj").withColumn("at", F.lit("final"))
    return (mid.unionByName(fin)
            .select("at", F.col("k").cast("long").alias("k"), "a",
                    F.col("k2").cast("long").alias("k2"), "b")
            .orderBy("at", "k2"))


@register(
    "sqlfront_delta_mv_mixed_setop",
    """
    -- oracle: literal truth of the write sequence against mixed
    -- set-operator chains (SQL precedence: INTERSECT binds tighter,
    -- UNION/EXCEPT associate left)
    SELECT * FROM (VALUES
        ('mid',   'ue', CAST(1 AS BIGINT)),
        ('mid',   'ue', CAST(2 AS BIGINT)),
        ('mid',   'ue', CAST(2 AS BIGINT)),
        ('mid',   'ue', CAST(3 AS BIGINT)),
        ('mid',   'ui', CAST(1 AS BIGINT)),
        ('mid',   'ui', CAST(2 AS BIGINT)),
        ('final', 'ue', CAST(2 AS BIGINT)),
        ('final', 'ue', CAST(2 AS BIGINT)),
        ('final', 'ue', CAST(2 AS BIGINT)),
        ('final', 'ue', CAST(3 AS BIGINT)),
        ('final', 'ue', CAST(4 AS BIGINT)),
        ('final', 'ui', CAST(1 AS BIGINT)),
        ('final', 'ui', CAST(2 AS BIGINT)),
        ('final', 'ui', CAST(4 AS BIGINT))
    ) AS t(at, mv, k)
    ORDER BY at, mv, k
    """,
    "sqlfront", "ivm", "delta-maintenance", "setops",
)
def sqlfront_delta_mv_mixed_setop(spark, sf_dir):
    """Mixed set-operator chains delta-maintained: ``A UNION ALL B
    EXCEPT ALL C`` and ``A UNION B INTERSECT C`` reduce pairwise into
    stacked internal maintained nodes with SQL precedence — the
    reference plans mixed chains as nested Threshold/Union/Negate
    trees (src/sql/src/plan/query.rs plan_set_expr) and maintains each
    node; here every pair's published diff is the next pair's commit
    (views-over-views composition, render.rs)."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dms_a (k BIGINT);
        CREATE TABLE dms_b (k BIGINT);
        CREATE TABLE dms_c (k BIGINT);
        INSERT INTO dms_a VALUES (1), (2), (2);
        INSERT INTO dms_b VALUES (2), (3);
        INSERT INTO dms_c VALUES (2), (4);
        CREATE MATERIALIZED VIEW dms_ue WITH (MAINTENANCE 'delta') AS
          SELECT k FROM dms_a UNION ALL SELECT k FROM dms_b
          EXCEPT ALL SELECT k FROM dms_c;
        CREATE MATERIALIZED VIEW dms_ui WITH (MAINTENANCE 'delta') AS
          SELECT k FROM dms_a UNION SELECT k FROM dms_b
          INTERSECT SELECT k FROM dms_c;
    """)

    def snap(at):
        e = s.sql("SELECT k FROM dms_ue").select(
            F.lit(at).alias("at"), F.lit("ue").alias("mv"), "k")
        i = s.sql("SELECT k FROM dms_ui").select(
            F.lit(at).alias("at"), F.lit("ui").alias("mv"), "k")
        return e.unionByName(i)

    mid = snap("mid")
    s.run_script("""
        DELETE FROM dms_c WHERE k = 2;
        INSERT INTO dms_a VALUES (4);
        INSERT INTO dms_c VALUES (1);
        INSERT INTO dms_b VALUES (4);
    """)
    fin = snap("final")
    return (mid.unionByName(fin)
            .select("at", "mv", F.col("k").cast("long").alias("k"))
            .orderBy("at", "mv", "k"))


@register(
    "sqlfront_delta_mv_temporal",
    """
    -- oracle: literal truth of the write+tick sequence against a
    -- temporal-filter delta MV (rows appear and retract as the
    -- logical clock passes their validity bounds, no commits needed)
    SELECT * FROM (VALUES
        ('t0',    'live'),
        ('t1',    'live'),
        ('t1',    'live2'),
        ('t2100', 'future'),
        ('t2100', 'live'),
        ('t2100', 'live2'),
        ('t2100', 'win'),
        ('tjul',  'future'),
        ('tjul',  'live'),
        ('tjul',  'live2'),
        ('tend',  'gone')
    ) AS t(at, k)
    ORDER BY at, k
    """,
    "sqlfront", "ivm", "delta-maintenance", "temporal",
)
def sqlfront_delta_mv_temporal(spark, sf_dir):
    """Temporal filters on MAINTAINED views — the reference's hallmark
    behavior (MfpPlan lower/upper bounds, src/expr/src/linear.rs:
    1724-1760; design doc 20210426_temporal_filters.md): a delta MV
    whose WHERE compares mz_now() against row expressions stores the
    bounds, and ``tick_time`` publishes the bound-crossing rows as
    +1/−1 diffs with NO commit in between — future-valid rows appear
    when the clock reaches valid_from, retract past valid_until.
    Commits interleave on the same timeline (a commit advances the
    MV's clock first, then folds its delta at that instant)."""
    from datetime import datetime

    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dtf_t (k STRING, vf TIMESTAMP, vu TIMESTAMP);
        INSERT INTO dtf_t VALUES
          ('live',   TIMESTAMP '1990-01-01 00:00:00',
                     TIMESTAMP '2200-01-01 00:00:00'),
          ('future', TIMESTAMP '2100-01-01 00:00:00',
                     TIMESTAMP '2200-01-01 00:00:00'),
          ('old',    TIMESTAMP '1990-01-01 00:00:00',
                     TIMESTAMP '1991-01-01 00:00:00'),
          ('win',    TIMESTAMP '2100-01-01 00:00:00',
                     TIMESTAMP '2100-06-01 00:00:00');
        CREATE MATERIALIZED VIEW dtf WITH (MAINTENANCE 'delta') AS
          SELECT k FROM dtf_t WHERE mz_now() >= vf AND mz_now() < vu;
    """)

    def snap(at):
        return s.sql("SELECT k FROM dtf").select(
            F.lit(at).alias("at"), "k")

    t0 = snap("t0")
    s.execute("INSERT INTO dtf_t VALUES ('live2', "
              "TIMESTAMP '2000-01-01 00:00:00', "
              "TIMESTAMP '2200-01-01 00:00:00')")
    t1 = snap("t1")
    s.tick_time(now=datetime(2100, 2, 1))
    t2 = snap("t2100")
    s.tick_time(now=datetime(2100, 7, 1))
    t3 = snap("tjul")
    s.tick_time(now=datetime(2201, 1, 1))
    # a commit AFTER the clock advanced evaluates at that time
    s.execute("INSERT INTO dtf_t VALUES ('gone', "
              "TIMESTAMP '2200-06-01 00:00:00', "
              "TIMESTAMP '2300-01-01 00:00:00')")
    t4 = snap("tend")
    return (t0.unionByName(t1).unionByName(t2).unionByName(t3)
            .unionByName(t4).orderBy("at", "k"))


@register(
    "sqlfront_delta_mv_wmr",
    """
    -- oracle: literal truth of the write sequence against a delta-
    -- maintained WITH MUTUALLY RECURSIVE reachability MV (inserts
    -- warm-start the fixpoint; deletes re-run it cold)
    SELECT * FROM (VALUES
        ('mid',   CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
        ('mid',   CAST(1 AS BIGINT), CAST(3 AS BIGINT)),
        ('mid',   CAST(2 AS BIGINT), CAST(3 AS BIGINT)),
        ('ins',   CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
        ('ins',   CAST(1 AS BIGINT), CAST(3 AS BIGINT)),
        ('ins',   CAST(1 AS BIGINT), CAST(4 AS BIGINT)),
        ('ins',   CAST(2 AS BIGINT), CAST(3 AS BIGINT)),
        ('ins',   CAST(2 AS BIGINT), CAST(4 AS BIGINT)),
        ('ins',   CAST(3 AS BIGINT), CAST(4 AS BIGINT)),
        ('final', CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
        ('final', CAST(3 AS BIGINT), CAST(4 AS BIGINT))
    ) AS t(at, src, dst)
    ORDER BY at, src, dst
    """,
    "sqlfront", "ivm", "delta-maintenance", "letrec",
)
def sqlfront_delta_mv_wmr(spark, sf_dir):
    """WITH MUTUALLY RECURSIVE under MAINTENANCE 'delta': the LetRec
    fixpoint stays always-fresh ON WRITE. Insert-only commits on
    monotone bindings WARM-START the iteration from the previous
    binding fixpoints (the old fixpoint lies below the new least
    fixpoint, so the monotone iteration climbs only the remaining
    distance — the semi-naive property; the reference maintains LetRec
    incrementally in differential dataflow,
    src/expr/src/relation.rs:154). Deleting an edge re-runs the
    fixpoint cold — derived facts downstream of the deleted edge
    vanish (no DRed over-deletion needed for correctness)."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dwm_e (src BIGINT, dst BIGINT);
        INSERT INTO dwm_e VALUES (1, 2), (2, 3);
        CREATE MATERIALIZED VIEW dwm WITH (MAINTENANCE 'delta') AS
        WITH MUTUALLY RECURSIVE
          reach (src int8, dst int8) AS (
            SELECT src, dst FROM dwm_e
            UNION
            SELECT r.src, e.dst FROM reach r
            JOIN dwm_e e ON r.dst = e.src)
        SELECT src, dst FROM reach;
    """)

    def snap(at):
        return s.sql("SELECT src, dst FROM dwm").select(
            F.lit(at).alias("at"), "src", "dst")

    mid = snap("mid")
    s.execute("INSERT INTO dwm_e VALUES (3, 4)")
    ins = snap("ins")
    s.execute("DELETE FROM dwm_e WHERE src = 2")
    fin = snap("final")
    return (mid.unionByName(ins).unionByName(fin)
            .select("at", F.col("src").cast("long").alias("src"),
                    F.col("dst").cast("long").alias("dst"))
            .orderBy("at", "src", "dst"))


@register(
    "sqlfront_delta_mv_sliding_agg",
    """
    -- oracle: literal truth of the write+tick sequence against a
    -- sliding-window aggregate (temporal filter + GROUP BY): windows
    -- slide with NO commits, groups drain and disappear as rows age
    SELECT * FROM (VALUES
        ('t0',    'a', CAST(10 AS BIGINT), CAST(1 AS BIGINT)),
        ('t0',    'b', CAST(7 AS BIGINT),  CAST(1 AS BIGINT)),
        ('ins',   'a', CAST(10 AS BIGINT), CAST(1 AS BIGINT)),
        ('ins',   'b', CAST(10 AS BIGINT), CAST(2 AS BIGINT)),
        ('t2100', 'a', CAST(15 AS BIGINT), CAST(2 AS BIGINT)),
        ('t2100', 'b', CAST(10 AS BIGINT), CAST(2 AS BIGINT)),
        ('t2141', 'a', CAST(5 AS BIGINT),  CAST(1 AS BIGINT)),
        ('t2141', 'b', CAST(3 AS BIGINT),  CAST(1 AS BIGINT)),
        ('t2160', 'a', CAST(5 AS BIGINT),  CAST(1 AS BIGINT))
    ) AS t(at, k, total, n)
    ORDER BY at, k
    """,
    "sqlfront", "ivm", "delta-maintenance", "temporal",
)
def sqlfront_delta_mv_sliding_agg(spark, sf_dir):
    """Sliding-window aggregates — the flagship temporal-filter idiom
    (``SELECT k, SUM(x) FROM t WHERE mz_now() >= ts AND mz_now() < ts
    + INTERVAL ... GROUP BY k``): the temporal stage's bound-crossing
    ± diffs feed a maintained RetractionAwareAgg, so per tick only the
    aged/arrived rows' groups update and a group whose window empties
    DISAPPEARS (Threshold semantics) — no commits anywhere. Reference:
    temporal filters compose with any downstream dataflow operator
    (MfpPlan bounds, src/expr/src/linear.rs:1724-1760)."""
    from datetime import datetime

    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dsl_t (k STRING, amt BIGINT, ts TIMESTAMP);
        INSERT INTO dsl_t VALUES
          ('a', 10, TIMESTAMP '1990-01-01 00:00:00'),
          ('a', 5,  TIMESTAMP '2100-01-01 00:00:00'),
          ('b', 7,  TIMESTAMP '1990-06-01 00:00:00');
        CREATE MATERIALIZED VIEW dsl WITH (MAINTENANCE 'delta') AS
          SELECT k, SUM(amt) AS total, COUNT(*) AS n FROM dsl_t
          WHERE mz_now() >= ts
            AND mz_now() < ts + INTERVAL 150 YEAR
          GROUP BY k;
    """)

    def snap(at):
        return s.sql("SELECT k, total, n FROM dsl").select(
            F.lit(at).alias("at"), "k", "total", "n")

    t0 = snap("t0")
    s.execute("INSERT INTO dsl_t VALUES "
              "('b', 3, TIMESTAMP '2000-01-01 00:00:00')")
    t1 = snap("ins")
    s.tick_time(now=datetime(2100, 2, 1))
    t2 = snap("t2100")
    s.tick_time(now=datetime(2141, 1, 1))
    t3 = snap("t2141")
    s.tick_time(now=datetime(2160, 1, 1))
    t4 = snap("t2160")
    return (t0.unionByName(t1).unionByName(t2).unionByName(t3)
            .unionByName(t4)
            .select("at", "k",
                    F.col("total").cast("long").alias("total"),
                    F.col("n").cast("long").alias("n"))
            .orderBy("at", "k"))


_Q21_TEXT_BODY = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_extendedprice > l1.l_quantity * 1400
  AND EXISTS (SELECT * FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT * FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_extendedprice > l3.l_quantity * 1400)
  AND s_nationkey = n_nationkey
GROUP BY s_name"""


@register(
    "sqlfront_delta_mv_q21_text",
    f"""
    -- oracle: the SAME comma-FROM/aliased/self-correlated q21-shape
    -- SQL evaluated directly (the synthetic lineitem lacks receipt/
    -- commit dates, so 'late' adapts to a price predicate; structure
    -- is the verbatim TPC-H q21 text)
    SELECT s_name, CAST(numwait AS BIGINT) AS numwait FROM (
    {_Q21_TEXT_BODY}
    ) q ORDER BY s_name
    """,
    "sqlfront", "ivm", "delta-maintenance", "subquery", "tpch",
)
def sqlfront_delta_mv_q21_text(spark, sf_dir):
    """MAINTENANCE 'delta' accepts the TPC-H q21 TEXT as written —
    comma-joined FROM list with table aliases, qualified references,
    and the self-correlated EXISTS / NOT EXISTS pair with <>
    exclusions (the reference maintains all 22 TPC-H queries as
    materialized views, test/sqllogictest/
    tpch_create_materialized_view.slt). The planner desugars the
    implicit joins into the left-deep bilinear chain (the classic
    implicit-join planning the reference's optimizer performs),
    strips qualifiers token-wise, and decorrelates the subqueries
    into maintained semi/anti stages; the oracle here is the SAME SQL
    evaluated directly by DuckDB over the parquet tables."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q21_text WITH "
              f"(MAINTENANCE 'delta') AS {_Q21_TEXT_BODY}")
    return (s.sql("SELECT s_name, numwait FROM q21_text")
            .select("s_name",
                    F.col("numwait").cast("long").alias("numwait"))
            .orderBy("s_name"))


@register(
    "sqlfront_delta_mv_scalar_agg_cmp",
    """
    -- oracle: literal truth of the write sequence against correlated
    -- scalar-aggregate comparison MVs (the TPC-H q17/q2/q20 family):
    -- deletes RAISE the maintained MIN (hierarchical support), moves
    -- in avg re-qualify only the touched key's rows
    SELECT * FROM (VALUES
        ('mid',   'avg', CAST(1 AS BIGINT), CAST(1 AS DOUBLE)),
        ('mid',   'avg', CAST(2 AS BIGINT), CAST(5 AS DOUBLE)),
        ('mid',   'min', CAST(1 AS BIGINT), CAST(1 AS DOUBLE)),
        ('mid',   'min', CAST(2 AS BIGINT), CAST(5 AS DOUBLE)),
        ('final', 'avg', CAST(2 AS BIGINT), CAST(2 AS DOUBLE)),
        ('final', 'min', CAST(1 AS BIGINT), CAST(10 AS DOUBLE)),
        ('final', 'min', CAST(1 AS BIGINT), CAST(10 AS DOUBLE)),
        ('final', 'min', CAST(2 AS BIGINT), CAST(2 AS DOUBLE))
    ) AS t(at, mv, pk, qty)
    ORDER BY at, mv, pk, qty
    """,
    "sqlfront", "ivm", "delta-maintenance", "subquery",
)
def sqlfront_delta_mv_scalar_agg_cmp(spark, sf_dir):
    """Correlated scalar-aggregate comparisons delta-maintained — the
    q17 idiom ``l1.qty < (SELECT 0.5*avg(l2.qty) FROM li l2 WHERE
    l2.pk = l1.pk)`` and the q2-style MIN comparison. The reference
    decorrelates the scalar subquery into a per-key Reduce joined back
    to the outer relation (src/sql/src/plan/lowering.rs); here the
    per-key aggregate lives in a RetractionAwareAgg (accumulable
    sum/count/avg, hierarchical MIN/MAX — deleting the minimum RAISES
    the maintained value correctly) and inner commits re-qualify ONLY
    the touched keys' outer rows, emitting ± diffs where the
    comparison's truth flipped (streaming/semijoin.CmpAggFilterMV).
    Empty groups yield NULL (comparison UNKNOWN → filtered), COUNT
    yields 0 — SQL scalar subquery semantics."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE dca_li (pk BIGINT, qty DOUBLE);
        INSERT INTO dca_li VALUES (1, 1), (1, 10), (1, 10),
                                  (2, 5), (2, 50);
        CREATE MATERIALIZED VIEW dca_avg WITH (MAINTENANCE 'delta') AS
          SELECT pk, qty FROM dca_li l1
          WHERE l1.qty < (SELECT 0.5 * avg(l2.qty) FROM dca_li l2
                          WHERE l2.pk = l1.pk);
        CREATE MATERIALIZED VIEW dca_min WITH (MAINTENANCE 'delta') AS
          SELECT pk, qty FROM dca_li l1
          WHERE l1.qty < (SELECT min(l2.qty) * 3 FROM dca_li l2
                          WHERE l2.pk = l1.pk);
    """)

    def snap(at):
        a = s.sql("SELECT pk, qty FROM dca_avg").select(
            F.lit(at).alias("at"), F.lit("avg").alias("mv"),
            "pk", "qty")
        m = s.sql("SELECT pk, qty FROM dca_min").select(
            F.lit(at).alias("at"), F.lit("min").alias("mv"),
            "pk", "qty")
        return a.unionByName(m)

    mid = snap("mid")
    # deleting group 2's minimum RAISES its maintained MIN (5 -> 50);
    # the later inserts lower it again; group 1 drains its small row
    s.run_script("""
        DELETE FROM dca_li WHERE pk = 2 AND qty = 5;
        INSERT INTO dca_li VALUES (2, 20);
        DELETE FROM dca_li WHERE pk = 1 AND qty = 1;
        INSERT INTO dca_li VALUES (2, 2);
    """)
    fin = snap("final")
    return (mid.unionByName(fin)
            .select("at", "mv", F.col("pk").cast("long").alias("pk"),
                    F.col("qty").cast("double").alias("qty"))
            .orderBy("at", "mv", "pk", "qty"))


_Q4_TEXT_BODY = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1996-04-01'
  AND EXISTS (SELECT * FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority"""


@register(
    "sqlfront_delta_mv_q4_text",
    f"""
    -- oracle: the SAME q4 text evaluated directly over the parquet
    -- tables (the synthetic lineitem lacks l_commitdate, so the
    -- late-delivery predicate adapts to l_shipdate > o_orderdate —
    -- structurally the verbatim TPC-H q4)
    SELECT o_orderpriority,
           CAST(order_count AS BIGINT) AS order_count FROM (
    {_Q4_TEXT_BODY}
    ) q ORDER BY o_orderpriority
    """,
    "sqlfront", "ivm", "delta-maintenance", "subquery", "tpch",
)
def sqlfront_delta_mv_q4_text(spark, sf_dir):
    """TPC-H q4 as written maintains: EXISTS with an equality
    correlation PLUS an inequality correlation against an outer column
    (``l_shipdate > o_orderdate``). The inequality reduces to a
    per-key extremum comparison — EXISTS(inner.c > outer.e | key) ⟺
    MAX(c) per key > e — so the maintained form is a CmpAggFilterMV
    whose hierarchical MAX survives retractions; the reference's
    decorrelation produces the same reduce-then-compare lowering
    (src/sql/src/plan/lowering.rs). Oracle = the SAME SQL in DuckDB."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q4_text WITH "
              f"(MAINTENANCE 'delta') AS {_Q4_TEXT_BODY}")
    return (s.sql("SELECT o_orderpriority, order_count FROM q4_text")
            .select("o_orderpriority",
                    F.col("order_count").cast("long")
                    .alias("order_count"))
            .orderBy("o_orderpriority"))


_Q17_TEXT_BODY = """
SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem
                    WHERE l_partkey = p_partkey)
"""


@register(
    "sqlfront_delta_mv_q17_text",
    f"""
    -- oracle: the SAME q17 text evaluated directly over the parquet
    -- tables (brand/container filters omitted — the synthetic part
    -- table carries its own columns; structurally verbatim TPC-H q17)
    SELECT CAST(round(avg_yearly, 2) AS DOUBLE) AS avg_yearly FROM (
    {_Q17_TEXT_BODY}
    ) q
    """,
    "sqlfront", "ivm", "delta-maintenance", "subquery", "tpch",
)
def sqlfront_delta_mv_q17_text(spark, sf_dir):
    """TPC-H q17 as written maintains: a KEYLESS aggregate whose head
    is a scalar expression around the aggregate (sum(x)/7.0 — the
    post-reduce projection), over a comma-joined FROM, filtered by a
    correlated scalar-aggregate subquery with the alias-less
    self-table style (bare names resolve inner-first, the outer
    correlation rides p_partkey). The per-key AVG maintains in
    CmpAggFilterMV; the keyless SUM maintains on the synthetic
    constant group with the one-row empty-input guarantee. Oracle =
    the SAME SQL in DuckDB."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q17_text WITH "
              f"(MAINTENANCE 'delta') AS {_Q17_TEXT_BODY}")
    return (s.sql("SELECT avg_yearly FROM q17_text")
            .select(F.round("avg_yearly", 2).cast("double")
                    .alias("avg_yearly")))


_Q1_TEXT_BODY = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       avg(l_quantity) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus"""

_Q5_TEXT_BODY = """
SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name"""

_Q6_TEXT_BODY = """
SELECT sum(l_extendedprice * l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24"""


@register(
    "sqlfront_delta_mv_tpch_texts",
    f"""
    -- oracle: the SAME verbatim TPC-H q1/q5/q6 texts evaluated
    -- directly over the parquet tables (q5's comma-joined six-way
    -- FROM desugars through progressive join-key renames)
    SELECT * FROM (
      SELECT 'q1' AS q, l_returnflag || '/' || l_linestatus AS k,
             CAST(round(sum_disc_price, 2) AS DOUBLE) AS v,
             CAST(count_order AS BIGINT) AS n
      FROM ({_Q1_TEXT_BODY}) q1
      UNION ALL
      SELECT 'q5' AS q, n_name AS k,
             CAST(round(revenue, 2) AS DOUBLE) AS v,
             CAST(NULL AS BIGINT) AS n
      FROM ({_Q5_TEXT_BODY}) q5
      UNION ALL
      SELECT 'q6' AS q, 'all' AS k,
             CAST(round(revenue, 2) AS DOUBLE) AS v,
             CAST(NULL AS BIGINT) AS n
      FROM ({_Q6_TEXT_BODY}) q6
    ) t ORDER BY q, k
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch",
)
def sqlfront_delta_mv_tpch_texts(spark, sf_dir):
    """Verbatim TPC-H texts as MAINTENANCE 'delta' views — q1 (grouped
    multi-aggregate incl. AVG and expression inputs), q5 (six-way
    comma-joined FROM with chained equality links incl. the
    c_nationkey = s_nationkey = n_nationkey diamond — progressive
    join-key renames keep later links resolving), q6 (keyless
    aggregate over a BETWEEN-filtered scan). Together with
    q4/q17/q21 (their own entries) the engine maintains six TPC-H
    query texts as written, the reference's
    tpch_create_materialized_view.slt posture. Oracle = the SAME SQL
    in DuckDB over the same parquet."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW tq1 WITH "
              f"(MAINTENANCE 'delta') AS {_Q1_TEXT_BODY}")
    s.execute("CREATE MATERIALIZED VIEW tq5 WITH "
              f"(MAINTENANCE 'delta') AS {_Q5_TEXT_BODY}")
    s.execute("CREATE MATERIALIZED VIEW tq6 WITH "
              f"(MAINTENANCE 'delta') AS {_Q6_TEXT_BODY}")
    a = s.sql("SELECT * FROM tq1").select(
        F.lit("q1").alias("q"),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("k"),
        F.round("sum_disc_price", 2).cast("double").alias("v"),
        F.col("count_order").cast("long").alias("n"))
    b = s.sql("SELECT * FROM tq5").select(
        F.lit("q5").alias("q"), F.col("n_name").alias("k"),
        F.round("revenue", 2).cast("double").alias("v"),
        F.lit(None).cast("long").alias("n"))
    c = s.sql("SELECT * FROM tq6").select(
        F.lit("q6").alias("q"), F.lit("all").alias("k"),
        F.round("revenue", 2).cast("double").alias("v"),
        F.lit(None).cast("long").alias("n"))
    return a.unionByName(b).unionByName(c).orderBy("q", "k")


_Q18_TEXT_BODY = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       sum(l_quantity) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING sum(l_quantity) > 180)
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice"""


@register(
    "sqlfront_delta_mv_q18_text",
    f"""
    -- oracle: the SAME verbatim TPC-H q18 text evaluated directly
    -- over the parquet tables
    SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(round(o_totalprice, 2) AS DOUBLE) AS o_totalprice,
           CAST(round(total_qty, 2) AS DOUBLE) AS total_qty
    FROM ({_Q18_TEXT_BODY}) q
    ORDER BY o_orderkey
    """,
    "sqlfront", "ivm", "delta-maintenance", "subquery", "tpch",
)
def sqlfront_delta_mv_q18_text(spark, sf_dir):
    """TPC-H q18 as written maintains: the large-volume-customer
    membership test ``o_orderkey IN (SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING sum(l_quantity) > N)`` is a per-key
    aggregate THRESHOLD — membership flips exactly when the key's sum
    crosses N (the reference's ThresholdSemijoin lowering of q18;
    streaming/delta_ivm.ThresholdSemijoinMV pioneered the operator,
    and the SQL now compiles the idiom through CmpAggFilterMV) —
    composed under the comma-joined three-way chain and the grouped
    multi-key reduce. Oracle = the SAME SQL in DuckDB."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q18_text WITH "
              f"(MAINTENANCE 'delta') AS {_Q18_TEXT_BODY}")
    return (s.sql("SELECT * FROM q18_text")
            .select("c_name",
                    F.col("c_custkey").cast("long").alias("c_custkey"),
                    F.col("o_orderkey").cast("long")
                    .alias("o_orderkey"),
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                    .alias("o_orderdate"),
                    F.round("o_totalprice", 2).cast("double")
                    .alias("o_totalprice"),
                    F.round("total_qty", 2).cast("double")
                    .alias("total_qty"))
            .orderBy("o_orderkey"))


_Q3_SHAPE_BODY = """
SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) AS revenue,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey AND o_orderdate < DATE '1996-03-15'
  AND l_shipdate > DATE '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority"""


@register(
    "sqlfront_delta_mv_q3_shape",
    f"""
    -- oracle: the SAME q3-shape text evaluated directly (the
    -- synthetic orders table lacks o_shippriority; o_orderpriority
    -- stands in — structurally the verbatim TPC-H q3 minus its
    -- ORDER BY/LIMIT tail, which an unordered MV drops)
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(floor(revenue) AS BIGINT) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_orderpriority
    FROM ({_Q3_SHAPE_BODY}) q ORDER BY l_orderkey
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch",
)
def sqlfront_delta_mv_q3_shape(spark, sf_dir):
    """The TPC-H q3 text shape maintained: a comma-joined three-way
    chain whose SELECT references the DROPPED join-key name
    (l_orderkey — renamed to o_orderkey inside the chain; the desugar
    projects the surviving synonym back under the queried name as an
    aliased-expression group key) with group keys listed AFTER the
    aggregate. Oracle = the SAME SQL in DuckDB."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q3_shape WITH "
              f"(MAINTENANCE 'delta') AS {_Q3_SHAPE_BODY}")
    return (s.sql("SELECT * FROM q3_shape")
            .select(F.col("l_orderkey").cast("long")
                    .alias("l_orderkey"),
                    F.floor("revenue").cast("long")
                    .alias("revenue"),
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                    .alias("o_orderdate"),
                    "o_orderpriority")
            .orderBy("l_orderkey"))


_Q13_SHAPE_BODY = """
SELECT
    c_count,
    count(*) AS custdist
FROM
    (
        SELECT
            c_custkey,
            count(o_orderkey) c_count
        FROM
            customer LEFT OUTER JOIN orders ON
                c_custkey = o_custkey
                AND o_orderpriority NOT LIKE '%URGENT%'
        GROUP BY
            c_custkey
    ) AS c_orders
GROUP BY
    c_count
ORDER BY
    custdist DESC,
    c_count DESC"""


@register(
    "sqlfront_delta_mv_q13_text",
    f"""
    -- oracle: the SAME q13-shape text evaluated directly (the
    -- synthetic orders table lacks o_comment; the o_orderpriority NOT
    -- LIKE conjunct stands in — structurally the verbatim TPC-H q13
    -- from the reference's tpch_create_materialized_view.slt:
    -- aggregate FROM-subquery with LEFT OUTER JOIN + residual ON
    -- conjunct, implicit column alias, trailing ORDER BY)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(custdist AS BIGINT) AS custdist
    FROM ({_Q13_SHAPE_BODY}) q ORDER BY custdist DESC, c_count DESC
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch",
)
def sqlfront_delta_mv_q13_text(spark, sf_dir):
    """The TPC-H q13 text maintained as written (o_comment adapted to
    the synthetic schema): the two-level aggregate FROM-subquery plans
    as a planner-owned internal delta MV (LEFT OUTER JOIN + keyed
    reduce) whose published diffs feed the outer reduce — the stacked
    Let-binding rendering of the reference (render.rs; slt:1001-1021).
    The LEFT join's right-only residual ON conjunct pushes down as a
    right-input pre-filter. Oracle = the SAME SQL in DuckDB."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q13_text WITH "
              f"(MAINTENANCE 'delta') AS {_Q13_SHAPE_BODY}")
    return (s.sql("SELECT * FROM q13_text")
            .select(F.col("c_count").cast("long").alias("c_count"),
                    F.col("custdist").cast("long").alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


_Q11_SHAPE_BODY = """
SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS value
FROM lineitem, supplier
WHERE l_suppkey = s_suppkey
GROUP BY l_suppkey
HAVING sum(l_extendedprice * (1 - l_discount)) > (
    SELECT sum(l_extendedprice * (1 - l_discount)) * 0.011
    FROM lineitem, supplier
    WHERE l_suppkey = s_suppkey
)
ORDER BY value DESC"""


@register(
    "sqlfront_delta_mv_q11_shape",
    f"""
    -- oracle: the SAME q11-shape text evaluated directly (the
    -- synthetic data lacks partsupp/nation filters; lineitem-supplier
    -- stands in — structurally the verbatim TPC-H q11: keyed reduce +
    -- HAVING agg > (SELECT agg * k FROM <join>), the uncorrelated
    -- scalar-subquery threshold)
    SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey,
           CAST(floor(value) AS BIGINT) AS value
    FROM ({_Q11_SHAPE_BODY}) q ORDER BY l_suppkey
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch", "subquery",
)
def sqlfront_delta_mv_q11_shape(spark, sf_dir):
    """The q11 threshold family maintained: the HAVING's scalar
    subquery plans as an internal keyless-aggregate delta MV (a join +
    global sum) whose one-row value is a maintained global frontier;
    the keyed reduce stacks under it and threshold crossings
    re-qualify groups in both directions (GlobalCmpFilterMV;
    reference slt:820-860 renders q11 as Reduce → Filter-against-Let).
    Oracle = the SAME SQL in DuckDB."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q11_shape WITH "
              f"(MAINTENANCE 'delta') AS {_Q11_SHAPE_BODY}")
    return (s.sql("SELECT * FROM q11_shape")
            .select(F.col("l_suppkey").cast("long").alias("l_suppkey"),
                    F.floor("value").cast("long").alias("value"))
            .orderBy("l_suppkey"))


_Q22_SHAPE_BODY = """
SELECT c_nationkey, count(*) AS numcust, sum(c_acctbal) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                   WHERE c_acctbal > 0.00)
  AND NOT EXISTS (SELECT * FROM orders WHERE o_custkey = c_custkey
                  AND o_orderstatus = 'F')
GROUP BY c_nationkey"""


@register(
    "sqlfront_delta_mv_q22_shape",
    f"""
    -- oracle: the SAME q22-shape text evaluated directly (the
    -- synthetic customer lacks c_phone; c_nationkey groups stand in —
    -- structurally the verbatim TPC-H q22: an uncorrelated scalar
    -- average threshold composed with NOT EXISTS under one GROUP BY)
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
           CAST(numcust AS BIGINT) AS numcust,
           CAST(floor(totacctbal) AS BIGINT) AS totacctbal
    FROM ({_Q22_SHAPE_BODY}) q ORDER BY c_nationkey
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch", "subquery",
)
def sqlfront_delta_mv_q22_shape(spark, sf_dir):
    """The q22 composition maintained: WHERE x > (SELECT avg ...) —
    an internal scalar MV + GlobalCmpFilterMV stage — composes with a
    maintained NOT EXISTS anti stage and a keyed reduce above, all in
    one dataflow. Oracle = the SAME SQL in DuckDB."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q22_shape WITH "
              f"(MAINTENANCE 'delta') AS {_Q22_SHAPE_BODY}")
    return (s.sql("SELECT * FROM q22_shape")
            .select(F.col("c_nationkey").cast("long")
                    .alias("c_nationkey"),
                    F.col("numcust").cast("long").alias("numcust"),
                    F.floor("totacctbal").cast("long")
                    .alias("totacctbal"))
            .orderBy("c_nationkey"))


_Q19_SHAPE_BODY = """
SELECT sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem, part
WHERE (
    p_partkey = l_partkey
    AND p_brand = 'Brand#12'
    AND l_quantity >= 1 AND l_quantity <= 11
    AND p_size BETWEEN 1 AND 5
) OR (
    p_partkey = l_partkey
    AND p_brand = 'Brand#23'
    AND l_quantity >= 10 AND l_quantity <= 20
    AND p_size BETWEEN 1 AND 10
) OR (
    p_partkey = l_partkey
    AND p_brand = 'Brand#34'
    AND l_quantity >= 20 AND l_quantity <= 30
    AND p_size BETWEEN 1 AND 15
)"""


@register(
    "sqlfront_delta_mv_q19_text",
    f"""
    -- oracle: the SAME q19-shape text evaluated directly (the
    -- synthetic schema lacks p_container/l_shipmode/l_shipinstruct;
    -- the brand/size/quantity blocks stand in — structurally the
    -- verbatim TPC-H q19: OR-of-conjunct-blocks each carrying the
    -- p_partkey = l_partkey equi pair, hoisted into the join keys
    -- with the OR as a residual filter)
    SELECT CAST(floor(coalesce(revenue, 0)) AS BIGINT) AS revenue
    FROM ({_Q19_SHAPE_BODY}) q
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch",
)
def sqlfront_delta_mv_q19_text(spark, sf_dir):
    """The q19 disjunctive join predicate maintained: every OR block
    shares the p_partkey = l_partkey equi conjunct, so the desugar
    hoists it into the bilinear chain's join keys and keeps the OR as
    a per-delta residual filter — never a cross product (the common-
    disjunct pullup the reference's optimizer performs,
    slt:1434-1460). Keyless aggregate above. Oracle = same SQL."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q19_text WITH "
              f"(MAINTENANCE 'delta') AS {_Q19_SHAPE_BODY}")
    return (s.sql("SELECT * FROM q19_text")
            .select(F.floor(F.coalesce(F.col("revenue"), F.lit(0)))
                    .cast("long").alias("revenue")))


@register(
    "sqlfront_delta_mv_agg_over_agg",
    """
    -- oracle: generic two-level aggregate (the q13 mechanism without
    -- the join): per-order stats re-aggregated into a histogram
    SELECT CAST(nl AS BIGINT) AS nl,
           CAST(count(*) AS BIGINT) AS norders,
           CAST(floor(sum(tq)) AS BIGINT) AS sq
    FROM (
        SELECT l_orderkey, count(*) AS nl, sum(l_quantity) AS tq
        FROM lineitem GROUP BY l_orderkey
    ) o
    GROUP BY nl ORDER BY nl
    """,
    "sqlfront", "ivm", "delta-maintenance", "subquery",
)
def sqlfront_delta_mv_agg_over_agg(spark, sf_dir):
    """Generic aggregate-over-aggregate FROM-subquery: the inner keyed
    reduce maintains as an internal delta MV; its published diffs feed
    the outer reduce (internal-MV stacking, the q13 mechanism)."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("""
        CREATE MATERIALIZED VIEW agg2 WITH (MAINTENANCE 'delta') AS
        SELECT nl, count(*) AS norders, sum(tq) AS sq FROM (
            SELECT l_orderkey, count(*) AS nl, sum(l_quantity) AS tq
            FROM lineitem GROUP BY l_orderkey
        ) AS o
        GROUP BY nl
    """)
    return (s.sql("SELECT * FROM agg2")
            .select(F.col("nl").cast("long").alias("nl"),
                    F.col("norders").cast("long").alias("norders"),
                    F.floor("sq").cast("long").alias("sq"))
            .orderBy("nl"))


@register(
    "sqlfront_delta_mv_corr_not_in",
    """
    -- oracle: literal truth of the write sequence against correlated
    -- [NOT] IN MVs with SQL three-valued semantics PER correlation
    -- key: a key with an empty inner set keeps every outer row (NULL
    -- x included), a NULL inner value poisons ITS key only, and a
    -- NULL outer value never qualifies against a non-empty set.
    -- (DuckDB 1.0's own WHERE lowering of positive correlated IN
    -- keeps a NULL-x row the standard filters — the truth table below
    -- is the PG/reference answer, verified by churn-vs-recompute
    -- soaks in tests/test_semijoin_mv.py.)
    SELECT * FROM (VALUES
        ('mid',   'in',     CAST(2 AS BIGINT), CAST(8 AS BIGINT)),
        ('mid',   'not_in', CAST(2 AS BIGINT), CAST(7 AS BIGINT)),
        ('mid',   'not_in', CAST(3 AS BIGINT), CAST(9 AS BIGINT)),
        ('final', 'in',     CAST(1 AS BIGINT), CAST(5 AS BIGINT)),
        ('final', 'not_in', CAST(2 AS BIGINT), CAST(7 AS BIGINT)),
        ('final', 'not_in', CAST(2 AS BIGINT), CAST(8 AS BIGINT))
    ) AS t(at, mv, g, x) ORDER BY at, mv, g, x
    """,
    "sqlfront", "ivm", "delta-maintenance", "subquery",
)
def sqlfront_delta_mv_corr_not_in(spark, sf_dir):
    """Correlated ``x [NOT] IN (SELECT v FROM u WHERE u.k = t.k)``
    delta-maintained with per-key three-valued NULL semantics: the
    support keeps NULL in-values (they never match ``=`` but poison
    their key's NOT IN), per-key emptiness/null counts fold from the
    same support, and inner commits re-qualify exactly the touched
    keys' outer rows (streaming/semijoin.SemiAntiFilterMV in_col
    mode; reference lowering.rs decorrelates to the same plan)."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.run_script("""
        CREATE TABLE cni_t (g BIGINT, x BIGINT);
        CREATE TABLE cni_u (g2 BIGINT, j BIGINT);
        INSERT INTO cni_t VALUES (1, 5), (1, NULL), (2, 7), (2, 8),
                                 (3, 9);
        INSERT INTO cni_u VALUES (1, 6), (1, NULL), (2, 8);
        CREATE MATERIALIZED VIEW cni_in WITH (MAINTENANCE 'delta') AS
          SELECT g, x FROM cni_t
          WHERE x IN (SELECT j FROM cni_u WHERE cni_u.g2 = cni_t.g);
        CREATE MATERIALIZED VIEW cni_ni WITH (MAINTENANCE 'delta') AS
          SELECT g, x FROM cni_t
          WHERE x NOT IN (SELECT j FROM cni_u
                          WHERE cni_u.g2 = cni_t.g);
    """)
    # mid: key 1 poisoned (inner NULL) -> (1,5)/(1,NULL) out of NOT
    # IN and 5 unmatched for IN; key 2: 8 IN {8}, 7 NOT IN {8};
    # key 3 empty -> NOT IN keeps (3,9)

    def snap(at):
        i = s.sql("SELECT g, x FROM cni_in").select(
            F.lit(at).alias("at"), F.lit("in").alias("mv"), "g", "x")
        n = s.sql("SELECT g, x FROM cni_ni").select(
            F.lit(at).alias("at"), F.lit("not_in").alias("mv"),
            "g", "x")
        return i.unionByName(n)

    mid = snap("mid")
    # un-poison key 1 and give it a match; poison key 3; delete key
    # 2's match (8 flips from IN to NOT IN)
    s.run_script("""
        DELETE FROM cni_u WHERE g2 = 1 AND j IS NULL;
        INSERT INTO cni_u VALUES (1, 5), (3, NULL);
        DELETE FROM cni_u WHERE g2 = 2 AND j = 8;
    """)
    fin = snap("final")
    return (mid.unionByName(fin)
            .select("at", "mv", F.col("g").cast("long").alias("g"),
                    F.col("x").cast("long").alias("x"))
            .orderBy("at", "mv", "g", "x"))


_Q15_REV_BODY = """
SELECT l_suppkey AS supplier_no,
       sum(l_extendedprice * (1 - l_discount)) AS total_revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01'
GROUP BY l_suppkey"""

_Q15_BODY = """
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue0
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT max(total_revenue) FROM revenue0)"""


@register(
    "sqlfront_delta_mv_q15_shape",
    f"""
    -- oracle: the SAME q15-shape text (revenue view + max-over-view
    -- pick) evaluated directly — structurally the verbatim TPC-H q15
    -- (the synthetic supplier lacks s_address/s_phone)
    WITH revenue0 AS ({_Q15_REV_BODY})
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
           CAST(floor(total_revenue) AS BIGINT) AS total_revenue
    FROM ({_Q15_BODY}) q ORDER BY s_suppkey
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch", "subquery",
)
def sqlfront_delta_mv_q15_shape(spark, sf_dir):
    """The q15 composition maintained: the revenue view is a STACKED
    delta MV, and the outer MV's uncorrelated scalar subquery
    (SELECT max(total_revenue) FROM revenue0) maintains as an internal
    keyless MAX over the SAME stacked view — three maintained layers
    reading each other's published diffs (the reference's
    views-over-views rendering, render.rs). Oracle = same SQL."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW revenue0 WITH (MAINTENANCE "
              f"'delta') AS {_Q15_REV_BODY}")
    s.execute("CREATE MATERIALIZED VIEW q15_shape WITH (MAINTENANCE "
              f"'delta') AS {_Q15_BODY}")
    return (s.sql("SELECT * FROM q15_shape")
            .select(F.col("s_suppkey").cast("long").alias("s_suppkey"),
                    "s_name",
                    F.floor("total_revenue").cast("long")
                    .alias("total_revenue"))
            .orderBy("s_suppkey"))


_Q20_BODY = """
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_name LIKE 's%')
      AND l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1996-03-01'
      AND l_quantity > (SELECT 1.5 * avg(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
)"""


@register(
    "sqlfront_delta_mv_q20_shape",
    f"""
    -- oracle: the SAME q20-shape text evaluated directly (partsupp is
    -- absent from the synthetic schema; lineitem stands in for the
    -- availability relation) — structurally the verbatim TPC-H q20:
    -- an IN whose membership body carries its OWN nested subfilters
    -- (an uncorrelated IN + a correlated scalar-aggregate threshold)
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name
    FROM ({_Q20_BODY}) q ORDER BY s_suppkey
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch", "subquery",
)
def sqlfront_delta_mv_q20_shape(spark, sf_dir):
    """The q20 nesting maintained: the membership set's body (with its
    own nested IN and correlated scalar-aggregate comparison) plans as
    a planner-owned internal delta MV whose published diffs feed an
    uncorrelated membership stage — recursive lowering into stacked
    Let bindings (reference lowering.rs). Oracle = same SQL."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q20_shape WITH (MAINTENANCE "
              f"'delta') AS {_Q20_BODY}")
    return (s.sql("SELECT * FROM q20_shape")
            .select(F.col("s_suppkey").cast("long").alias("s_suppkey"),
                    "s_name")
            .orderBy("s_suppkey"))


_PSUB_BODY = """
SELECT p_partkey, p_name,
       (SELECT min(l_extendedprice) FROM lineitem
        WHERE l_partkey = p_partkey) AS minprice
FROM part
WHERE p_size > 40"""


@register(
    "sqlfront_delta_mv_select_scalar_sub",
    f"""
    -- oracle: the SAME text evaluated directly — a correlated scalar
    -- aggregate in the SELECT LIST (the q2-family projection form):
    -- per-key MIN LEFT-joined to the outer relation, NULL for keys
    -- with no inner rows
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name,
           CAST(floor(coalesce(minprice, -1)) AS BIGINT) AS minprice
    FROM ({_PSUB_BODY}) q ORDER BY p_partkey
    """,
    "sqlfront", "ivm", "delta-maintenance", "subquery",
)
def sqlfront_delta_mv_select_scalar_sub(spark, sf_dir):
    """Scalar subqueries in the SELECT list delta-maintained: the
    reference plans HirScalarExpr::Select anywhere an expression goes
    (hir.rs:226-263); the desugar here decorrelates each into an
    internal per-key aggregate MV LEFT-joined on the correlation keys
    (empty group → NULL — exact scalar-subquery semantics)."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW psub_mv WITH (MAINTENANCE "
              f"'delta') AS {_PSUB_BODY}")
    return (s.sql("SELECT * FROM psub_mv")
            .select(F.col("p_partkey").cast("long").alias("p_partkey"),
                    "p_name",
                    F.floor(F.coalesce(F.col("minprice"), F.lit(-1)))
                    .cast("long").alias("minprice"))
            .orderBy("p_partkey"))


_Q7_TEXT_BODY = """
SELECT supp_nation, cust_nation, l_year, sum(volume) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           extract(year FROM l_shipdate) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey
      AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
           OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
      AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
) AS shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year"""


@register(
    "sqlfront_delta_mv_q7_text",
    f"""
    -- oracle: the SAME q7 text evaluated directly (nation names are
    -- the synthetic NATION_k; otherwise the verbatim TPC-H q7):
    -- two-nation SELF-JOIN, expression group key
    -- (extract(year FROM ..)), OR-of-nation-pairs residual
    SELECT supp_nation, cust_nation, CAST(l_year AS BIGINT) AS l_year,
           CAST(floor(revenue) AS BIGINT) AS revenue
    FROM ({_Q7_TEXT_BODY}) q
    ORDER BY supp_nation, cust_nation, l_year
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch",
)
def sqlfront_delta_mv_q7_text(spark, sf_dir):
    """The TPC-H q7 text maintained as written: the repeated nation
    relation becomes two chain positions with per-occurrence column
    renames (n2.n_name → __n2_n_name — the reference keeps two
    arrangements of one collection distinguished by Let binding,
    render.rs), a nation commit folds through BOTH positions
    sequentially (the bilinear rule composes), and the stateless
    FROM-subquery flattens into the chain with its expression aliases
    (l_year, volume) substituted into the outer reduce."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q7_text WITH (MAINTENANCE "
              f"'delta') AS {_Q7_TEXT_BODY}")
    return (s.sql("SELECT * FROM q7_text")
            .select("supp_nation", "cust_nation",
                    F.col("l_year").cast("long").alias("l_year"),
                    F.floor("revenue").cast("long").alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


_Q8_TEXT_BODY = """
SELECT o_year,
       sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
       / sum(volume) AS mkt_share
FROM (
    SELECT extract(year FROM o_orderdate) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           n2.n_name AS nation
    FROM part, supplier, lineitem, orders, customer,
         nation n1, nation n2, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND c_nationkey = n1.n_nationkey
      AND n1.n_regionkey = r_regionkey
      AND r_name = 'AMERICA'
      AND s_nationkey = n2.n_nationkey
      AND o_orderdate BETWEEN DATE '1995-01-01'
                          AND DATE '1996-12-31'
      AND p_type = 'ECONOMY'
) AS all_nations
GROUP BY o_year
ORDER BY o_year"""


@register(
    "sqlfront_delta_mv_q8_text",
    f"""
    -- oracle: the SAME q8 text evaluated directly (NATION_3 /
    -- 'ECONOMY' stand in for BRAZIL / the full p_type literal;
    -- structurally the verbatim TPC-H q8): an 8-relation chain with
    -- a self-joined nation, the region dimension, and the
    -- ratio-of-sums head — two maintained aggregates rebuilt by a
    -- post projection
    SELECT CAST(o_year AS BIGINT) AS o_year,
           round(mkt_share, 9) AS mkt_share
    FROM ({_Q8_TEXT_BODY}) q ORDER BY o_year
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch",
)
def sqlfront_delta_mv_q8_text(spark, sf_dir):
    """The TPC-H q8 text maintained as written: ratio-of-sums heads
    (sum(CASE ...)/sum(volume)) reduce each aggregate call separately
    and rebuild the expression as a post projection over the
    maintained result — the reference's mfp above the Reduce."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q8_text WITH (MAINTENANCE "
              f"'delta') AS {_Q8_TEXT_BODY}")
    return (s.sql("SELECT * FROM q8_text")
            .select(F.col("o_year").cast("long").alias("o_year"),
                    F.round("mkt_share", 9).alias("mkt_share"))
            .orderBy("o_year"))


_Q14_TEXT_BODY = """
SELECT 100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0 END)
       / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= DATE '1995-09-01'
  AND l_shipdate < DATE '1995-10-01'"""


@register(
    "sqlfront_delta_mv_q14_text",
    f"""
    -- oracle: the SAME q14 text evaluated directly — the VERBATIM
    -- TPC-H q14 (the synthetic p_type really carries PROMO values):
    -- a keyless ratio-of-sums over the lineitem-part join
    SELECT round(promo_revenue, 9) AS promo_revenue
    FROM ({_Q14_TEXT_BODY}) q
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch",
)
def sqlfront_delta_mv_q14_text(spark, sf_dir):
    """The verbatim TPC-H q14 text maintained: the keyless
    ratio-of-sums head splits into two separately-maintained global
    sums (CASE input expressions computed per delta) with the ratio
    rebuilt post-reduce; the promotion window is the text's own."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q14_text WITH (MAINTENANCE "
              f"'delta') AS {_Q14_TEXT_BODY}")
    return (s.sql("SELECT * FROM q14_text")
            .select(F.round("promo_revenue", 9)
                    .alias("promo_revenue")))


_Q10_TAIL_BODY = """
SELECT c_custkey, c_name,
       sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer, orders, lineitem
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC
LIMIT 20"""


@register(
    "sqlfront_delta_mv_q10_tail",
    f"""
    -- oracle: the SAME q10-shape text evaluated directly (the
    -- synthetic customer lacks c_address/c_phone/c_comment;
    -- structurally the TPC-H q10 with its ORDER BY revenue DESC
    -- LIMIT 20 tail KEPT): the keyed join-aggregate maintains as an
    -- internal delta MV and the global TopK rides its diffs
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
           CAST(floor(revenue) AS BIGINT) AS revenue
    FROM ({_Q10_TAIL_BODY}) q ORDER BY c_custkey
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch",
)
def sqlfront_delta_mv_q10_tail(spark, sf_dir):
    """ORDER BY ... LIMIT over a STATEFUL body (the TPC-H q10 tail —
    q3/q18 carry the same construct): the body-without-tail plans as
    a planner-owned internal delta MV and a maintained global TopK
    stacks over its published diffs (the reference's TopK above the
    Reduce, src/compute-types/src/plan/top_k.rs) — a deleted top row
    pulls the evicted successor back in."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q10_tail WITH (MAINTENANCE "
              f"'delta') AS {_Q10_TAIL_BODY}")
    return (s.sql("SELECT * FROM q10_tail")
            .select(F.col("c_custkey").cast("long").alias("c_custkey"),
                    "c_name",
                    F.floor("revenue").cast("long").alias("revenue"))
            .orderBy("c_custkey"))


_Q18_FULL_BODY = _Q18_TEXT_BODY + """
ORDER BY o_totalprice DESC, o_orderdate
LIMIT 100"""


@register(
    "sqlfront_delta_mv_q18_full",
    f"""
    -- oracle: the q18 text WITH its full ORDER BY o_totalprice DESC,
    -- o_orderdate LIMIT 100 tail (the actual TPC-H query form; the
    -- reference's MV keeps the ORDER BY and drops the LIMIT): the
    -- IN-with-HAVING membership + keyed reduce maintain as an
    -- internal MV and a multi-column global TopK rides its diffs
    SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(floor(o_totalprice) AS BIGINT) AS o_totalprice,
           CAST(floor(total_qty) AS BIGINT) AS total_qty
    FROM ({_Q18_FULL_BODY}) q ORDER BY o_orderkey
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch",
)
def sqlfront_delta_mv_q18_full(spark, sf_dir):
    """q18 with its FULL tail: ORDER BY ... LIMIT over the maintained
    membership+reduce stack — the body-without-tail is an internal
    delta MV and a maintained global TopK with a multi-column
    lexicographic order consumes its diffs (a deleted top row pulls
    the evicted successor back in)."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q18_full WITH (MAINTENANCE "
              f"'delta') AS {_Q18_FULL_BODY}")
    return (s.sql("SELECT * FROM q18_full")
            .select("c_name",
                    F.col("c_custkey").cast("long").alias("c_custkey"),
                    F.col("o_orderkey").cast("long")
                    .alias("o_orderkey"),
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                    .alias("o_orderdate"),
                    F.floor("o_totalprice").cast("long")
                    .alias("o_totalprice"),
                    F.floor("total_qty").cast("long")
                    .alias("total_qty"))
            .orderBy("o_orderkey"))


# ---------------------------------------------------------------------------
# Round-13 completion: the last four TPC-H shapes (q2, q9, q12, q16).
# With these, ALL 22 TPC-H query shapes delta-maintain — ten verbatim
# texts and twelve column-adapted shapes (the synthetic testdata lacks
# partsupp and some comment/phone/shipmode columns; adaptation is
# column substitution only, never structure). The reference maintains
# all 22 in test/sqllogictest/tpch_create_materialized_view.slt.
# ---------------------------------------------------------------------------

_Q12_SHAPE_BODY = """
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
GROUP BY l_returnflag"""


@register(
    "sqlfront_delta_mv_q12_shape",
    f"""
    -- oracle: the SAME q12-shape text evaluated directly (the
    -- synthetic lineitem lacks l_shipmode/l_commitdate/l_receiptdate;
    -- l_returnflag and l_shipdate stand in — structurally the verbatim
    -- TPC-H q12: an IN-list literal filter plus disjunctive and
    -- conjunctive CASE sums under one GROUP BY)
    SELECT l_returnflag,
           CAST(high_line_count AS BIGINT) AS high_line_count,
           CAST(low_line_count AS BIGINT) AS low_line_count
    FROM ({_Q12_SHAPE_BODY}) q ORDER BY l_returnflag
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch",
)
def sqlfront_delta_mv_q12_shape(spark, sf_dir):
    """The q12 shape maintained: IN-list literals are static filter
    predicates (the reference folds them to an OR chain,
    slt:979), and several CASE-conditional sums reduce side by
    side in one RetractionAwareAgg. Oracle = the SAME SQL in DuckDB."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q12_shape WITH "
              f"(MAINTENANCE 'delta') AS {_Q12_SHAPE_BODY}")
    return (s.sql("SELECT * FROM q12_shape")
            .select("l_returnflag",
                    F.col("high_line_count").cast("long")
                    .alias("high_line_count"),
                    F.col("low_line_count").cast("long")
                    .alias("low_line_count"))
            .orderBy("l_returnflag"))


_Q16_SHAPE_BODY = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#45'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_name LIKE '%0001%')
GROUP BY p_brand, p_type, p_size"""


@register(
    "sqlfront_delta_mv_q16_shape",
    f"""
    -- oracle: the SAME q16-shape text evaluated directly (the
    -- synthetic testdata lacks partsupp and s_comment; lineitem's
    -- partkey/suppkey pairs and s_name stand in — structurally the
    -- verbatim TPC-H q16: COUNT(DISTINCT) over a multi-key group,
    -- NOT LIKE and IN-list filters, composed with an uncorrelated
    -- NOT IN whose membership body carries its own LIKE filter)
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(supplier_cnt AS BIGINT) AS supplier_cnt
    FROM ({_Q16_SHAPE_BODY}) q ORDER BY p_brand, p_type, p_size
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch", "subquery",
)
def sqlfront_delta_mv_q16_shape(spark, sf_dir):
    """The q16 shape maintained: a maintained NOT IN membership stage
    (with per-set NULL semantics) feeds a COUNT(DISTINCT) reduce over
    a three-column group — the distinct support rides the shared
    spill tier (the reference renders q16 as Distinct-under-Reduce
    with an anti join, slt:1240-1254). Oracle = same SQL."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q16_shape WITH "
              f"(MAINTENANCE 'delta') AS {_Q16_SHAPE_BODY}")
    return (s.sql("SELECT * FROM q16_shape")
            .select("p_brand", "p_type",
                    F.col("p_size").cast("long").alias("p_size"),
                    F.col("supplier_cnt").cast("long")
                    .alias("supplier_cnt"))
            .orderBy("p_brand", "p_type", "p_size"))


_Q9_SHAPE_BODY = """
SELECT n_name AS nation, extract(year FROM o_orderdate) AS o_year,
       sum(l_extendedprice * (1 - l_discount)) AS sum_profit
FROM part, supplier, lineitem, orders, nation
WHERE s_suppkey = l_suppkey
  AND p_partkey = l_partkey
  AND o_orderkey = l_orderkey
  AND s_nationkey = n_nationkey
  AND p_name LIKE '%a%'
GROUP BY n_name, extract(year FROM o_orderdate)"""


@register(
    "sqlfront_delta_mv_q9_shape",
    f"""
    -- oracle: the SAME q9-shape text evaluated directly (the
    -- synthetic testdata lacks partsupp, so the ps_supplycost term
    -- drops from the profit expression — structurally the verbatim
    -- TPC-H q9: a five-table chain with a LIKE filter and an
    -- EXPRESSION group key, extract(year FROM o_orderdate))
    SELECT nation, CAST(o_year AS BIGINT) AS o_year,
           CAST(floor(sum_profit) AS BIGINT) AS sum_profit
    FROM ({_Q9_SHAPE_BODY}) q ORDER BY nation, o_year
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch",
)
def sqlfront_delta_mv_q9_shape(spark, sf_dir):
    """The q9 shape maintained: group keys may be EXPRESSIONS of
    input columns (extract(year ...)) — the desugar projects the
    expression before the reduce and keys the maintained aggregate on
    it, exactly how the reference plans q9's o_year (Reduce
    group_by=[.., extract_year_d(#4{o_orderdate})], slt:760).
    Five-table bilinear chain below. Oracle = same SQL."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q9_shape WITH "
              f"(MAINTENANCE 'delta') AS {_Q9_SHAPE_BODY}")
    return (s.sql("SELECT * FROM q9_shape")
            .select("nation",
                    F.col("o_year").cast("long").alias("o_year"),
                    F.floor("sum_profit").cast("long")
                    .alias("sum_profit"))
            .orderBy("nation", "o_year"))


_Q2_SHAPE_BODY = """
SELECT s_name, p_partkey, l_extendedprice
FROM part, supplier, lineitem
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND p_size = 15
  AND l_extendedprice = (SELECT min(l2.l_extendedprice)
                         FROM lineitem l2
                         WHERE l2.l_partkey = p_partkey)"""


@register(
    "sqlfront_delta_mv_q2_shape",
    f"""
    -- oracle: the SAME q2-shape text evaluated directly (the
    -- synthetic testdata lacks partsupp/region, so lineitem's
    -- per-part minimum price stands in for ps_supplycost's — the
    -- structural heart of TPC-H q2: an EQUALITY comparison against a
    -- correlated scalar-aggregate subquery over a joined chain)
    SELECT s_name, CAST(p_partkey AS BIGINT) AS p_partkey,
           CAST(floor(l_extendedprice) AS BIGINT) AS l_extendedprice
    FROM ({_Q2_SHAPE_BODY}) q ORDER BY p_partkey, s_name,
                                       l_extendedprice
    """,
    "sqlfront", "ivm", "delta-maintenance", "tpch", "subquery",
)
def sqlfront_delta_mv_q2_shape(spark, sf_dir):
    """The q2 shape maintained: x = (SELECT min(...) correlated) is a
    CmpAggFilterMV stage with an equality comparator — a new minimum
    retracts the previously-equal rows and qualifies the new ones in
    one commit (the reference decorrelates q2's min lookup the same
    way, slt:212-248). Oracle = same SQL."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW q2_shape WITH "
              f"(MAINTENANCE 'delta') AS {_Q2_SHAPE_BODY}")
    return (s.sql("SELECT * FROM q2_shape")
            .select("s_name",
                    F.col("p_partkey").cast("long").alias("p_partkey"),
                    F.floor("l_extendedprice").cast("long")
                    .alias("l_extendedprice"))
            .orderBy("p_partkey", "s_name", "l_extendedprice"))


_SETOP_STATEFUL_BODY = """
SELECT l_returnflag AS flag, sum(l_quantity) AS qty
FROM lineitem GROUP BY l_returnflag
UNION
SELECT o_orderstatus AS flag, sum(o_totalprice) AS qty
FROM orders GROUP BY o_orderstatus"""


@register(
    "sqlfront_delta_mv_setop_stateful",
    f"""
    -- oracle: the SAME set-op-of-aggregates text evaluated directly —
    -- a UNION (distinct) whose branches are grouped reduces; each
    -- stateful branch is a planner-owned internal delta MV and the
    -- distinct-union rides their published diffs
    SELECT flag, CAST(floor(qty) AS BIGINT) AS qty
    FROM ({_SETOP_STATEFUL_BODY}) q ORDER BY flag, qty
    """,
    "sqlfront", "ivm", "delta-maintenance", "setops",
)
def sqlfront_delta_mv_setop_stateful(spark, sf_dir):
    """Set-op chains with STATEFUL branches maintain: each aggregate
    branch plans as an internal delta MV (__sbr_ desugar) and the
    set-op consumes their diffs — the reference's plan_set_expr over
    Reduce subtrees (src/sql/src/plan/query.rs; Let bindings imported
    as arrangements, render.rs). Oracle = same SQL in DuckDB."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW setop_stateful WITH "
              f"(MAINTENANCE 'delta') AS {_SETOP_STATEFUL_BODY}")
    return (s.sql("SELECT * FROM setop_stateful")
            .select("flag",
                    F.floor("qty").cast("long").alias("qty"))
            .orderBy("flag", "qty"))


_GBD_BODY = """
SELECT l_returnflag, l_linestatus
FROM lineitem GROUP BY l_returnflag, l_linestatus"""


@register(
    "sqlfront_delta_mv_groupby_distinct",
    f"""
    -- oracle: the SAME text — GROUP BY over exactly its keys with no
    -- aggregates IS SELECT DISTINCT (the reference lowers both to
    -- Reduce distinct)
    SELECT l_returnflag, l_linestatus FROM ({_GBD_BODY}) q
    ORDER BY l_returnflag, l_linestatus
    """,
    "sqlfront", "ivm", "delta-maintenance",
)
def sqlfront_delta_mv_groupby_distinct(spark, sf_dir):
    """GROUP BY with no aggregates over exactly its keys plans as the
    maintained DISTINCT (reference plan_query.rs lowers both shapes
    to Reduce distinct). Oracle = same SQL in DuckDB."""
    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW gbd WITH "
              f"(MAINTENANCE 'delta') AS {_GBD_BODY}")
    return (s.sql("SELECT * FROM gbd")
            .orderBy("l_returnflag", "l_linestatus"))


_WIN_JOIN_BODY = """
SELECT o_orderstatus, l_quantity,
       sum(l_quantity) OVER (PARTITION BY o_orderstatus) AS status_qty
FROM lineitem, orders
WHERE l_orderkey = o_orderkey AND l_quantity > 45"""


@register(
    "sqlfront_delta_mv_window_join",
    f"""
    -- oracle: the SAME window-over-join text evaluated directly —
    -- the join part is a planner-owned internal delta MV and the
    -- frameless window aggregate stacks over its published diffs
    SELECT o_orderstatus,
           CAST(floor(l_quantity) AS BIGINT) AS l_quantity,
           CAST(floor(status_qty) AS BIGINT) AS status_qty
    FROM ({_WIN_JOIN_BODY}) q
    ORDER BY o_orderstatus, l_quantity
    """,
    "sqlfront", "ivm", "delta-maintenance", "window",
)
def sqlfront_delta_mv_window_join(spark, sf_dir):
    """Window functions over a JOIN CHAIN maintain: the join part
    plans as an internal delta MV (__jsub_) and the window rides its
    diffs — the reference renders window functions as whole-group
    Reduce above whatever plan feeds them
    (src/expr/src/relation/func.rs), so a join input changes nothing.
    Oracle = same SQL in DuckDB."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW win_join WITH "
              f"(MAINTENANCE 'delta') AS {_WIN_JOIN_BODY}")
    return (s.sql("SELECT * FROM win_join")
            .select("o_orderstatus",
                    F.floor("l_quantity").cast("long")
                    .alias("l_quantity"),
                    F.floor("status_qty").cast("long")
                    .alias("status_qty"))
            .orderBy("o_orderstatus", "l_quantity"))


_MAP_JOIN_BODY = """
SELECT o_orderstatus,
       l_extendedprice * (1 - l_discount) AS net,
       CASE WHEN l_discount > 0.05 THEN 'deep' ELSE 'shallow' END
           AS band
FROM lineitem, orders
WHERE l_orderkey = o_orderkey AND l_quantity > 49"""


@register(
    "sqlfront_delta_mv_map_over_join",
    f"""
    -- oracle: the SAME expression-projection-over-join text — the
    -- join part is a planner-owned internal delta MV and the
    -- stateless Map (arithmetic + CASE over both sides' columns)
    -- rides its published diffs
    SELECT o_orderstatus, CAST(floor(net) AS BIGINT) AS net, band
    FROM ({_MAP_JOIN_BODY}) q
    ORDER BY o_orderstatus, net, band
    """,
    "sqlfront", "ivm", "delta-maintenance",
)
def sqlfront_delta_mv_map_over_join(spark, sf_dir):
    """Stateless EXPRESSION projections over a join chain maintain:
    the join part plans as an internal delta MV (__jsub_) and the Map
    is a per-delta projection on the spine — the reference fuses
    Map/Filter/Project onto any input plan (mfp fusion,
    src/expr/src/linear.rs). Oracle = same SQL in DuckDB."""
    from pyspark.sql import functions as F

    s = MzSession(spark, sf_dir)
    s.execute("CREATE MATERIALIZED VIEW map_join WITH "
              f"(MAINTENANCE 'delta') AS {_MAP_JOIN_BODY}")
    return (s.sql("SELECT * FROM map_join")
            .select("o_orderstatus",
                    F.floor("net").cast("long").alias("net"), "band")
            .orderBy("o_orderstatus", "net", "band"))
