"""End-to-end engine flow: webhook source → materialized view →
SUBSCRIBE diff stream → file sink — every stage through the SQL surface,
the way a reference user strings the system together."""

from materialize_spark.plans.sqlfront import MzSession

SF_DIR = "/root/testdata/sf0.001"


def test_webhook_to_mv_to_subscribe_to_sink(spark, tmp_path):
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE SOURCE clicks FROM WEBHOOK BODY FORMAT JSON")
    for user, page in [(1, "home"), (1, "docs"), (2, "home")]:
        sess.webhook("clicks").post({"user": user, "page": page})

    sess.execute("""CREATE MATERIALIZED VIEW clicks_by_page AS
        SELECT get_json_object(body, '$.page') AS page,
               count(*)::int8 AS n
        FROM clicks GROUP BY 1""")

    # snapshot via SUBSCRIBE: +1 rows only
    snap = sess.sql("SUBSCRIBE clicks_by_page").collect()
    assert {(r.page, r.n, r.diff) for r in snap} == \
        {("home", 2, 1), ("docs", 1, 1)}

    # new deliveries + refresh → incremental diffs (retract old count,
    # add new)
    sess.webhook("clicks").post({"user": 3, "page": "home"})
    sess.execute("REFRESH MATERIALIZED VIEW clicks_by_page")
    deltas = sess.sql("SUBSCRIBE clicks_by_page").collect()
    assert {(r.page, r.n, r.diff) for r in deltas} == \
        {("home", 2, -1), ("home", 3, 1)}

    # sink the maintained result to files and read it back
    sess.execute(f"CREATE SINK clicks_sink FROM clicks_by_page "
                 f"INTO FILE '{tmp_path}/out' FORMAT JSON")
    back = spark.read.json(f"{tmp_path}/out")
    assert {(r.page, r.n) for r in back.collect()} == \
        {("home", 3), ("docs", 1)}
