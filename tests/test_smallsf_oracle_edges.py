"""Small-SF oracle edges caught in round 13's full-SF sweep.

Two latent divergences only visible at sf0.001 (both reproduced on the
pre-round tree — inherited, not introduced):

1. cdc_mysql_*: a binlog UPDATE_ROWS for a key absent from the snapshot
   (supplier has keys 0-9 at sf0.001; the scenario updates key 10) must
   be SKIPPED, not upserted — row-based replication never inserts on
   update of a missing row. apply_cdc honors the producer's ``upd``
   marker for this.
2. subquery_decorrelated: Spark's round(double, 2) rounds the shortest
   decimal repr while the oracle rounds the scaled binary value; at
   .xx5 knife-edges they disagree by one cent. The entry uses the
   scaled form (round(x*100)/100) and file-order raw scans for the
   double avg so the sums are bit-identical to the oracle's.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    from materialize_spark.queries import load_all
    return load_all()


def test_mysql_update_of_missing_key_is_skipped(spark, registry):
    rows = registry["cdc_mysql_apply"].fn(spark, SF_DIR).collect()
    # snapshot keys 0-9, minus deleted 50 (absent anyway), plus inserted
    # 100; key 10's UPDATE must NOT materialize a row, key 101's
    # insert+delete nets out
    keys = sorted(r.s_suppkey for r in rows)
    assert keys == [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 100]
    byk = {r.s_suppkey: r for r in rows}
    assert byk[0].s_name == "SUP_ZERO"       # update of existing key applies
    assert byk[7].s_name == "SUP_PHOENIX"    # delete then re-insert
    assert 10 not in byk                     # update of missing key skipped


def test_mysql_update_still_applies_when_key_exists(spark, registry):
    # at sf0.01 key 10 exists: the same scenario must keep updating it
    rows = registry["cdc_mysql_apply"].fn(
        spark, "/root/testdata/sf0.01").collect()
    byk = {r.s_suppkey: r for r in rows}
    assert byk[10].s_name == "SUP_TEN"
    assert byk[10].s_acctbal == 1234.5
    assert len(rows) == 100  # 100 snapshot - {50, nothing else} + 100 - 101


def test_decorrelated_round_knife_edges(spark, registry):
    rows = registry["subquery_decorrelated"].fn(spark, SF_DIR).collect()
    byk = {r.c_custkey: r for r in rows}
    # the two .xx5 knife-edge rows: the oracle's scaled-binary rounding
    assert byk[40].diff_nation_avg == 4472.35
    assert byk[85].diff_nation_avg == -4016.16
