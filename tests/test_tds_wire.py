"""SQL Server TDS wire protocol: prelogin/login/batch + CDC e2e.

Protocol under test: the PUBLIC [MS-TDS] subset (packet framing,
PRELOGIN with encryption declined, LOGIN7 trust, SQL_BATCH UCS-2 text,
COLMETADATA/ROW/DONE token stream); semantics mirrored: the reference's
SQL Server source reading cdc.<instance>_CT by query
(/root/reference/src/sql-server-util/src/cdc.rs).
"""

import pytest

from materialize_spark.sources.sqlserver_cdc import (
    OP_DELETE, OP_INSERT, OP_UPDATE_NEW, OP_UPDATE_OLD, apply_changes,
    lsn_bytes,
)
from materialize_spark.sources.tds_wire import (
    MiniSqlServer, SqlServerWireClient, read_sqlserver_ct,
)

CT_SCHEMA = [("__$start_lsn", "varbinary"), ("__$seqval", "varbinary"),
             ("__$operation", "int"), ("id", "bigint"),
             ("label", "nvarchar")]

CT_ROWS = [
    (lsn_bytes(1), lsn_bytes(0, 0, 1), OP_UPDATE_OLD, 0, "zero"),
    (lsn_bytes(1), lsn_bytes(0, 0, 1), OP_UPDATE_NEW, 0, "ZERO2"),
    (lsn_bytes(2), lsn_bytes(0, 0, 1), OP_DELETE, 3, "three"),
    (lsn_bytes(3), lsn_bytes(0, 0, 1), OP_INSERT, 5, "five"),
    (lsn_bytes(3), lsn_bytes(0, 0, 2), OP_INSERT, 6, None),
]


def _tables():
    return {"cdc.widgets_CT": (CT_SCHEMA, CT_ROWS)}


def test_login_and_query_tokens():
    with MiniSqlServer(_tables()) as srv:
        with SqlServerWireClient(srv.host, srv.port) as c:
            names, rows = c.query("SELECT * FROM cdc.widgets_CT")
            assert names == [n for n, _ in CT_SCHEMA]
            assert len(rows) == 5
            assert rows[0][2] == OP_UPDATE_OLD
            assert bytes(rows[0][0]) == lsn_bytes(1)
            assert rows[1][4] == "ZERO2"
            assert rows[4][4] is None  # NVARCHAR NULL survives


def test_unknown_table_errors():
    with MiniSqlServer(_tables()) as srv:
        with SqlServerWireClient(srv.host, srv.port) as c:
            with pytest.raises(ValueError, match="invalid object name"):
                c.query("SELECT * FROM cdc.nope_CT")
            # connection survives the error
            names, _ = c.query("SELECT * FROM cdc.widgets_CT")
            assert names[0] == "__$start_lsn"


def test_tds_to_apply_changes_e2e(spark):
    """Full chain over the socket: TDS drain → change-table frame →
    changes_to_diff → apply_cdc state fold."""
    with MiniSqlServer(_tables()) as srv:
        ct = read_sqlserver_ct(spark, srv.host, srv.port, "widgets")
        assert "__$operation" in ct.columns
        base = spark.createDataFrame(
            [(0, "zero"), (3, "three")], "id bigint, label string")
        state = apply_changes(base, ct, ["id"]).toPandas() \
            .sort_values("id").reset_index(drop=True)
        assert list(state.id) == [0, 5, 6]  # 3 deleted, 5/6 inserted
        assert state[state.id == 0].label.iloc[0] == "ZERO2"
        assert state[state.id == 6].label.isna().all()


def test_multi_packet_response_reassembly():
    """A server whose negotiated packet size is tiny must split the
    token stream across many packets (EOM only on the last); the
    client's framing layer reassembles them transparently."""
    from materialize_spark.sources.tds_wire import (
        MiniSqlServer, SqlServerWireClient,
    )
    schema = [("id", "bigint"), ("payload", "nvarchar")]
    rows = [(i, "x" * 200) for i in range(50)]
    with MiniSqlServer({"wide": (schema, rows)},
                       packet_size=128) as srv:
        with SqlServerWireClient(srv.host, srv.port) as c:
            cols, got = c.query("SELECT * FROM wide")
            assert cols == ["id", "payload"]
            assert len(got) == 50
            assert got[49] == [49, "x" * 200]
