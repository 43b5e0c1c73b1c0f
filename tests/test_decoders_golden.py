"""Golden field assertions transcribed from the reference's integration
tests (`/root/reference/tests/test.rs`), run against the typed sinks of a
full pipeline execution (FIXTURES.md §4)."""

import json

from tests.conftest import sink_df


def row(spark, pipeline_out, sink, doc_id):
    df = sink_df(spark, pipeline_out, sink)
    rows = df.filter(df.doc_id == doc_id).collect()
    assert len(rows) == 1, f"{sink} {doc_id}: {len(rows)} rows"
    r = rows[0].asDict()
    assert r.get("parse_error") is None, r.get("parse_error")
    return r


def test_stop(spark, pipeline_out):  # test.rs:6-14
    r = row(spark, pipeline_out, "STOP", "03_stop/2")
    assert r["event_type"] == 0x03


def test_rotate(spark, pipeline_out):  # test.rs:17-32
    r = row(spark, pipeline_out, "ROTATE", "04_rotate/2")
    assert r["next_binlog"] == "mysql_bin.000002"
    assert r["position"] == 4


def test_intvar(spark, pipeline_out):  # test.rs:35-47
    r = row(spark, pipeline_out, "INTVAR", "05_intvar/8")
    assert r["e_type"] == "LastInsertIdEvent"
    assert r["value"] == 0


def test_rand(spark, pipeline_out):  # test.rs:50-61
    r = row(spark, pipeline_out, "RAND", "13_rand/8")
    assert r["seed1"] == 694882935
    assert r["seed2"] == 292094996


def test_user_var(spark, pipeline_out):  # test.rs:64-119
    r = row(spark, pipeline_out, "USER_VAR", "14_user_var/9")
    assert (r["name"], r["d_type"], r["charset"]) == ("val_s", "STRING", 33)
    assert r["value"] == [116, 101, 115, 116, 32, 98, 108, 111, 103]
    r = row(spark, pipeline_out, "USER_VAR", "14_user_var/10")
    assert (r["name"], r["d_type"]) == ("val_i", "INT")
    assert r["value"] == [100, 0, 0, 0, 0, 0, 0, 0]
    assert r["value_flags"] is not None  # INT carries trailing flags byte
    r = row(spark, pipeline_out, "USER_VAR", "14_user_var/11")
    assert (r["name"], r["d_type"]) == ("val_d", "DECIMAL")
    assert r["value"] == [3, 2, 129, 0]


def test_format_desc(spark, pipeline_out):  # test.rs:122-139
    r = row(spark, pipeline_out, "FORMAT_DESC", "15_format_desc/0")
    assert r["binlog_version"] == 4
    assert r["mysql_server_version"] == "5.7.30-log"
    assert r["create_timestamp"] == 1596175634


def test_xid(spark, pipeline_out):  # test.rs:142-152
    r = row(spark, pipeline_out, "XID", "16_xid/10")
    assert r["xid"] == 41


def test_table_map(spark, pipeline_out):  # test.rs:155-179
    r = row(spark, pipeline_out, "TABLE_MAP", "19_table_map/8")
    assert r["table_id"] == 110
    assert r["table_name"] == "boxercrab"
    # header-level flags==1 asserted on the event header in the reference
    ct = [(x["type_id"], list(x["meta"])) for x in r["columns_type"]]
    assert ct == [(3, []), (15, [160])]  # [Long, VarChar(160)]
    assert list(r["null_bits"]) == [0]


def test_rows_query(spark, pipeline_out):  # test.rs:182-193
    r = row(spark, pipeline_out, "ROWS_QUERY", "29_row_query/8")
    assert r["query_text"] == (
        "INSERT INTO `boxercrab` (`title`) VALUES ('hahhhhhhhhh')")
    assert r["statement_kind"] == "INSERT"


def test_begin_and_exec_load_query(spark, pipeline_out):  # test.rs:196-230
    r = row(spark, pipeline_out, "BEGIN_LOAD_QUERY", "17_18_load/4")
    assert r["file_id"] == 1
    assert r["block_data"] == '1,"abc"\n'
    r = row(spark, pipeline_out, "EXEC_LOAD_QUERY", "17_18_load/5")
    assert r["thread_id"] == 23
    assert r["file_id"] == 1
    assert r["start_pos"] == 9
    assert r["end_pos"] == 37
    assert r["schema"] == "default"
    assert r["query"] == (
        "LOAD DATA INFILE '/tmp/data.txt' INTO TABLE `boxercrab` FIELDS "
        "TERMINATED BY ',' OPTIONALLY  ENCLOSED BY '\"' ESCAPED BY '\\\\' "
        "LINES TERMINATED BY '\\n' (`i`, `c`)")


def _cells(r_rows):
    return [[(cell["kind"], list(cell["bytes"]) if cell["bytes"] is not None
              else None, cell["num_val"]) for cell in img] for img in r_rows]


def test_write_rows_v2(spark, pipeline_out):  # test.rs:233-256
    r = row(spark, pipeline_out, "WRITE_ROWS_V2", "30_write_rows_v2/10")
    assert r["table_id"] == 111
    assert r["column_count"] == 2
    assert _cells(r["rows"]) == [[
        ("Long", [1, 0, 0, 0], None),
        ("VarChar", [97, 98, 99, 100, 101], None),
    ]]
    assert r["tm_table_name"] == "boxercrab"


def test_update_rows_v2(spark, pipeline_out):  # test.rs:259-293
    r = row(spark, pipeline_out, "UPDATE_ROWS_V2", "31_update_rows_v2/5")
    abc, xd = [97, 98, 99], [120, 100]
    assert _cells(r["rows"]) == [
        [
            ("Long", [1, 0, 0, 0], None),
            ("VarChar", abc, None), ("VarChar", abc, None),
            ("Blob", abc, None), ("Blob", abc, None), ("Blob", abc, None),
            ("Float", None, 1.0), ("Double", None, 2.0),
            ("NewDecimal", [128, 0, 3, 0, 0], None),
        ],
        [
            ("Long", [1, 0, 0, 0], None),
            ("VarChar", xd, None), ("VarChar", xd, None),
            ("Blob", xd, None), ("Blob", xd, None), ("Blob", xd, None),
            ("Float", None, 4.0), ("Double", None, 4.0),
            ("NewDecimal", [128, 0, 4, 0, 0], None),
        ],
    ]


def test_delete_rows_v2(spark, pipeline_out):  # test.rs:296-319
    r = row(spark, pipeline_out, "DELETE_ROWS_V2", "32_delete_rows_v2/16")
    assert r["table_id"] == 112
    assert r["column_count"] == 2
    assert _cells(r["rows"]) == [[
        ("Long", [1, 0, 0, 0], None),
        ("VarChar", [97, 98, 99, 100, 101], None),
    ]]


def test_gtid(spark, pipeline_out):  # test.rs:322-345
    r = row(spark, pipeline_out, "GTID", "33_35_gtid_prev_gtid/2")
    assert r["rbr_only"] is False
    assert r["source_id"] == "12884158204-210242-17234-183144-2661721902"
    assert r["transaction_id"] == "10000000"
    assert r["ts_type"] == 2
    assert r["last_committed"] == 0
    assert r["sequence_number"] == 1


def test_anonymous_gtid(spark, pipeline_out):  # test.rs:348-371
    r = row(spark, pipeline_out, "ANON_GTID", "34_anonymous_gtid/2")
    assert r["rbr_only"] is False
    assert r["source_id"] == "0000-00-00-00-000000"
    assert r["transaction_id"] == "00000000"
    assert r["ts_type"] == 2
    assert r["last_committed"] == 0
    assert r["sequence_number"] == 1


def test_previous_gtids(spark, pipeline_out):  # test.rs:374-384
    r = row(spark, pipeline_out, "PREV_GTIDS", "33_35_gtid_prev_gtid/1")
    assert list(r["gtid_sets"]) == [0, 0, 0, 0]


def test_query_status_vars(spark, pipeline_out):
    """Query decode sanity: status vars parse to the exhaustion boundary and
    the SQL text + grok classification round-trip."""
    df = sink_df(spark, pipeline_out, "QUERY")
    rows = {r["doc_id"]: r.asDict() for r in df.collect()}
    assert all(v["parse_error"] is None for v in rows.values())
    begins = [v for v in rows.values() if v["query"] == "BEGIN"]
    assert begins and all(v["statement_kind"] == "BEGIN" for v in begins)
    for v in rows.values():
        sv = json.loads(v["status_vars"])
        assert isinstance(sv, list)
        # every Query in the fixtures carries Q_FLAGS2 + Q_SQL_MODE first
        assert sv[0]["name"] == "Q_FLAGS2_CODE"
        assert sv[1]["name"] == "Q_SQL_MODE_CODE"
