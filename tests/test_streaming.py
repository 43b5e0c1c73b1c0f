"""Streaming/batch parity: the Structured Streaming DAG drained with
Trigger.AvailableNow must reproduce the batch per-sink count goldens and
resume from its checkpoint without reprocessing."""

import shutil
from pathlib import Path

from binlogpipe import streaming
from tests.test_pipeline import GOLDEN_COUNTS


def _stage_input(fixture_parquet, tmp_path) -> str:
    d = tmp_path / "stream_in"
    d.mkdir()
    shutil.copy(fixture_parquet, d / "part-0.parquet")
    return str(d)


def test_stream_counts_match_batch_golden(spark, fixture_parquet, tmp_path):
    input_dir = _stage_input(fixture_parquet, tmp_path)
    counts = streaming.run_counts_available_now(
        spark, input_dir, str(tmp_path / "ck_counts"))
    assert counts == GOLDEN_COUNTS


def test_stream_transaction_assembler(spark, fixture_parquet, tmp_path):
    """Stateful GTID→XID transaction assembly matches a plain-python
    simulation over the raw fixture events."""
    from binlogpipe.layout import EVENT_TYPES
    from tools import fixture_gen

    # independent expectation: walk raw events per fixture in file order
    expected = []
    state = {}
    for doc_id, src, ev in fixture_gen.load_fixture_events():
        sink = EVENT_TYPES.get(ev[4], "QUARANTINE")
        log_pos = int.from_bytes(ev[13:17], "little")
        gpos, n, is_open = state.get(src, (-1, 0, 0))
        if sink in ("GTID", "ANON_GTID"):
            gpos, n, is_open = log_pos, 1, 1
        elif is_open:
            n += 1
            if sink == "XID":
                expected.append((src, gpos, log_pos, n))
                gpos, n, is_open = -1, 0, 0
        state[src] = (gpos, n, is_open)
    expected.sort()

    input_dir = _stage_input(fixture_parquet, tmp_path)
    rows = streaming.run_transactions_available_now(
        spark, input_dir, str(tmp_path / "ck_txn"))
    got = sorted((r["source"], r["gtid_log_pos"], r["xid_log_pos"],
                  r["n_events"]) for r in rows)
    assert got == expected
    assert len(got) == 13  # one transaction per XID event (BASELINE.md §2)


def test_stream_routed_parquet_and_checkpoint_resume(spark, fixture_parquet,
                                                     tmp_path):
    input_dir = _stage_input(fixture_parquet, tmp_path)
    out = tmp_path / "stream_out"
    ck = tmp_path / "ck_route"
    streaming.run_available_now(spark, input_dir, str(out), str(ck))
    df = spark.read.parquet(str(out))
    assert df.count() == 166
    assert {r["sink"] for r in df.select("sink").distinct().collect()} == set(
        GOLDEN_COUNTS)
    # second drain with the same checkpoint: no new files -> no new rows
    streaming.run_available_now(spark, input_dir, str(out), str(ck))
    assert spark.read.parquet(str(out)).count() == 166
    # new file arrives -> incremental processing picks up only the delta
    shutil.copy(Path(fixture_parquet),
                Path(input_dir) / "part-1.parquet")
    streaming.run_available_now(spark, input_dir, str(out), str(ck))
    assert spark.read.parquet(str(out)).count() == 332
