"""End-to-end over the *synthesized* scale-up input (what bench.py runs):
per-sink counts scale exactly by the replication factor, header fields are
perturbed but payload decodes still match the fixture goldens."""

import pytest
from pyspark.sql import functions as F

from binlogpipe.job import run_pipeline
from tests.test_pipeline import GOLDEN_COUNTS
from tools import fixture_gen

FACTOR = 5


@pytest.fixture(scope="module")
def synth_out(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("synth")
    inp = base / "input.parquet"
    n = fixture_gen.write_synth_parquet(inp, FACTOR)
    assert n == 166 * FACTOR
    out = base / "out"
    run_pipeline(spark, str(inp), str(out), run_id="synth")
    return str(out)


def test_synth_sink_counts_scale(spark, synth_out):
    got = {r["sink"]: r["n"]
           for r in spark.read.parquet(f"{synth_out}/agg/sink_counts").collect()}
    assert got == {k: v * FACTOR for k, v in GOLDEN_COUNTS.items()}


def test_synth_payload_goldens_hold(spark, synth_out):
    # every replica of the golden Xid event decodes to the same xid;
    # headers (server_id) differ per replica
    xid = spark.read.parquet(f"{synth_out}/sinks/XID")
    reps = xid.filter(F.col("doc_id").startswith("16_xid/10/")).collect()
    assert len(reps) == FACTOR
    assert all(r["xid"] == 41 for r in reps)
    assert len({r["server_id"] for r in reps}) > 1  # perturbed headers
    gtid = spark.read.parquet(f"{synth_out}/sinks/GTID")
    g = gtid.filter(F.col("doc_id").startswith("33_35_gtid_prev_gtid/2/")).collect()
    assert len(g) == FACTOR
    assert all(r["source_id"] ==
               "12884158204-210242-17234-183144-2661721902" for r in g)


def test_synth_no_parse_errors(spark, synth_out):
    for sink in ("QUERY", "GTID", "TABLE_MAP", "WRITE_ROWS_V2",
                 "UPDATE_ROWS_V2"):
        df = spark.read.parquet(f"{synth_out}/sinks/{sink}")
        assert df.filter(F.col("parse_error").isNotNull()).count() == 0, sink


def test_synth_lineage_totals(spark, synth_out):
    lin = spark.read.parquet(f"{synth_out}/lineage")
    agg = lin.agg(F.sum("rows_in"), F.sum("rows_routed")).first()
    assert agg[0] == 166 * FACTOR and agg[1] == 166 * FACTOR
