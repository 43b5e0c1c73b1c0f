import shutil
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FIXTURE_PARQUET = REPO / "data" / "fixture_events.parquet"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("binlogpipe-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_parquet():
    """Regenerate the input table from the reference .bin files so tests
    never depend on a stale committed artifact."""
    from tools import fixture_gen

    import pyarrow.parquet as pq

    rows = fixture_gen.load_fixture_events()
    assert len(rows) == 166
    tbl = fixture_gen.rows_to_table(rows)
    # content-compare, don't just check existence: a committed artifact
    # that drifted from the reference .bin derivation must be rewritten,
    # or partial test runs silently go green against stale inputs
    if (not FIXTURE_PARQUET.exists()
            or not pq.read_table(FIXTURE_PARQUET).equals(tbl)):
        pq.write_table(tbl, FIXTURE_PARQUET)
    return str(FIXTURE_PARQUET)


@pytest.fixture(scope="session")
def pipeline_out(spark, fixture_parquet, tmp_path_factory):
    """One full pipeline run shared by all golden tests."""
    from binlogpipe.job import run_pipeline

    out = tmp_path_factory.mktemp("pipe") / "out"
    shutil.rmtree(out, ignore_errors=True)
    metrics = run_pipeline(spark, fixture_parquet, str(out), run_id="test")
    return {"out": str(out), "metrics": metrics}


def sink_df(spark, pipeline_out, sink):
    return spark.read.parquet(f"{pipeline_out['out']}/sinks/{sink}")
