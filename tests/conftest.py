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

    rows = fixture_gen.load_fixture_events()
    assert len(rows) == 166
    if not FIXTURE_PARQUET.exists():
        import pyarrow.parquet as pq

        pq.write_table(fixture_gen.rows_to_table(rows), FIXTURE_PARQUET)
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
