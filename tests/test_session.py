"""Pin the session factory's measured-in defaults.

zstd shuffle codec, committer v2, and conservative speculation were each
adopted on interleaved A/B evidence (BENCH/BASELINE.md round-5 appendix)
and speculation doubles as the rescue for a measured JVM<->Python socket
deadlock — losing any of them in a refactor would be a silent perf or
robustness regression no functional test notices. Runs in a SUBPROCESS:
inside pytest the shared SparkContext already exists, and getOrCreate
would hand back the fixture's session with the factory's confs ignored.
"""
from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

PROBE = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
from binlogpipe.session import build_spark
s = build_spark(app="conf-pin", cores=2)
c = s.sparkContext.getConf()
print(json.dumps({
    "codec": c.get("spark.io.compression.codec", None),
    "committer": c.get(
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        None),
    "speculation": c.get("spark.speculation", None),
    "spec_mult": c.get("spark.speculation.multiplier", None),
    "spec_quant": c.get("spark.speculation.quantile", None),
    "udf_batch": c.get(
        "spark.sql.execution.python.udf.maxRecordsPerBatch", None),
    "master": c.get("spark.master", None),
    "override": s.conf.get("spark.sql.shuffle.partitions"),
}))
s.stop()
"""


def test_session_defaults_pinned():
    p = subprocess.run([sys.executable, "-c", PROBE, str(REPO)],
                       capture_output=True, text=True, timeout=300)
    assert p.returncode == 0, p.stderr[-2000:]
    conf = json.loads(p.stdout.strip().splitlines()[-1])
    assert conf["codec"] == "zstd"
    assert conf["committer"] == "2"
    assert conf["speculation"] == "true"
    assert conf["spec_mult"] == "4"
    assert conf["spec_quant"] == "0.9"
    assert conf["udf_batch"] == "20000"  # Spark 4 defaults this to 100
    assert conf["master"] == "local[2]"  # explicit cores pins local[N]
