#!/usr/bin/env python
"""spark-submit application file for the batch pipeline.

    python tools/package_pyfiles.py
    spark-submit --master <cluster> --py-files dist/binlogpipe.zip \
        submit.py --input <seq table> --out <out dir> [--no-resume]

The package code reaches the executors via --py-files; this launcher is
the driver entrypoint (a bare `binlogpipe/job.py` path cannot be the
application file — the package uses relative imports). build_spark
respects the spark-submit-provided master/deploy config and only
defaults to local[N] when launched outside spark-submit
(session.py)."""
from binlogpipe.job import main

if __name__ == "__main__":
    main()
