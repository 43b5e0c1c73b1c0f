#!/usr/bin/env python
"""One-off: the interleaved 8/32 scaling pair at sf1.0 (60M events) —
round-3 verdict item 8: show the efficiency story when fixed overheads
are amortized over a 10x-bench-sized input. Prints one JSON line."""
from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def main() -> None:
    input_path, n_rows = bench.synth_input(1.0)
    warm = "/tmp/binlogpipe_bench/input_warm.parquet"
    if not Path(warm).exists():
        from tools import fixture_gen
        fixture_gen.write_synth_parquet(Path(warm), 60)
    pair = bench.scaling_pair(input_path, warm, n_rows,
                              "/tmp/binlogpipe_bench", "sf1_")
    print(json.dumps({"sf": 1.0, "rows": n_rows, **pair}))


if __name__ == "__main__":
    main()
