#!/usr/bin/env python
"""Build dist/binlogpipe.zip for `spark-submit --py-files`.

The north-rule launch form is `spark-submit --py-files binlogpipe.zip
submit.py ...` on a multi-executor cluster: the zip is what ships the
package to every executor's PYTHONPATH (the driver-side launcher,
submit.py, rides along as the application file). Deterministic output:
entries sorted, timestamps zeroed, so the artifact hash is stable for
cache/CI purposes.

    python tools/package_pyfiles.py [out_zip]
"""
from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: Path | None = None) -> Path:
    out = out or REPO / "dist" / "binlogpipe.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    files = sorted((REPO / "binlogpipe").glob("*.py"))
    if not files:
        raise SystemExit("no package sources found")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in files:
            info = zipfile.ZipInfo(f"binlogpipe/{f.name}",
                                   date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            z.writestr(info, f.read_bytes())
    return out


if __name__ == "__main__":
    dest = build(Path(sys.argv[1]) if len(sys.argv) > 1 else None)
    print(dest)
