"""Build dist/pipeline.zip for `spark-submit --py-files` (SURVEY.md §7.1 M7).

Usage:  python tools/package.py      →  dist/pipeline.zip

The zip contains the whole `opentelemetry_collector_spark` package (no tests,
no caches); executors import it from the zip verbatim.  Cluster launch:

    spark-submit --master <cluster> \
        --py-files dist/pipeline.zip jobs/pipeline_job.py \
        --input <iceberg/parquet path> --output <sink root> --rows 0
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "opentelemetry_collector_spark"


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "pipeline.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return out


if __name__ == "__main__":
    print(build())
