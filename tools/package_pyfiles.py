"""Build the --py-files artifact for spark-submit deployment.

The north-star run mode is ``spark-submit --py-files pkg.zip job.py`` on a
multi-executor cluster: executors unpickle the Arrow parse UDF and the
fold closures, so the package must be importable on every worker. This
zips ``py_mongo_sync_spark`` (sources only, no caches/tests) into a
single artifact:

    python tools/package_pyfiles.py [out.zip]
    spark-submit --py-files out.zip --deploy-mode cluster your_job.py

Local test parity: bench.py and the pytest suite get the same effect via
PYTHONPATH (the sandbox's stand-in for --py-files distribution).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> int:
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "py_mongo_sync_spark")
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
                    n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "py_mongo_sync_spark.zip"
    n = build(out)
    print(f"{out}: {n} modules")
