"""Package py_mongo_sync_spark for `spark-submit --py-files` deployment.

Usage: python tools/make_pyfiles_zip.py [out.zip]
Zips the package (source only) so a cluster submit ships the engine to
every executor:

    spark-submit --py-files pms.zip your_job.py

The bench's local-cluster sessions use spark.executorEnv.PYTHONPATH for
the same effect in-sandbox; this produces the artifact a real cluster
deployment uses.
"""
from __future__ import annotations

import os
import sys
import zipfile


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "pms.zip"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "py_mongo_sync_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    print(out)


if __name__ == "__main__":
    main()
