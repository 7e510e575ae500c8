"""Deployment contract: the engine runs under `spark-submit --py-files`
with the package shipped ONLY as a zip — executors (including the Arrow
pandas-UDF parse workers) import it from the shipped archive, the
production deployment shape on a real cluster."""

from __future__ import annotations

import os
import subprocess
import sys

JOB = '''
import json, sys, tempfile
from pyspark.sql import SparkSession
spark = (SparkSession.builder.appName("submit-check")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from py_mongo_sync_spark.config import SyncConfig
from py_mongo_sync_spark.sources.generate import (
    gen_oplog_events, gen_transcripts_snapshot, oracle_replay)
from py_mongo_sync_spark.streaming.pipeline import CdcPipeline
from py_mongo_sync_spark.check import check_consistency
root = tempfile.mkdtemp(prefix="submit_")
cfg = SyncConfig(dst_path=root + "/lake", checkpoint_path=root + "/cp", n_buckets=4)
snap = gen_transcripts_snapshot(spark, 10, 3)
ev = gen_oplog_events(spark, 10, 3, 200)
pipe = CdcPipeline(spark, cfg)
pipe.initial_sync(snap)
pipe.apply_batch(ev, 0)
expected = spark.createDataFrame(oracle_replay(snap.toPandas(), ev.toPandas()))
rep = check_consistency(expected, pipe.table.read(),
                        ["conv_id", "turn_idx"], ["role", "text", "ts"])
print("SUBMIT-CHECK " + json.dumps({"ok": rep["ok"], "rows": rep["n_actual"]}))
sys.exit(0 if rep["ok"] else 1)
'''


def test_spark_submit_py_files_deployment(tmp_path):
    import pyspark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = str(tmp_path / "pms.zip")
    subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "make_pyfiles_zip.py"),
         zip_path],
        check=True, cwd=str(tmp_path),
    )
    job = tmp_path / "job.py"
    job.write_text(JOB)
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [submit, "--master", "local[4]", "--py-files", zip_path, str(job)],
        capture_output=True, text=True, timeout=400, cwd=str(tmp_path), env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert '"ok": true' in out.stdout
