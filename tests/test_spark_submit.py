"""The north rule's literal launch path, actually executed: build the
--py-files zip, then spark-submit a job that imports the library FROM THE
ZIP ONLY (the repo dir is scrubbed from the job's sys.path) and runs a
sketch query end to end."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = r"""
import sys

# prove the zip is self-sufficient: drop any path that could shadow it
# with the repo checkout (spark-submit prepends the --py-files zip)
sys.path = [p for p in sys.path if not p.rstrip("/").endswith("repo")]

from pyspark.sql import SparkSession, functions as F

from sketches_go_spark.core.ddsketch import DDSketchConfig
from sketches_go_spark.functions import ddsketch_fns as dd

import sketches_go_spark

assert "sketches_go_spark.zip" in sketches_go_spark.__file__, (
    "library must load from the --py-files artifact, got "
    + sketches_go_spark.__file__
)

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
    "event_type", F.col("value").cast("double").alias("v")
)
out = dd.ddsketch_quantiles_relational(
    ev, "v", ["event_type"], (0.5, 0.99), DDSketchConfig(alpha=0.01)
).orderBy("event_type", "q").collect()
assert len(out) == 10, len(out)
print("SUBMIT_OK rows=%d p50_first=%s" % (len(out), out[0]["est"]))
spark.stop()
"""


def test_spark_submit_py_files(tmp_path):
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "package_pyfiles.py")],
        check=True, capture_output=True, text=True, cwd=REPO,
    ).stdout.strip().splitlines()[-1]
    assert zip_path.endswith(".zip") and os.path.exists(zip_path)

    job = tmp_path / "job.py"
    job.write_text(_JOB)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            str(job),
        ],
        capture_output=True, text=True, timeout=300, env=env, cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "SUBMIT_OK rows=10" in res.stdout, (res.stdout, res.stderr[-1500:])
