"""North-rule packaging drill: the pipeline job must ship via
`spark-submit --py-files geotiff_spark.zip scripts/run_pipeline.py` and
produce its manifest-committed partitioned output."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_py_files_pipeline(spark, tmp_path):
    from geotiff_spark.sources.pages import synth_pages

    pages_dir = str(tmp_path / "pages")
    synth_pages(spark, 2000, partitions=2).write.parquet(pages_dir)

    zip_path = tmp_path / "geotiff_spark.zip"
    pkg = os.path.join(REPO, "geotiff_spark")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    out_dir = str(tmp_path / "geo_hits")
    metrics_dir = str(tmp_path / "metrics")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4",
               SPARK_GRAFT_DRIVER_MEM="4g")
    proc = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[4]",
            "--py-files", str(zip_path),
            os.path.join(REPO, "scripts", "run_pipeline.py"),
            "--pages", pages_dir, "--out", out_dir,
            "--metrics", metrics_dir, "--target-rows", "200",
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = [
        json.loads(line) for line in proc.stdout.splitlines()
        if line.startswith("{")
    ][-1]
    assert summary["written_buckets"] > 0
    assert os.path.exists(os.path.join(out_dir, "_manifest"))
    hits = spark.read.parquet(out_dir)
    assert hits.count() > 0
    assert {"url", "poly_id", "cell_prefix"} <= set(hits.columns)
