"""The north-rule launch surface, driven for real: spark-submit
--py-files engine.zip jobs/extract.py in a fresh JVM/interpreter.

This is not redundant with test_cli_main_smoke (in-process): the real
path loads the package FROM THE ZIP (py-files precedes the repo on
sys.path) and re-ships it via _ship_package — which is exactly where a
fixed-name addPyFile collided with the --py-files archive until round 3.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

pytestmark = pytest.mark.spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(submit):
        pytest.skip("no spark-submit binary on this host")

    from htmlcleanup_spark.sources.pages import synth_pages

    src = str(tmp_path / "pages")
    synth_pages(spark, 20, num_partitions=1, dup_every=0).write.parquet(src)

    subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "package.sh")],
        cwd=REPO, check=True, capture_output=True,
    )
    out = str(tmp_path / "out")
    proc = subprocess.run(
        [
            submit, "--master", "local[2]",
            "--py-files", os.path.join(REPO, "dist", "engine.zip"),
            os.path.join(REPO, "jobs", "extract.py"),
            "--source", src, "--output-path", out, "--partitions", "4",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = spark.read.parquet(out + "/data")
    assert got.count() == 20
    assert got.filter("error is not null").count() == 0
