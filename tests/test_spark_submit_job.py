"""The cluster entry point must work as a real ``spark-submit --py-files``
job: package zipped, imported from the zip (repo not on PYTHONPATH),
confs on the submit line. This drives tools/linkage_job.py exactly the
way BENCH-SCALING.md is produced.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import scaling_bench  # noqa: E402

pytestmark = pytest.mark.spark


def test_spark_submit_job_runs_from_zip():
    zip_path = scaling_bench.build_zip()
    assert os.path.exists(zip_path)

    result = scaling_bench.run_level_once(cores=2, rows=500)

    assert result["cores"] == 2
    assert result["rows"] == 500
    assert result["encode_seconds"] > 0
    assert result["encode_rows_per_sec"] > 0
    assert result["pipeline_seconds"] > 0
    # run_linkage's stage metrics must ride through the submit boundary
    assert set(result["stage_seconds"]) == {
        "clks_seconds", "blocks_seconds", "pairs_seconds",
        "clusters_seconds"}


def test_zip_contains_full_package():
    import zipfile

    scaling_bench.build_zip()
    with zipfile.ZipFile(scaling_bench.ZIP_PATH) as zf:
        names = set(zf.namelist())
    for required in [
        "clkhash_spark/__init__.py",
        "clkhash_spark/pipeline.py",
        "clkhash_spark/session.py",
        "clkhash_spark/core/vectorized.py",
        "clkhash_spark/operators/encode.py",
        "clkhash_spark/operators/blocking.py",
        "clkhash_spark/operators/scoring.py",
        "clkhash_spark/operators/cluster.py",
        "clkhash_spark/sources/webpages.py",
    ]:
        assert required in names, f"{required} missing from --py-files zip"
    assert not any("__pycache__" in n for n in names)
