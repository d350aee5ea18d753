"""Input loader: catalog-table vs parquet-path branches, schema gate."""

import os

import pytest

from clkhash_spark.sources.catalog import (
    INPUT_COLUMNS,
    InputSchemaError,
    load_table,
)
from clkhash_spark.sources.webpages import synthetic_webpages

pytestmark = [pytest.mark.spark]


class TestLoadTable:
    def test_parquet_path_branch(self, spark, tmp_path):
        path = os.path.join(str(tmp_path), "webpages.parquet")
        synthetic_webpages(spark, 50, seed=3).write.parquet(path)
        df = load_table(spark, path, required=INPUT_COLUMNS)
        assert df.count() == 50
        assert set(INPUT_COLUMNS) <= set(df.columns)

    def test_table_name_branch(self, spark):
        # The production branch is spark.read.table(name); in the
        # sandbox the session catalog resolves a temp view the same way
        # an Iceberg identifier resolves on a configured cluster.
        synthetic_webpages(spark, 20, seed=4).createOrReplaceTempView(
            "webpages_catalog_test"
        )
        df = load_table(spark, "webpages_catalog_test")
        assert df.count() == 20

    def test_missing_column_raises_eagerly(self, spark, tmp_path):
        path = os.path.join(str(tmp_path), "narrow.parquet")
        synthetic_webpages(spark, 5, seed=5).select("url").write.parquet(
            path
        )
        with pytest.raises(InputSchemaError, match="text"):
            load_table(spark, path)

    def test_pruning_reaches_scan(self, spark, tmp_path):
        # Selecting (url, text) after the loader must prune the heavy
        # html binary column out of the parquet scan.
        path = os.path.join(str(tmp_path), "wide.parquet")
        synthetic_webpages(spark, 10, seed=6).write.parquet(path)
        df = load_table(spark, path, required=INPUT_COLUMNS).select(
            "url", "text"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "html" not in plan
