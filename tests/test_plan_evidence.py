"""Physical-plan regression tests: the properties PLANS.md documents
must survive refactors — filters pushed to the parquet scan, columns
pruned, dimensions broadcast, no cartesian products.

Assertions are deliberately loose (substring checks on the formatted
plan), so Catalyst version drift doesn't break them spuriously."""

import os

import pytest

from clkhash_spark.entry_queries import (
    q_clk_encode,
    q_doc_minhash_pairs,
    q_local_supplier_revenue,
)

SF = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")

pytestmark = [
    pytest.mark.spark,
    pytest.mark.skipif(
        not os.path.isdir(SF), reason="driver testdata not available"
    ),
]


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


class TestPlanEvidence:
    def test_q5_pushdown_and_broadcasts(self, spark):
        plan = plan_of(q_local_supplier_revenue(spark, SF))
        # date filter reaches the orders parquet scan
        assert "PushedFilters" in plan
        assert plan.count("BroadcastHashJoin") >= 4  # all true dims
        assert "CartesianProduct" not in plan
        # lineitem scan prunes to the needed columns only
        li_schema = [
            ln for ln in plan.splitlines()
            if "ReadSchema" in ln and "l_orderkey" in ln
        ]
        assert li_schema and "l_returnflag" not in li_schema[0]

    def test_encode_prunes_before_python(self, spark):
        plan = plan_of(q_clk_encode(spark, SF))
        # the documents table carries more columns than (doc_id, text);
        # only those two may reach the scan feeding MapInPandas
        read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert read and "doc_id" in read[0] and "text" in read[0]
        assert all("html" not in ln for ln in read)
        assert "MapInPandas" in plan

    def test_minhash_pairs_no_cartesian(self, spark):
        plan = plan_of(q_doc_minhash_pairs(spark, SF))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
