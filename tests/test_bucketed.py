"""Bucketed co-located joins: same-key same-count buckets join with NO
exchange on either side (the property that saves the repeated big-table
shuffle at 100 TB)."""

from __future__ import annotations

import pytest

from delm_spark.io.bucketed import colocated_join, read_bucketed, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    a = spark.range(10_000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(5_000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, "bktest.ta", "k", n_buckets=8, sort_col="k",
                   path=str(tmp_path / "ta"))
    write_bucketed(b, "bktest.tb", "k", n_buckets=8, sort_col="k",
                   path=str(tmp_path / "tb"))
    yield "bktest.ta", "bktest.tb"
    spark.sql("DROP TABLE IF EXISTS bktest.ta")
    spark.sql("DROP TABLE IF EXISTS bktest.tb")


def test_colocated_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    # force the join strategy that would otherwise shuffle both sides
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, ta, tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_skips_shuffle(spark, bucketed_pair):
    """Aggregation on the bucket key reuses the disk partitioning too."""
    ta, _ = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = read_bucketed(spark, ta).groupBy("k").count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
