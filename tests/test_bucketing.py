"""Bucketed co-located join: zero Exchange in the plan, identical rows."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from geotiff_spark.plans.bucketing import (
        bucketed_join, plan_has_exchange, write_bucketed,
    )

    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped below
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    write_bucketed(li, "li_b", "l_orderkey", 8)
    write_bucketed(o, "o_b", "l_orderkey", 8)

    joined = bucketed_join(spark, "li_b", "o_b", "l_orderkey")
    # disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "li_b", "o_b", "l_orderkey")
        assert not plan_has_exchange(joined)
        want = li.join(o, "l_orderkey").count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "67108864")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")
