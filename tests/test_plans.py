"""M3 scale-feature tests: salting equivalence, adaptive partitioning,
lineage metrics, checkpoint resume (kill-and-rerun identical output)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    from geotiff_spark.plans.salting import salted_join

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    p = spark.read.parquet(f"{SF}/part.parquet").withColumnRenamed(
        "p_partkey", "l_partkey"
    )
    plain = li.join(p, "l_partkey").select("l_orderkey", "l_linenumber", "p_brand")
    salted = salted_join(
        li, p, "l_partkey", n_salt=5, hot=[1, 5, 7], salt_source="l_orderkey"
    ).select("l_orderkey", "l_linenumber", "p_brand")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_hot_keys_detects_skew(spark):
    from geotiff_spark.plans.salting import hot_keys

    rows = [(1, "hot")] * 1000 + [(i, "cold") for i in range(2, 50)]
    df = spark.createDataFrame(rows, ["k", "v"])
    hk = hot_keys(df, "k")
    assert hk == [1]


def test_adaptive_prefix_balances_hot_cells(spark):
    from geotiff_spark.operators.extract import with_cell_token
    from geotiff_spark.plans.partitioning import (
        adaptive_prefix_column, choose_prefix_depth,
    )
    from geotiff_spark.sources.pages import synth_pages
    from geotiff_spark.operators.extract import with_geotag

    pages = with_geotag(synth_pages(spark, 4000, partitions=4)).filter(
        F.col("lat").isNotNull()
    )
    tok = with_cell_token(pages, res=10)
    depth = choose_prefix_depth(tok, "cell_token", target_rows=800)
    assert 1 <= depth <= 10
    pref = adaptive_prefix_column(tok, "cell_token", target_rows=200)
    hist = pref.groupBy("cell_prefix").count().collect()
    lens = {len(r["cell_prefix"]) for r in hist}
    assert len(lens) >= 2  # hot prefixes went deeper than cold ones
    # prefix property: every prefix is a prefix of its rows' tokens
    bad = pref.filter(
        ~F.col("cell_token").startswith(F.col("cell_prefix"))
    ).count()
    assert bad == 0


def test_deep_histogram_driver_pull_is_bounded(spark):
    """A dense synthetic grid (every max-depth prefix distinct) must NOT
    reach the driver at full depth: measured_depth coarsens until the
    distinct-prefix count fits the budget, so the collected histogram is
    bounded no matter the cell occupancy (VERDICT r05 #3)."""
    from geotiff_spark.plans.partitioning import (
        choose_prefix_depth, deep_histogram, measured_depth,
    )

    # 4^8 = 65536 distinct depth-8 tokens — dense at every depth
    df = spark.range(4 ** 8).select(
        F.lpad(F.conv(F.col("id").cast("string"), 10, 4), 8, "0")
        .alias("cell_token")
    )
    budget = 1000
    d = measured_depth(df, "cell_token", max_depth=8, driver_budget=budget)
    assert d == 4  # 4^4 = 256 <= 850 < 4^5
    hist = deep_histogram(df, "cell_token", max_depth=8,
                          driver_budget=budget)
    assert len(hist) <= budget
    assert hist["n"].sum() == 4 ** 8
    # the depth chooser still works on the coarsened histogram
    assert choose_prefix_depth(hist, target_rows=4 ** 5) >= 3


def test_lineage_metrics_row_counts(spark, tmp_path):
    from geotiff_spark.plans.lineage import StageMetrics

    m = StageMetrics(spark)
    df = spark.range(0, 1000, numPartitions=4).toDF("id")
    out = m.instrument(df, "scan")
    assert out.count() == 1000
    snap = m.snapshot()
    assert sum(r["rows"] for r in snap if r["stage"] == "scan") == 1000
    assert len({r["partition_id"] for r in snap}) == 4
    m.flush(str(tmp_path / "metrics"))
    files = os.listdir(tmp_path / "metrics")
    assert any(f.startswith("metrics_") for f in files)


def test_checkpoint_resume_kill_and_rerun(spark, tmp_path):
    """Kill mid-write, rerun, output identical to uninterrupted write and
    completed buckets skipped."""
    from geotiff_spark.plans.checkpoint import (
        completed_buckets, resumable_write,
    )

    df = (
        spark.range(0, 2000)
        .withColumn("bucket", F.pmod(F.col("id"), F.lit(10)).cast("string"))
        .withColumn("payload", F.col("id") * 7)
    )
    out1 = str(tmp_path / "direct")
    df.write.partitionBy("bucket").parquet(out1)

    out2 = str(tmp_path / "resumed")
    with pytest.raises(RuntimeError, match="simulated kill"):
        resumable_write(df, out2, "bucket", batch_size=3, fail_after=2)
    done_after_kill = completed_buckets(out2)
    assert 0 < len(done_after_kill) < 10

    stats = resumable_write(df, out2, "bucket", batch_size=3)
    assert set(stats["skipped"]) == done_after_kill
    assert set(stats["written"]) | done_after_kill == {
        str(i) for i in range(10)
    }

    a = spark.read.parquet(out1).select("id", "payload", "bucket")
    b = spark.read.parquet(out2).select("id", "payload", "bucket")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_knn_large_query_set_stays_distributed(spark):
    """100k+ queries run through the same plan — queries are never
    collected to the driver, settlement is a window flag + anti-join."""
    import numpy as np

    from geotiff_spark.operators.knn import knn_join

    n = 120_000
    pts = (
        spark.range(n)
        .withColumn(
            "lat",
            F.lit(36.0) + ((F.col("id") * 2654435761) % 220000) / F.lit(10000.0),
        )
        .withColumn(
            "lon",
            F.lit(-10.0) + ((F.col("id") * 40503 + 7) % 400000) / F.lit(10000.0),
        )
        .withColumnRenamed("id", "doc_id")
    )
    out = knn_join(spark, pts, pts, k=3, res=10, max_rounds=4)
    got = out.groupBy("qid").agg(F.count(F.lit(1)).alias("n"))
    assert got.filter(F.col("n") != 3).count() == 0
    assert got.count() == n

    # spot-check 5 queries against local brute force
    local = pts.collect()
    ids = np.array([r.doc_id for r in local])
    la = np.array([r.lat for r in local])
    lo = np.array([r.lon for r in local])
    sample = out.filter(F.col("qid").isin([0, 31337, 64001, 99999, 119998]))
    by_q: dict[int, list[int]] = {}
    for r in sorted(sample.collect(), key=lambda r: (r.qid, r.rank)):
        by_q.setdefault(r.qid, []).append(r.nn_id)
    for qid, mine in by_q.items():
        d = np.sqrt((la - la[qid]) ** 2 + (lo - lo[qid]) ** 2)
        mask = ids != qid
        want = [int(i) for _d, i in sorted(zip(d[mask], ids[mask]))[:3]]
        assert mine == want, (qid, mine, want)


def test_knn_matches_bruteforce(spark):
    from geotiff_spark.operators.knn import knn_join
    from geotiff_spark.pipeline import geo_documents

    docs = geo_documents(spark, SF)
    queries = docs.filter(F.col("doc_id") < 5)
    got = knn_join(spark, docs, queries, k=3, res=7).collect()

    pts = docs.select("doc_id", "lat", "lon").collect()
    import numpy as np

    ids = np.array([r.doc_id for r in pts])
    lat = np.array([r.lat for r in pts])
    lon = np.array([r.lon for r in pts])
    for q in [r for r in pts if r.doc_id < 5]:
        d = np.sqrt((lat - q.lat) ** 2 + (lon - q.lon) ** 2)
        mask = ids != q.doc_id
        order = sorted(zip(d[mask], ids[mask]))[:3]
        want = [int(i) for _d, i in order]
        mine = [r.nn_id for r in sorted(got, key=lambda r: r.rank)
                if r.qid == q.doc_id]
        assert mine == want, (q.doc_id, mine, want)
