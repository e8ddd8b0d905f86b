"""Pages-scan source selection (SURVEY.md §7 hard part 7): the Iceberg
branch must be chosen exactly when the runtime is on the classpath, the
parquet fallback must preserve schema + rows, and a forced-iceberg read
without the runtime must FAIL (never silently degrade)."""

from __future__ import annotations

import pytest

from geotiff_spark.sources.pages import (
    PAGES_SCHEMA,
    iceberg_available,
    load_pages,
    synth_pages,
)


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages") / "pages")
    synth_pages(spark, 500, partitions=2).write.parquet(d)
    return d


def test_auto_selection_parquet_dir_never_hijacked(spark, pages_dir):
    # a plain parquet directory must go to the parquet branch regardless
    # of whether the Iceberg runtime is on the classpath
    df = load_pages(spark, pages_dir)
    assert [f.name for f in df.schema.fields] == [
        f.name for f in PAGES_SCHEMA.fields
    ]
    assert df.count() == 500


def test_iceberg_table_detection_heuristic(tmp_path):
    from geotiff_spark.sources.pages import _looks_like_iceberg_table

    # catalog identifier (not a filesystem path)
    assert _looks_like_iceberg_table("warehouse.pages")
    # path-based iceberg layout
    t = tmp_path / "tbl"
    (t / "metadata").mkdir(parents=True)
    assert _looks_like_iceberg_table(str(t))
    # plain parquet dir
    p = tmp_path / "plain"
    p.mkdir()
    assert not _looks_like_iceberg_table(str(p))


def test_parquet_branch_schema_parity(spark, pages_dir):
    forced = load_pages(spark, pages_dir, source="parquet")
    direct = spark.read.parquet(pages_dir)
    assert forced.schema == direct.schema
    assert forced.count() == direct.count()


def test_forced_iceberg_without_runtime_fails_loudly(spark, pages_dir):
    if iceberg_available(spark):
        pytest.skip("iceberg runtime present in this environment")
    with pytest.raises(Exception):
        load_pages(spark, pages_dir, source="iceberg").count()


def test_unknown_source_rejected(spark, pages_dir):
    with pytest.raises(ValueError, match="unknown pages source"):
        load_pages(spark, pages_dir, source="orc")
