"""Iceberg Catalog-contract binding (SURVEY.md §1.2).

The sandbox ships no Iceberg runtime jar, so the end-to-end contract
test SKIPS here and runs wherever the jar is present (it needs a Spark
session built with an Iceberg catalog configured — see the module
docstring of `oa_spider_spark/iceberg.py`). What CAN run everywhere is
pinned unconditionally: availability detection and the explicit
fail-loud constructor guard."""

import pytest

from oa_spider_spark.iceberg import IcebergCatalog, iceberg_available


def test_iceberg_absent_is_detected_and_fails_loud(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg jar IS present — covered by the contract test")
    with pytest.raises(RuntimeError, match="tables.Catalog"):
        IcebergCatalog(spark, "local")


def test_iceberg_catalog_contract(spark, tmp_path):
    """Same assertions the parquet Catalog passes: invisible staging,
    atomic round publish, duplicate-round rejection, time travel."""
    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar in this environment")
    if "org.apache.iceberg.spark.SparkCatalog" not in (
        spark.conf.get("spark.sql.catalog.local", "")
    ):
        pytest.skip("Iceberg jar present but no 'local' catalog configured")

    cat = IcebergCatalog(spark, "local", namespace="t_contract")
    df1 = spark.range(5).withColumnRenamed("id", "url_hash")
    df2 = spark.range(5, 8).withColumnRenamed("id", "url_hash")

    snap1 = cat.stage(df1, "frontier", 0)
    assert cat.read(spark, "frontier") is None  # staged ⇒ invisible
    cat.commit_round(0, {"frontier": [snap1]})
    assert cat.committed_rounds() == [0]
    assert cat.read(spark, "frontier").count() == 5

    with pytest.raises(ValueError, match="already committed"):
        cat.commit_round(0, {"frontier": [snap1]})

    snap2 = cat.stage(df2, "frontier", 1)
    cat.commit_round(1, {"frontier": [snap2]})
    assert cat.read(spark, "frontier").count() == 8
    assert cat.read(spark, "frontier", as_of_round=0).count() == 5  # time travel
    assert cat.last_round() == 1
