"""Driver contract for the spark-graft builder (PySpark target).

Implementation lives in `oa_spider_spark/`; this module is the thin
driver-facing surface. `queries()` / `oracle_sql()` pairs are registered
in `oa_spider_spark/queries.py` (one entry per implemented operator from
SURVEY.md §2 + the training-pipeline operators); the crawl engine itself
(frontier rounds, Bloom seen-set, Arrow fetch, lineage/resume) is
exercised by `entry()` below and by tests/test_frontier.py.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: run a real 2-round crawl (seed → Bloom-dedup → politeness
    → ordered select → Arrow fetch/decode → link explode → commit) over
    the deterministic synthetic universe, then return the fetched-image
    digest joined with per-round lineage — exercising the whole engine in
    one DataFrame result."""
    from oa_spider_spark import datagen
    from oa_spider_spark.frontier.round import run_crawl, seed_catalog
    from oa_spider_spark.tables import Catalog

    root = tempfile.mkdtemp(prefix="oa_spider_entry_")
    cat = Catalog(root)
    seeds = datagen.seed_frontier_rows(600, n_hosts=12, hot_share=0.4)
    seed_catalog(spark, cat, seeds)
    run_crawl(spark, cat, 2, n_hosts=12, default_budget=40)
    fetched = cat.read(spark, "fetched")
    return (
        fetched.groupBy("round", "host", "status", "fmt")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce(F.length("bytes"), F.lit(0))).alias("payload_bytes"),
            F.min("fetch_order").alias("first_order"),
            F.max("fetch_order").alias("last_order"),
        )
        .orderBy("round", "host", "status", "fmt")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from oa_spider_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from oa_spider_spark.queries import ORACLES

    return dict(ORACLES)
