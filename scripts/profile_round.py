#!/usr/bin/env python
"""Phase-level timing of one crawl round (bench-shaped) — run with
SPARK_GRAFT_CPUS to compare parallelism levels."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n_seeds = int(os.environ.get("N_SEEDS", "50000"))
    from oa_spider_spark import datagen
    from oa_spider_spark.frontier.politeness import (
        budget_and_order, robots_allowed, salted_repartition,
    )
    from oa_spider_spark.frontier.round import dedup_frontier, seed_catalog
    from oa_spider_spark.frontier.seen import anti_join_seen
    from oa_spider_spark.frontier.fetch import fetch_stage
    from oa_spider_spark.session import get_spark
    from oa_spider_spark.tables import Catalog

    spark = get_spark(cores=cpus, app_name=f"prof_{cpus}", shuffle_partitions=cpus)
    n_hosts = 24
    t = {}

    stage_base = os.environ.get(
        "SPARK_GRAFT_STAGE_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    with tempfile.TemporaryDirectory(prefix="prof_cat_", dir=stage_base) as root:
        cat = Catalog(root)
        t0 = time.perf_counter()
        seed_catalog(spark, cat, datagen.seed_frontier_df(
            spark, n_seeds, n_hosts=n_hosts, hot_share=0.4, partitions=cpus * 2))
        t["seed_catalog"] = time.perf_counter() - t0

        # warm python workers
        t0 = time.perf_counter()
        spark.range(0, cpus * 4, 1, cpus * 2).mapInPandas(
            lambda it: it, schema="id long").count()
        t["warmup"] = time.perf_counter() - t0

        frontier = cat.read(spark, "frontier")
        budget = max(200, n_seeds // n_hosts)

        t0 = time.perf_counter()
        active = dedup_frontier(frontier).filter(F.col("depth") <= 2)
        active = anti_join_seen(active, None)
        active = robots_allowed(active, None)
        n_budget = active.count()
        t["selection_to_budget"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        selected = budget_and_order(active, budget).drop("budget_per_round")
        n_sel = selected.count()
        t["global_order"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        fetch_in = salted_repartition(selected, cpus * 2)
        fetched = fetch_stage(fetch_in, n_hosts=n_hosts).withColumn(
            "partition_id", F.spark_partition_id()
        ).withColumn("round", F.lit(0))
        staged_path = cat.stage(fetched, "fetched", 0)
        t["fetch_and_stage"] = time.perf_counter() - t0

        staged = spark.read.parquet(staged_path)
        t0 = time.perf_counter()
        from oa_spider_spark.frontier.round import links_to_frontier
        nf = links_to_frontier(staged.select("status", "links", "depth"), 0)
        n_links = nf.count()
        t["links_count"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        cat.stage(nf, "frontier", 0)
        t["stage_new_frontier"] = time.perf_counter() - t0

    print(f"cpus={cpus} n_seeds={n_seeds} budget_rows={n_budget} selected={n_sel} links={n_links}")
    for k, v in t.items():
        print(f"  {k:22s} {v:7.2f}s")
    print(f"  TOTAL(timed)          {sum(v for k, v in t.items() if k not in ('seed_catalog','warmup')):7.2f}s")


if __name__ == "__main__":
    main()
