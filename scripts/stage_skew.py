#!/usr/bin/env python
"""Stage-level task-balance evidence for BENCH/BASELINE.md.

Host-noise-free scaling evidence: wall-clock efficiency on a shared VM
confounds the engine with hypervisor steal, but per-stage TASK time
distributions are a property of the plan alone. For every stage of one
crawl round this prints

  * n_tasks, median / p95 / max task ms,
  * skew  = max / median task time  (1.0 = perfectly balanced), and
  * pareff = sum(task_ms) / (max(task_ms) * n_slots) — the fraction of an
    ideal n_slots-wide machine this stage keeps busy; the engine-side
    ceiling on scaling efficiency (a stage with pareff 0.95 cannot be the
    reason a 4N run fails the 0.8 north-rule gate).

Usage: SPARK_GRAFT_CPUS=16 N_SEEDS=400000 python scripts/stage_skew.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    n_seeds = int(os.environ.get("N_SEEDS", "400000"))
    # HOT_SHARE=0.9 = the skew stress case: one host owns 90% of the
    # frontier; salted_repartition must still hold fetch-stage skew ~1
    hot_share = float(os.environ.get("HOT_SHARE", "0.4"))
    evdir = tempfile.mkdtemp(prefix="spark-events-")

    from oa_spider_spark import datagen
    from oa_spider_spark.frontier.round import run_round, seed_catalog
    from oa_spider_spark.session import get_spark
    from oa_spider_spark.tables import Catalog

    spark = get_spark(
        cores=cpus,
        app_name="stage_skew",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
        },
    )
    with tempfile.TemporaryDirectory() as root:
        cat = Catalog(root)
        seed_catalog(
            spark, cat,
            datagen.seed_frontier_df(
                spark, n_seeds, n_hosts=50, hot_share=hot_share, partitions=cpus * 2
            ),
        )
        res = run_round(spark, cat, 0, n_hosts=50, default_budget=n_seeds)
        print(f"round: selected={res.selected} ok={res.fetched_ok}", file=sys.stderr)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # shared parser (also feeds bench.py's per-run stage_pareff metric);
    # only stages with meaningful work (max task >= 250 ms) matter
    from oa_spider_spark.evlog import stage_task_stats

    heavy = stage_task_stats(evdir, app_id, n_slots=cpus, min_task_ms=250)
    print(
        json.dumps(
            {"cpus": cpus, "n_seeds": n_seeds, "hot_share": hot_share, "stages": heavy},
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
