#!/usr/bin/env python
"""Frontier-compaction evidence (round 4's X52/compaction claim).

The frontier table accumulates every link ever discovered: without
compaction, round k's selection re-reads and re-dedups the FULL link
history. `compact_frontier` rewrites the table to the pending horizon
(one row per unseen url_hash) after every `compact_every` rounds, so
per-round selection cost tracks the horizon, not crawl history.

This runs the same N-round crawl twice — compact_every=1 vs never —
and records, per round, the frontier rows scanned by selection and the
wall cost of an explicitly-materialized selection (dedup + seen
anti-join + count). Crawl results are identical by construction
(pinned in tests/test_seen_index.py); this script measures the cost
curve only.

Usage: SPARK_GRAFT_CPUS=16 N_SEEDS=200000 ROUNDS=4 python scripts/compaction_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_mode(compact: bool, n_seeds: int, rounds: int, cpus: int) -> dict:
    from oa_spider_spark import datagen
    from oa_spider_spark.frontier.round import (
        COMPACT_ROUND_BASE,
        compact_frontier,
        dedup_frontier,
        run_round,
        seed_catalog,
    )
    from oa_spider_spark.frontier.seen import anti_join_seen
    from oa_spider_spark.session import get_spark
    from oa_spider_spark.tables import Catalog

    spark = get_spark(cores=cpus, app_name=f"compact_{compact}", shuffle_partitions=cpus)
    stage_base = os.environ.get("SPARK_GRAFT_STAGE_DIR", "/dev/shm")
    n_hosts = 50
    out: dict = {"mode": "compact" if compact else "accumulate", "rounds": []}
    with tempfile.TemporaryDirectory(prefix="compact_bench_", dir=stage_base) as root:
        cat = Catalog(root)
        seed_catalog(
            spark, cat,
            datagen.seed_frontier_df(
                spark, n_seeds, n_hosts=n_hosts, hot_share=0.4, partitions=cpus * 2
            ),
        )
        for r in range(rounds):
            frontier = cat.read(spark, "frontier")
            n_frontier = frontier.count()
            t0 = time.perf_counter()
            n_new = anti_join_seen(
                dedup_frontier(frontier), cat.read(spark, "seen"), use_bloom=False
            ).count()
            sel_sec = round(time.perf_counter() - t0, 2)
            run_round(
                spark, cat, r, n_hosts=n_hosts,
                default_budget=max(200, n_seeds // (rounds * n_hosts)),
                partitions=cpus * 2,
            )
            t_c = 0.0
            if compact:
                t0 = time.perf_counter()
                compact_frontier(spark, cat, COMPACT_ROUND_BASE + r)
                t_c = round(time.perf_counter() - t0, 2)
            out["rounds"].append(
                {
                    "round": r,
                    "frontier_rows_scanned": n_frontier,
                    "selection_sec": sel_sec,
                    "compact_sec": t_c,
                    "survivors": n_new,
                }
            )
        cat.cleanup_session(spark)
    spark.stop()
    return out


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    n_seeds = int(os.environ.get("N_SEEDS", "200000"))
    rounds = int(os.environ.get("ROUNDS", "4"))
    results = [run_mode(True, n_seeds, rounds, cpus), run_mode(False, n_seeds, rounds, cpus)]
    comp, acc = results
    last = rounds - 1
    print(json.dumps(results[0]))
    print(json.dumps(results[1]))
    print(
        json.dumps(
            {
                "metric": "frontier rows scanned by selection, last round",
                "compact": comp["rounds"][last]["frontier_rows_scanned"],
                "accumulate": acc["rounds"][last]["frontier_rows_scanned"],
                "scan_ratio": round(
                    acc["rounds"][last]["frontier_rows_scanned"]
                    / max(comp["rounds"][last]["frontier_rows_scanned"], 1),
                    2,
                ),
                "compact_cost_total_sec": round(
                    sum(r["compact_sec"] for r in comp["rounds"]), 2
                ),
                "cpus": cpus,
                "n_seeds": n_seeds,
            }
        )
    )


if __name__ == "__main__":
    main()
