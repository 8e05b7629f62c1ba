#!/usr/bin/env python
"""Seen-set scale evidence (VERDICT r03 item 1 'done' criterion).

Pre-seeds a catalog with a SEEN_N-row synthetic seen corpus (default
2×10^7 — above BLOOM_MIN_SEEN so the sharded probe engages on its own),
then runs 3 consecutive crawl rounds and records the SELECT phase cost
per round in two configurations:

* legacy  — plain parquet layout, Bloom shards REBUILT from the full
            seen table every round (r03 behavior): per-round cost grows
            with corpus lifetime (full scan + Python re-hash of every
            URL ever seen, plus an unbucketed exact-join reshuffle).
* scale   — bucketed seen/frontier (CLUSTERED BY url_hash) + the
            persisted incremental Bloom index: per-round cost is
            O(round delta) hash work + an exchange-free confirm join.

Output: one JSON line per mode + a summary block appended to
BENCH/BASELINE.md by hand (see README). Flatness check: round 3 select
must not exceed round 1 select by more than the noise band; the
legacy-vs-scale ratio is the headline.

Usage: SEEN_N=20000000 SPARK_GRAFT_CPUS=16 python scripts/seen_scale_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_seen(spark, n: int):
    """Synthetic already-seen corpus: hashes disjoint from real URL
    hashes by construction (different preimage universe), so every
    frontier URL is genuinely new — the probe exercises the
    definitely-new fast path plus Bloom false positives, exactly the
    steady-state recrawl shape."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.xxhash64(F.concat(F.lit("synth:"), F.col("id"))).alias("url_hash"),
        F.concat(F.lit("https://synth.example/x/"), F.col("id")).alias("url_canon"),
        F.lit("ok").alias("status"),
        F.lit(-1).alias("round_seen"),
    )


def run_mode(mode: str, seen_n: int, n_seeds: int, cpus: int, stage_base: str) -> dict:
    from oa_spider_spark import datagen
    from oa_spider_spark.frontier.round import run_round
    from oa_spider_spark.frontier.seen import update_bloom_index
    from oa_spider_spark.session import get_spark
    from oa_spider_spark.tables import SCALE_LAYOUT, Catalog

    spark = get_spark(
        cores=cpus, app_name=f"seen_scale_{mode}", shuffle_partitions=32
    )
    n_hosts = 24
    out: dict = {"mode": mode, "seen_n": seen_n, "n_seeds": n_seeds, "cpus": cpus}
    with tempfile.TemporaryDirectory(prefix=f"seen_scale_{mode}_", dir=stage_base) as root:
        cat = Catalog(root, bucketed=SCALE_LAYOUT if mode == "scale" else None)
        # genesis commit: frontier seeds + the big synthetic seen corpus
        t0 = time.perf_counter()
        seeds = datagen.seed_frontier_df(
            spark, n_seeds, n_hosts=n_hosts, hot_share=0.4, partitions=cpus * 2
        )
        staged = {
            "frontier": [cat.stage(seeds, "frontier", 0)],
            "seen": [cat.stage(synth_seen(spark, seen_n), "seen", 0)],
        }
        if mode == "scale":
            # initial index build: the one full-corpus pass (amortized —
            # every later round ORs only its delta)
            t_idx = time.perf_counter()
            staged.update(
                update_bloom_index(spark, cat, -1, staged["seen"], delta_count=seen_n)
            )
            out["initial_index_build_sec"] = round(time.perf_counter() - t_idx, 2)
        cat.commit_round(-1, staged)
        out["genesis_sec"] = round(time.perf_counter() - t0, 2)

        selects, rebuilds, totals = [], [], []
        for r in range(3):
            phases: dict = {}
            t0 = time.perf_counter()
            run_round(
                spark, cat, r,
                n_hosts=n_hosts,
                default_budget=max(200, n_seeds // (3 * n_hosts)),
                partitions=cpus * 2,
                # legacy = r03 behavior: no persisted index, probe built
                # from the full table each round
                maintain_bloom=(mode == "scale"),
                use_bloom=True,
                timings=phases,
            )
            totals.append(round(time.perf_counter() - t0, 2))
            selects.append(phases.get("select"))
            rebuilds.append(phases.get("derived_stage"))
        out["select_sec_per_round"] = selects
        out["derived_sec_per_round"] = rebuilds
        out["round_total_sec"] = totals
        cat.cleanup_session(spark)
    spark.stop()
    return out


def main() -> None:
    seen_n = int(os.environ.get("SEEN_N", 20_000_000))
    n_seeds = int(os.environ.get("N_SEEDS", 300_000))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 16))
    stage_base = os.environ.get(
        "SPARK_GRAFT_STAGE_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    results = []
    # separate processes are NOT needed here (same parallelism both
    # modes), but run scale first so the legacy numbers cannot benefit
    # from page-cache warming of the synthetic corpus
    for mode in ("scale", "legacy"):
        res = run_mode(mode, seen_n, n_seeds, cpus, stage_base)
        print(json.dumps(res), flush=True)
        results.append(res)
    scale, legacy = results
    summary = {
        "metric": "per-round SELECT seconds at a pre-seeded seen corpus",
        "seen_n": seen_n,
        "scale_select": scale["select_sec_per_round"],
        "legacy_select": legacy["select_sec_per_round"],
        "speedup_round_avg": round(
            sum(legacy["select_sec_per_round"]) / max(sum(scale["select_sec_per_round"]), 1e-9), 2
        ),
        "scale_flat": round(
            scale["select_sec_per_round"][-1] / max(scale["select_sec_per_round"][0], 1e-9), 2
        ),
        "initial_index_build_sec": scale.get("initial_index_build_sec"),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
