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
import statistics
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    n_seeds = int(os.environ.get("N_SEEDS", "400000"))
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
        seed_catalog(spark, cat, datagen.seed_frontier_rows(n_seeds, n_hosts=50))
        res = run_round(spark, cat, 0, n_hosts=50, default_budget=n_seeds)
        print(f"round: selected={res.selected} ok={res.fetched_ok}", file=sys.stderr)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # one JSON event per line; tasks grouped by stage. Spark 4 writes a
    # v2 rolling directory (events_*_<appid> files) — a flat file on 3.x.
    flat = os.path.join(evdir, app_id)
    if os.path.exists(flat):
        paths = [flat]
    else:
        d = os.path.join(evdir, f"eventlog_v2_{app_id}")
        paths = sorted(
            os.path.join(d, p) for p in os.listdir(d) if p.startswith("events_")
        )
    stages: dict[int, dict] = {}
    for path in paths:
        with open(path) as f:
            for line in f:
                ev = json.loads(line)
                if ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    ti = ev["Task Info"]
                    ms = ti["Finish Time"] - ti["Launch Time"]
                    stages.setdefault(sid, {"tasks": []})["tasks"].append(ms)
                elif ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages.setdefault(si["Stage ID"], {"tasks": []})["name"] = si["Stage Name"]

    rows = []
    for sid in sorted(stages):
        t = stages[sid].get("tasks") or []
        if not t:
            continue
        med = statistics.median(t)
        mx = max(t)
        p95 = sorted(t)[max(0, int(len(t) * 0.95) - 1)]
        slots = min(cpus, len(t))
        pareff = sum(t) / (mx * slots) if mx else 1.0
        rows.append(
            dict(
                stage=sid,
                name=stages[sid].get("name", "?")[:60],
                n_tasks=len(t),
                med_ms=round(med),
                p95_ms=round(p95),
                max_ms=round(mx),
                skew=round(mx / med, 2) if med else None,
                pareff=round(min(pareff, 1.0), 3),
            )
        )
    # only stages with meaningful work (max task >= 250 ms) matter for scaling
    heavy = [r for r in rows if r["max_ms"] >= 250]
    print(json.dumps({"cpus": cpus, "n_seeds": n_seeds, "stages": heavy}, indent=1))


if __name__ == "__main__":
    main()
