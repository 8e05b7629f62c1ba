"""Spark event-log → per-stage task-balance stats (pareff/skew).

Host-noise-free scaling evidence: wall-clock efficiency on a shared VM
confounds the engine with hypervisor steal, but per-stage TASK time
distributions are a property of the plan alone. For each stage:

* skew   = max / median task ms (1.0 = perfectly balanced);
* pareff = sum(task_ms) / (max(task_ms) × n_slots) — the fraction of an
  ideal n_slots-wide machine the stage keeps busy; the ENGINE-side
  ceiling on scaling efficiency. A stage with pareff 0.95 cannot be the
  reason an N→4N run fails the 0.8 north-rule gate — only host
  co-tenancy can (see BENCH/BASELINE.md).

Used by bench.py (stage_pareff in every BENCH JSON, VERDICT r03 item 2)
and scripts/stage_skew.py.
"""

from __future__ import annotations

import json
import os
import statistics


def event_log_paths(evdir: str, app_id: str) -> list[str]:
    """Spark 3.x writes one flat file per app; Spark 4 a rolling
    directory of events_* files."""
    flat = os.path.join(evdir, app_id)
    if os.path.exists(flat):
        return [flat]
    d = os.path.join(evdir, f"eventlog_v2_{app_id}")
    return sorted(
        os.path.join(d, p) for p in os.listdir(d) if p.startswith("events_")
    )


def stage_task_stats(
    evdir: str,
    app_id: str,
    n_slots: int,
    t_min_ms: float | None = None,
    t_max_ms: float | None = None,
    min_task_ms: int = 250,
) -> list[dict]:
    """Per-stage task stats, optionally restricted to tasks LAUNCHED in
    [t_min_ms, t_max_ms] (epoch ms — scope to one workload inside a
    longer session). Only stages whose max task ≥ min_task_ms are
    returned (short stages are irrelevant to scaling)."""
    stages: dict[int, dict] = {}
    for path in event_log_paths(evdir, app_id):
        with open(path) as f:
            for line in f:
                ev = json.loads(line)
                kind = ev.get("Event")
                if kind == "SparkListenerTaskEnd":
                    ti = ev["Task Info"]
                    if t_min_ms is not None and ti["Launch Time"] < t_min_ms:
                        continue
                    if t_max_ms is not None and ti["Launch Time"] > t_max_ms:
                        continue
                    sid = ev["Stage ID"]
                    ms = ti["Finish Time"] - ti["Launch Time"]
                    stages.setdefault(sid, {"tasks": []})["tasks"].append(ms)
                elif kind == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages.setdefault(si["Stage ID"], {"tasks": []})["name"] = si[
                        "Stage Name"
                    ]

    rows = []
    for sid in sorted(stages):
        t = stages[sid].get("tasks") or []
        if not t:
            continue
        med = statistics.median(t)
        mx = max(t)
        if mx < min_task_ms:
            continue
        p95 = sorted(t)[max(0, int(len(t) * 0.95) - 1)]
        slots = min(n_slots, len(t))
        pareff = sum(t) / (mx * slots) if mx else 1.0
        rows.append(
            dict(
                stage=sid,
                name=stages[sid].get("name", "?")[:60],
                n_tasks=len(t),
                med_ms=round(med),
                p95_ms=round(p95),
                max_ms=round(mx),
                sum_ms=round(sum(t)),
                skew=round(mx / med, 2) if med else None,
                pareff=round(min(pareff, 1.0), 3),
            )
        )
    return rows


def dominant_stage(rows: list[dict]) -> dict | None:
    """The stage carrying the most total task time — the one whose
    pareff bounds the workload's scalability."""
    if not rows:
        return None
    return max(rows, key=lambda r: r["sum_ms"])
