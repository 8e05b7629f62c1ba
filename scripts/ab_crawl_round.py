#!/usr/bin/env python
"""Same-window A/B attribution of the r04 crawl_round bench regression
(VERDICT r04 item 1): 34.3 s (r03) → 59.5 s (r04) at sf0.1.

Three arms, identical input (1.6M seeds, 24 hosts, hot_share 0.4),
interleaved within ONE measurement window so host drift hits every arm
equally (CLAUDE.md: identical runs swing up to 2× across windows — only
an interleaved comparison attributes anything):

  r3     — the round-3 build's run_round (git worktree at the r03 commit;
           no persisted Bloom index existed yet)
  auto   — current build, maintain_bloom="auto" (the new default: index
           maintenance skipped below the SEEN_INDEX_MIN breakeven)
  bloom  — current build, maintain_bloom=True (the r04 unconditional
           behavior the regression was measured on)

Each rep runs in a fresh process (Spark local mode pins cores at JVM
start). Wall seconds + engine phase splits per arm; medians attribute
the regression into maintenance cost (bloom − auto) vs host/residual
(auto − r3, same code path by construction).

Usage: [AB_REPS=3] [AB_CPUS=16] [AB_SEEDS=1600000] python scripts/ab_crawl_round.py
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R3_COMMIT = "d54d48e"  # "round 3: verdict/advice/correctness/bench"

CHILD = r"""
import inspect, json, os, sys, tempfile, time
from oa_spider_spark.session import get_spark
from oa_spider_spark import datagen
from oa_spider_spark.frontier.round import run_round, seed_catalog
from oa_spider_spark.tables import Catalog

cpus = int(os.environ["AB_CPUS"])
n_seeds = int(os.environ["AB_SEEDS"])
arm = os.environ["AB_ARM"]
n_hosts = 24
spark = get_spark(
    cores=cpus, app_name=f"ab_{arm}", shuffle_partitions=cpus,
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
stage_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
kw = {}
if "maintain_bloom" in inspect.signature(run_round).parameters:
    kw["maintain_bloom"] = {"on": True, "auto": "auto", "off": False}[
        os.environ.get("AB_BLOOM", "auto")
    ]
# warm round: worker startup + codegen, exactly like bench.py
with tempfile.TemporaryDirectory(prefix="ab_warm_", dir=stage_base) as root:
    cat = Catalog(root)
    seed_catalog(spark, cat, datagen.seed_frontier_df(
        spark, 4000, n_hosts=n_hosts, hot_share=0.4, partitions=cpus * 2))
    run_round(spark, cat, 0, n_hosts=n_hosts,
              default_budget=4000 // n_hosts, partitions=cpus * 2, **kw)
with tempfile.TemporaryDirectory(prefix="ab_cat_", dir=stage_base) as root:
    cat = Catalog(root)
    seed_catalog(spark, cat, datagen.seed_frontier_df(
        spark, n_seeds, n_hosts=n_hosts, hot_share=0.4, partitions=cpus * 2))
    phases = {}
    t0 = time.perf_counter()
    res = run_round(
        spark, cat, 0, n_hosts=n_hosts,
        default_budget=max(200, n_seeds // n_hosts),
        partitions=cpus * 2, timings=phases, **kw)
    sec = time.perf_counter() - t0
sys.stdout.write("\nABRESULT " + json.dumps({
    "arm": arm, "sec": round(sec, 3), "phases": phases,
    "selected": res.selected, "ok": res.fetched_ok,
}) + "\n")
sys.stdout.flush()
"""


def ensure_r3_worktree() -> str:
    path = os.path.join(REPO, ".ab_r3_worktree")
    if not os.path.isdir(os.path.join(path, "oa_spider_spark")):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, R3_COMMIT],
            cwd=REPO, check=True,
        )
    return path


def run_arm(arm: str, tree: str, bloom: str, cpus: int, seeds: int) -> dict:
    env = dict(
        os.environ, AB_ARM=arm, AB_BLOOM=bloom,
        AB_CPUS=str(cpus), AB_SEEDS=str(seeds), PYTHONPATH=tree,
    )
    out = subprocess.run(
        [sys.executable, "-c", CHILD], env=env, cwd=tree,
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
    raise RuntimeError(f"arm {arm}: no ABRESULT line")


def main() -> None:
    reps = int(os.environ.get("AB_REPS", 3))
    cpus = int(os.environ.get("AB_CPUS", 16))
    seeds = int(os.environ.get("AB_SEEDS", 1_600_000))
    r3_tree = ensure_r3_worktree()
    arms = [
        ("r3", r3_tree, "auto"),
        ("auto", REPO, "auto"),
        ("bloom", REPO, "on"),
    ]
    sys.path.insert(0, REPO)
    from oa_spider_spark.hostcap import capacity_probe

    results: dict[str, list[dict]] = {a: [] for a, _, _ in arms}
    probes = [capacity_probe(cpus)]
    for rep in range(reps):
        for arm, tree, bloom in arms:  # interleaved: every rep hits all arms
            r = run_arm(arm, tree, bloom, cpus, seeds)
            results[arm].append(r)
            print(f"rep{rep} {arm:>5}: {r['sec']:7.2f}s phases={r['phases']}",
                  flush=True)
        probes.append(capacity_probe(cpus))
    summary = {}
    for arm, rs in results.items():
        med = statistics.median(r["sec"] for r in rs)
        phases = {
            k: round(statistics.median(r["phases"][k] for r in rs), 3)
            for k in rs[0]["phases"]
        }
        summary[arm] = {"median_sec": round(med, 3), "phases": phases,
                        "runs": [r["sec"] for r in rs]}
    out = {
        "cpus": cpus, "seeds": seeds, "reps": reps,
        "arms": summary, "capacity_probes": [round(p, 3) for p in probes],
        "attribution": {
            "maintenance_cost_sec": round(
                summary["bloom"]["median_sec"] - summary["auto"]["median_sec"], 3),
            "code_drift_vs_r3_sec": round(
                summary["auto"]["median_sec"] - summary["r3"]["median_sec"], 3),
        },
    }
    print("\nABSUMMARY " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
