#!/usr/bin/env python
"""Scaling-efficiency evidence (north_rule: throughput scaling ≥ 0.8 from
N to 4N executors, evidenced in-sandbox as the same job at two local
parallelism levels on identical input).

Runs bench.py in SEPARATE processes at local[N] and local[4N] (a JVM
pins its core count at startup — two sessions in one process would
share the first JVM), then writes BENCH/BASELINE.md with throughput at
both levels and efficiency = (T_N / T_4N) / 4 per metric... note
efficiency is computed on *throughput*: eff = (thr_4N / thr_N) / 4.

Usage: python scripts/scaling_bench.py [N] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench_once(cpus: int, sf_dir: str) -> dict:
    # Crawl-only: the N→4N ratio reads frontier_urls_per_sec alone; the
    # 98-query preamble only adds ~1.5 h of window exposure per 3-rep
    # run, which is what historically collapsed healthy launch windows.
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CRAWL_ONLY="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"bench at {cpus} cores produced no JSON:\n{out.stdout}\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


sys.path.insert(0, REPO)
from oa_spider_spark.hostcap import capacity_probe, membw_probe  # noqa: E402


def main() -> None:
    # Default N=4 → 4N=16 on the 32-core sandbox host: BOTH levels must
    # leave headroom for the JVM's own service threads (shuffle/Arrow
    # IPC), mirroring a real cluster where executors own their cores.
    # local[32] would oversubscribe the host (32 Python workers + 32 JVM
    # task threads on 32 cores) and measure the host, not the engine.
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    # The sandbox is a shared VM whose available CPU drifts by ~1.4× on a
    # scale of minutes-to-hours (hypervisor steal). Running all N-core
    # reps then all 4N-core reps lets one slow hour poison the ratio, so
    # reps are INTERLEAVED (lo,hi), (lo,hi), ... — each pair samples the
    # same machine state — and the reported efficiency is the median of
    # the per-pair efficiencies. Stage-level event-log analysis shows the
    # fetch stage is balanced (32 equal tasks, zero stragglers), so
    # remaining pair-to-pair spread is host noise, not the engine.
    reps = int(os.environ.get("SCALING_REPS", "3"))
    pairs = []
    probes = []
    failed = []
    for rep in range(reps):
        # A shared-VM steal burst can kill a Python worker mid-bench
        # (Arrow socket reset). A crashed rep is a property of the
        # window, not the engine: record it and keep the remaining
        # pairs rather than aborting the whole measurement.
        #
        # Two probe families, BOTH widths, per pair: compute-bound
        # (hypervisor steal / frequency) and memory-streaming (DRAM
        # saturation — the binding ceiling for the payload-heavy fetch
        # stage; see hostcap.membw_probe). The host's own N→4N scaling
        # ceiling for a stage of each kind is
        # (probe_4n * 4n) / (probe_n * n) / 4.
        probe = {
            "cpu_n": capacity_probe(n),
            "cpu_4n": capacity_probe(4 * n),
            "mem_n": membw_probe(n),
            "mem_4n": membw_probe(4 * n),
        }
        try:
            pair = (run_bench_once(n, sf_dir), run_bench_once(4 * n, sf_dir))
        except RuntimeError as exc:
            failed.append(f"rep {rep}: {str(exc).splitlines()[0]}")
            print(f"WARN rep {rep} crashed, continuing: {exc}", file=sys.stderr)
            continue
        probes.append(probe)
        pairs.append(pair)
    if not pairs:
        raise RuntimeError(f"all {reps} reps crashed: {failed}")

    def pair_eff(p):
        return (p[1]["throughput"]["frontier_urls_per_sec"]
                / p[0]["throughput"]["frontier_urls_per_sec"]) / 4

    order = sorted(range(len(pairs)), key=lambda i: pair_eff(pairs[i]))
    mid = order[len(order) // 2]
    lo, hi = pairs[mid]  # median-efficiency pair
    lo["all_pairs_eff"] = [round(pair_eff(pairs[i]), 3) for i in order]
    lo["all_runs_urls_per_sec"] = [
        (pairs[i][0]["throughput"]["frontier_urls_per_sec"],
         pairs[i][1]["throughput"]["frontier_urls_per_sec"]) for i in order
    ]
    lo["capacity_probe_pct"] = [probes[i] for i in order]
    if failed:
        lo["crashed_reps"] = failed

    t_lo, t_hi = lo["throughput"], hi["throughput"]
    eff = {
        k: round((t_hi[k] / t_lo[k]) / 4, 3)
        for k in ("frontier_urls_per_sec", "fetched_images_per_sec")
    }
    # Host ceilings for this window (median pair's probes): what a
    # PERFECTLY parallel stage of each kind could score on this host.
    pr = probes[mid]
    ceil_mem = round((pr["mem_4n"] * 4 * n) / (pr["mem_n"] * n) / 4, 3)
    ceil_cpu = round((pr["cpu_4n"] * 4 * n) / (pr["cpu_n"] * n) / 4, 3)
    eff_vs_mem_ceiling = round(eff["frontier_urls_per_sec"] / ceil_mem, 3)
    gate_pass = min(eff.values()) >= 0.8
    # The narrative must FOLLOW the numbers, not assert a fixed conclusion
    # (ADVICE r03): only claim the host ceiling is cleared when the measured
    # ratio actually clears it, and say plainly when the window was degraded.
    if eff_vs_mem_ceiling >= 1.0:
        ceiling_narrative = f"""Engine efficiency ÷ memory-bandwidth ceiling = **{eff_vs_mem_ceiling}** —
in this window the payload-streaming crawl round scaled as well as THIS
HOST allows a bandwidth-bound job to scale (ratio ≥ 1). On a real
N→4N-executor cluster the DRAM, NIC, and disks multiply with the nodes —
the resource the sandbox cannot multiply."""
    elif gate_pass:
        ceiling_narrative = f"""Engine efficiency ÷ memory-bandwidth ceiling = **{eff_vs_mem_ceiling}**.
The wall-clock gate passed, but the measured ratio does not clear the
memory-bandwidth ceiling in this window — treat the per-stage pareff
table (below / in the bench JSON `stage_pareff`) as the engine-side
evidence, and the wall-clock ratio as host-window-qualified."""
    else:
        ceiling_narrative = f"""Engine efficiency ÷ memory-bandwidth ceiling = **{eff_vs_mem_ceiling}**.
**This run did not clear the 0.8 gate.** Check the same-window capacity
probes above before attributing the shortfall: a sub-0.8 probe means the
host window was degraded (hypervisor steal / DRAM contention); a healthy
probe with a failing gate points at the engine — investigate via
scripts/stage_skew.py before re-running."""
    md = f"""# BENCH — measured numbers (sandbox)

Same job, identical input ({sf_dir}), two parallelism levels in separate
JVMs — the in-sandbox stand-in for N vs 4N executors (BASELINE.md).

## Crawl-round throughput

| metric | local[{n}] | local[{4*n}] | scaling efficiency ((thr_4N/thr_N)/4) |
|---|---|---|---|
| frontier URLs/sec | {t_lo['frontier_urls_per_sec']} | {t_hi['frontier_urls_per_sec']} | {eff['frontier_urls_per_sec']} |
| fetched images/sec | {t_lo['fetched_images_per_sec']} | {t_hi['fetched_images_per_sec']} | {eff['fetched_images_per_sec']} |
| payload MB/sec | {t_lo['payload_mb_per_sec']} | {t_hi['payload_mb_per_sec']} | — |

Round size: {t_lo['selected']} URLs selected, {t_lo['fetched_ok']} images fetched.

North-rule gate: efficiency ≥ 0.8 → {"**PASS**" if min(eff.values()) >= 0.8 else "**FAIL** (see notes)"}

## Host ceilings measured in the same window (median pair)

The sandbox is ONE box: adding task threads does not add DRAM channels,
so the host itself caps what any parallel design can score. Probes
(hostcap.py) taken immediately before the median pair:

| probe (worst-proc fraction of solo) | local[{n}] | local[{4*n}] | host {n}→{4*n} ceiling ((p_4n·4n)/(p_n·n)/4) |
|---|---|---|---|
| compute-bound burner | {pr['cpu_n']} | {pr['cpu_4n']} | {ceil_cpu} |
| memory-streaming burner (fetch-stage profile) | {pr['mem_n']} | {pr['mem_4n']} | {ceil_mem} |

{ceiling_narrative}

## Headline query seconds (sf={lo['sf']})

| query | local[{n}] s | local[{4*n}] s |
|---|---|---|
""" + "\n".join(
        f"| {q} | {lo['queries'][q]} | {hi['queries'][q]} |" for q in lo["queries"]
    ) + f"""

Raw JSON:

```json
{json.dumps(lo)}
{json.dumps(hi)}
```

## Notes — how the sandbox numbers extrapolate to a 1000-executor cluster

* **What scales linearly by construction.** Every per-round stage shuffles on
  keys whose cardinality grows with the data, not the cluster: frontier dedup
  is a map-side-combined hash aggregate on `url_hash` (uniform); the Bloom
  probe is co-partitioned on `pmod(url_hash, P)` with P sized to the cluster;
  the fetch stage is salted so a hot host spreads over EVERY task. No stage
  collects more than ~100 rows (bucket offsets) or a few KB (Bloom shard
  metadata) to the driver.
* **The one O(rows) driver interaction** of the selection path is a 2-value
  min/max bounds collect for the rank sub-bucketing; rank offsets are a
  broadcast METADATA frame (≤100 priority buckets × 256 sub-buckets of
  counts), independent of frontier size.
* **10^10-URL frontier math.** At the measured per-core fetch cost (~2.4 ms:
  synthetic decode+hash stands in for HTTP+JPEG decode), a 1000-executor ×
  4-core cluster sustains ~1.7M URLs/sec → a 10^10-URL frontier drains in
  ~100 minutes of fetch time. Frontier/seen tables at 10^10 rows × ~120 B
  ≈ 1.2 TB — 2400 parquet partitions of 500 MB; the dedup + anti-join
  shuffles move only key+metadata columns (no payloads). Payload staging
  writes (~17 TB/round at 1.7 KB/image) go to executor-local disks/object
  storage, scaling with executor count.
* **Run-to-run variance.** The sandbox is a shared VM with bursty CPU steal
  (observed 2× wall-clock swings run-to-run, `st` up to 6% in vmstat).
  Reps are interleaved (N, 4N) pairs so both levels sample the same machine
  state; the reported numbers are the MEDIAN-efficiency pair. Per-pair
  efficiencies and throughputs are in the raw JSON (`all_pairs_eff`,
  `all_runs_urls_per_sec`). Stage-level event-log analysis of the fetch
  stage shows 32 near-identical tasks (34-41 s, zero stragglers) — the
  pair-to-pair spread is host noise, not engine skew.
* **Why staging is on tmpfs.** Each executor on a real cluster writes staged
  snapshots to its own disks, so staging bandwidth scales with the cluster;
  the sandbox's single shared virtio disk does not (parquet writes were
  observed degrading 5→29 s under 32 concurrent writers). tmpfs stands in
  for per-executor disks; `SPARK_GRAFT_STAGE_DIR` overrides.
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    # Preserve the curated cross-round sections (measurement history,
    # stage-balance evidence) — everything from the history marker on.
    tail = ""
    if os.path.exists(out_path):
        prev = open(out_path).read()
        idx = prev.find("## Measurement history")
        if idx >= 0:
            tail = "\n" + prev[idx:]
    with open(out_path, "w") as f:
        f.write(md + tail)
    print(json.dumps({
        "eff": eff, "ceil_mem": ceil_mem, "ceil_cpu": ceil_cpu,
        "eff_vs_mem_ceiling": eff_vs_mem_ceiling, "lo": t_lo, "hi": t_hi,
    }))


if __name__ == "__main__":
    main()
