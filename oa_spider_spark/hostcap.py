"""Host-capacity probe — measurement hygiene for a shared/noisy VM.

The sandbox host swings up to 2× wall-clock on hypervisor CPU steal
(CLAUDE.md gotchas), so every benchmark artifact records a probe taken
in the SAME window: `capacity_probe(n)` runs n plain-Python burners at
once and reports the worst process's fraction of a single-process
baseline — ~1.0 on a healthy host, well below when the hypervisor is
stealing cycles. A degraded benchmark number then carries its own
exculpatory (or damning) evidence instead of needing a separate session
to re-litigate (VERDICT r02 item 2).
"""

from __future__ import annotations


def _burn(_):
    import time

    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    return time.perf_counter() - t0


def capacity_probe(n_proc: int) -> float:
    import multiprocessing as mp

    with mp.Pool(1) as p:
        base = min(p.map(_burn, range(2)))
    with mp.Pool(n_proc) as p:
        times = p.map(_burn, range(n_proc))
    return round(base / max(times), 3)
