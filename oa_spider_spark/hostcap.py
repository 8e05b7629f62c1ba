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


def _burn_mem(_):
    """Memory-streaming burner: widen/scale/narrow/sum over a DRAM-sized
    array — the access pattern of the fetch stage's payload path (Arrow
    batches + numpy codec passes + tmpfs staging all stream DRAM)."""
    import time

    import numpy as np

    rng = np.random.default_rng(1)
    a = rng.integers(0, 255, size=(4_000_000,), dtype=np.uint8)
    t0 = time.perf_counter()
    for _ in range(30):
        b = a.astype(np.float64)
        c = b * 0.299 + 17.0
        d = c.astype(np.uint8)
        d.sum()
    return time.perf_counter() - t0


def membw_probe(n_proc: int) -> float:
    """Fraction of solo memory-streaming throughput the WORST of n_proc
    concurrent streamers achieves. On this sandbox DRAM saturates around
    4 streams (measured ~0.38 at 4, ~0.18 at 16), so the host's own
    4→16 scaling ceiling for a bandwidth-bound stage is
    (0.18*16)/(0.38*4) / 4 ≈ 0.47 — any bandwidth-bound engine stage is
    capped there REGARDLESS of its parallel design. A real cluster adds
    DRAM with every node; the sandbox does not."""
    import multiprocessing as mp

    with mp.Pool(1) as p:
        base = min(p.map(_burn_mem, range(2)))
    with mp.Pool(n_proc) as p:
        times = p.map(_burn_mem, range(n_proc))
    return round(base / max(times), 3)
