"""URL-seen set: distributed Bloom prefilter + exact anti-join (J2).

The reference delegates dedup to server-side read-marking (`oa.py:384,
507-510,1065` — each processed doc is marked read so the next listing
excludes it). The engine's equivalent is an append-only `seen` table of
url_hash keys, consulted at frontier-selection time.

At 10^10 URLs the exact `left_anti` join shuffles the full frontier against
the full seen table every round. The scale path is a **partitioned Bloom
filter**: the seen table is aggregated into P bitmap shards keyed by
`pmod(url_hash, P)`; the frontier co-shuffles on the same key, joins its
shard (equi join, co-partitioned, no broadcast of the whole filter), and a
vectorized probe marks rows `maybe_seen`. Only the maybe-set proceeds to
the exact anti-join — Bloom false positives can never DROP a URL, they can
only cost an exact lookup (SURVEY.md §7 hard-part 2). A row whose shard
says "definitely not seen" skips the big join entirely.

Build and probe use numpy bit-ops inside Arrow batches; bit positions are
derived from the already-computed 64-bit url_hash by splitmix64 remixing
(k hash functions from one hash, standard double-hashing construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via splitmix64 double hashing. hashes: uint64."""
    x = hashes.copy()
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & MASK64
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & MASK64
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & MASK64
    h1 = x ^ (x >> np.uint64(31))
    h2 = (x >> np.uint64(17)) | np.uint64(1)  # odd step
    ks = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) sized for n items at target false-positive rate."""
    n = max(n_items, 1)
    m = int(-n * np.log(fpp) / (np.log(2) ** 2)) + 8
    k = max(1, int(round(m / n * np.log(2))))
    return m, min(k, 8)


def build_bloom_shards(
    seen: DataFrame, n_shards: int, m_bits_per_shard: int, k: int
) -> DataFrame:
    """Aggregate seen.url_hash into P bitmap shards:
    DataFrame[shard:int, bits:binary]."""

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros((m_bits_per_shard + 7) // 8, dtype=np.uint8)
        hashes = pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        pos = _positions(hashes, m_bits_per_shard, k).ravel()
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])], "bits": [bits.tobytes()]})

    return (
        seen.select(F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int").alias("shard"), "url_hash")
        .groupBy("shard")
        .applyInPandas(agg, schema="shard int, bits binary")
    )


def mark_maybe_seen(
    frontier: DataFrame, bloom: DataFrame, n_shards: int, m_bits_per_shard: int, k: int
) -> DataFrame:
    """Attach `maybe_seen` to the frontier by probing the co-partitioned
    Bloom shards via **cogrouped applyInPandas**: the frontier's shard
    group and the (single-row) bitmap group meet in one task, so each
    shard's bitmap materializes ONCE per task. The earlier join-then-map
    formulation put a copy of the bitmap on EVERY row — a 4096-row Arrow
    batch carried ~0.6 GB of repeated bitmap at 1M seen URLs and made the
    probe slower than the exact join it was gating (measured 601 s vs
    108 s per round). Rows in shards with no bitmap are definitely new."""
    withshard = frontier.withColumn(
        "shard", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int")
    )
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in withshard.schema.fields
    ) + ", maybe_seen boolean"

    def probe(rows: pd.DataFrame, bmp: pd.DataFrame) -> pd.DataFrame:
        if not len(rows):
            return rows.assign(maybe_seen=pd.Series([], dtype=bool))
        if not len(bmp) or bmp["bits"].iloc[0] is None:
            return rows.assign(maybe_seen=False)
        arr = np.frombuffer(bmp["bits"].iloc[0], dtype=np.uint8)
        hashes = rows["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        pos = _positions(hashes, m_bits_per_shard, k)
        hit = (arr[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return rows.assign(maybe_seen=hit.all(axis=1))

    return (
        withshard.groupBy("shard")
        .cogroup(bloom.groupBy("shard"))
        .applyInPandas(probe, schema=out_schema)
    )


# Below this many seen URLs the plain JVM left_anti wins outright: the
# whole seen side fits a broadcast/shuffle hash join and the Python probe
# stage (worker startup + Arrow hops) costs more than it saves. The Bloom
# shards pay off when the seen table is too big to re-shuffle against the
# frontier every round (10^8+; the 10^10 design point is the north rule).
BLOOM_MIN_SEEN = 20_000_000


def anti_join_seen(
    frontier: DataFrame,
    seen: DataFrame | None,
    use_bloom: bool | str = "auto",
    n_shards: int = 64,
    fpp: float = 0.01,
    est_seen: int | None = None,
) -> DataFrame:
    """Frontier rows NOT in the seen set (exact).

    With the Bloom path, the exact left_anti only processes Bloom
    maybe-positives; definite-new rows bypass it. Without, it is a plain
    left_anti on url_hash (what Catalyst would row-filter itself with
    `spark.sql.optimizer.runtime.bloomFilter.enabled` inside one round —
    the explicit filter exists because the seen table persists across
    rounds, SURVEY.md §4 item 2).

    `use_bloom="auto"` (default) measures the seen table and enables the
    sharded probe only above BLOOM_MIN_SEEN — below that the probe is a
    measured pessimization (extra Python stage > saved join work).
    False positives can only cost an exact lookup, never drop a URL
    (SURVEY.md §7 hard-part 2).
    """
    if use_bloom not in (True, False, "auto"):
        raise ValueError(f"use_bloom must be True, False or 'auto', got {use_bloom!r}")
    if seen is None:
        return frontier
    seen_keys = seen.select("url_hash")
    n = est_seen if est_seen is not None else (
        seen_keys.count() if use_bloom in (True, "auto") else 0
    )
    if use_bloom == "auto":
        use_bloom = n >= BLOOM_MIN_SEEN
    if not use_bloom:
        return frontier.join(seen_keys, "url_hash", "left_anti")
    if n == 0:
        return frontier
    m_total, k = bloom_params(n, fpp)
    m_shard = max(64, m_total // n_shards)
    bloom = build_bloom_shards(seen_keys, n_shards, m_shard, k)
    marked = mark_maybe_seen(frontier, bloom, n_shards, m_shard, k)
    definitely_new = marked.filter(~F.col("maybe_seen")).drop("maybe_seen", "shard")
    maybe = marked.filter(F.col("maybe_seen")).drop("maybe_seen", "shard")
    confirmed_new = maybe.join(seen_keys, "url_hash", "left_anti")
    return definitely_new.unionByName(confirmed_new)
