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
    Bloom shards. Rows on shards with no bitmap are definitely new."""
    withshard = frontier.withColumn(
        "shard", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int")
    )
    joined = withshard.join(bloom, "shard", "left")

    def probe(it):
        # Vectorized per shard group (≤ n_shards iterations per batch, each
        # an O(rows_in_group × k) numpy gather) — no per-row Python.
        for pdf in it:
            out = np.zeros(len(pdf), dtype=bool)
            if len(pdf):
                hashes = pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
                pos = _positions(hashes, m_bits_per_shard, k)
                shards = pdf["shard"].to_numpy()
                bits_col = pdf["bits"]
                for s in np.unique(shards):
                    idx = np.flatnonzero(shards == s)
                    b = bits_col.iloc[int(idx[0])]
                    if b is None:
                        continue
                    arr = np.frombuffer(b, dtype=np.uint8)
                    p = pos[idx]
                    hit = (arr[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
                    out[idx] = hit.all(axis=1)
            yield pdf.drop(columns=["bits"]).assign(maybe_seen=out)

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in joined.schema.fields if f.name != "bits"
    ) + ", maybe_seen boolean"
    return joined.mapInPandas(probe, schema=schema)


def anti_join_seen(
    frontier: DataFrame,
    seen: DataFrame | None,
    use_bloom: bool = True,
    n_shards: int = 8,
    fpp: float = 0.01,
    est_seen: int | None = None,
) -> DataFrame:
    """Frontier rows NOT in the seen set (exact).

    With `use_bloom`, the exact left_anti only processes Bloom
    maybe-positives; definite-new rows bypass it. Without, it is a plain
    left_anti on url_hash (what Catalyst would row-filter itself with
    `spark.sql.optimizer.runtime.bloomFilter.enabled` inside one round —
    the explicit filter exists because the seen table persists across
    rounds, SURVEY.md §4 item 2).
    """
    if seen is None:
        return frontier
    seen_keys = seen.select("url_hash")
    if not use_bloom:
        return frontier.join(seen_keys, "url_hash", "left_anti")
    n = est_seen if est_seen is not None else seen_keys.count()
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
