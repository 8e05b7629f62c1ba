"""Text/embedding dedup + similarity queries (SURVEY §2.12 X2–X8):
n-gram Jaccard, minhash LSH, simhash near-pairs, connected-component
clusters, winnowing fingerprints, hyperplane-bucketed embedding near-dups
and IVF ANN — the corpus-dedup family over the `documents` /
`embeddings` tables. Split out of queries.py (VERDICT r04 #8, pure
hygiene — no behavior change). SQL_MINHASH_LSH stays importable from
here: queries_pipeline's dedup-keep oracle composes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis — heuristic script-based language ID."""
    from .operators.text import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


SQL_LANG_ID = """
SELECT doc_id,
       CASE WHEN length(text) = 0 THEN 'empty'
            WHEN length(regexp_replace(text, '[^一-龥]', '', 'g')) * 1.0 / length(text) > 0.3 THEN 'cjk'
            WHEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text) > 0.3 THEN 'latin'
            ELSE 'mixed' END AS pred_lang
FROM documents
"""


NGRAM_DF_CAP = 50  # grams in more docs than this generate no candidates


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard near-dup scoring, hash-free definition so DuckDB
    can oracle it: pairs of docs (doc_id % 17 == 0 subset) sharing ≥1
    RARE distinct 5-gram (document frequency ≤ NGRAM_DF_CAP), exact
    Jaccard over ALL shared grams ≥ 0.4. The df cap bounds the
    candidate self-join: a gram's pair fan-out is ≤ cap², so total
    candidate volume is ≤ cap × Σ df — linear in corpus size instead of
    O(freq²) per hot gram (a 0.4-Jaccard pair sharing ONLY >cap-frequent
    grams is the lone, statistically negligible miss — and the oracle
    applies the identical cap). Deterministic near-dup clones
    (doc_id+10^6, text truncated by 7 chars) are planted — identically
    in the oracle — so recall is testable at every scale factor. The
    engine's LSH-accelerated variant (same math, xxhash64 shingles +
    banding) is q_minhash_lsh."""
    base = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 17 == 0)
    clones = base.filter(F.col("doc_id") % 34 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.substring(F.col("text"), 1, F.greatest(F.length("text") - 7, F.lit(12))).alias("text"),
    )
    d = base.select("doc_id", "text").unionByName(clones)
    n = F.length("text")
    idx = F.sequence(F.lit(1), F.greatest(n - 5 + 1, F.lit(1)))
    grams = F.array_distinct(F.transform(idx, lambda i: F.col("text").substr(i, F.lit(5))))
    sh = d.select("doc_id", F.explode(grams).alias("gram"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    rare = sh.join(
        sh.groupBy("gram").agg(F.count("*").alias("df"))
        .filter(F.col("df") <= NGRAM_DF_CAP).select("gram"),
        "gram",
    )
    cand = (
        rare.select(F.col("doc_id").alias("doc_a"), "gram")
        .join(rare.select(F.col("doc_id").alias("doc_b"), "gram"), "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # exact intersection over ALL grams, candidates only (minhash-verify shape)
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "gram"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "gram"), ["doc_b", "gram"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.4)
    )


SQL_NGRAM_JACCARD = f"""
WITH d AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         substring(text, 1, greatest(length(text) - 7, 12)) AS text
  FROM documents WHERE doc_id % 34 = 0
), ser AS (
  SELECT unnest(generate_series(1, (SELECT max(length(text)) FROM d))) AS i
), sh AS (
  SELECT DISTINCT doc_id, substring(text, i, 5) AS gram
  FROM d JOIN ser ON ser.i <= greatest(length(text) - 5 + 1, 1)
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), rare AS (
  SELECT sh.doc_id, sh.gram FROM sh
  JOIN (SELECT gram FROM sh GROUP BY gram HAVING count(*) <= {NGRAM_DF_CAP}) r
  USING (gram)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM rare a JOIN rare b USING (gram)
  WHERE a.doc_id < b.doc_id
), inter AS (
  SELECT doc_a, doc_b, count(*) AS n_inter
  FROM cand
  JOIN sh sa ON sa.doc_id = doc_a
  JOIN sh sb ON sb.doc_id = doc_b AND sb.gram = sa.gram
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
       round(n_inter * 1.0 / (sa.sz + sb.sz - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_inter * 1.0 / (sa.sz + sb.sz - n_inter) >= 0.4
"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pipeline (shingles → 32-hash signatures →
    8 bands → bucket join → exact Jaccard verify ≥ 0.8). Run in portable
    (md5-derived-hash) mode so the ENTIRE pipeline — candidate generation
    included — has a DuckDB value oracle; the engine default stays
    xxhash64 (same structure, cheaper hash), pinned equal-recall in
    tests/test_operators.py."""
    from .operators.dedup import minhash_dedup

    docs = _t(spark, sf_dir, "documents")
    return minhash_dedup(docs, threshold=0.8, portable=True).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


# DuckDB twin of the full portable pipeline. Band buckets join on the raw
# comma-joined signature slice: equality of the slice string is exactly
# equality of Spark's xxhash64(slice string) bucket key (collisions aside).
SQL_MINHASH_LSH = """
WITH ser AS (
  SELECT unnest(generate_series(1, (SELECT max(length(text)) FROM documents))) AS i
), sh AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(substring(text, i, 5)), 1, 15))::BIGINT AS shingle_hash
  FROM documents JOIN ser ON ser.i <= greatest(length(text) - 4, 1)
), sig AS (
  SELECT doc_id, h.i AS hi,
         min(('0x' || substr(md5(shingle_hash::VARCHAR || ':42:' || h.i::VARCHAR), 1, 15))::BIGINT) AS mh
  FROM sh, range(32) h(i)
  GROUP BY doc_id, h.i
), bands AS (
  SELECT doc_id, hi // 4 AS band, string_agg(mh::VARCHAR, ',' ORDER BY hi) AS bucket
  FROM sig GROUP BY doc_id, hi // 4
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band, bucket)
  WHERE a.doc_id < b.doc_id
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), inter AS (
  SELECT doc_a, doc_b, count(*) AS n_inter
  FROM cand
  JOIN sh sa ON sa.doc_id = doc_a
  JOIN sh sb ON sb.doc_id = doc_b AND sb.shingle_hash = sa.shingle_hash
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
       round(n_inter * 1.0 / (za.sz + zb.sz - n_inter), 6) AS jaccard
FROM inter
JOIN sizes za ON za.doc_id = doc_a
JOIN sizes zb ON zb.doc_id = doc_b
WHERE n_inter * 1.0 / (za.sz + zb.sz - n_inter) >= 0.8
"""


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: MinHash-LSH survivor pairs → connected
    components (alternating large-star/small-star, O(log² n) rounds) →
    (doc_id, component_id = min doc of cluster, n_members). This is the
    step that turns pairwise candidates into an actual deduplicated
    corpus — keep component_id, drop the rest. Oracle: recursive-CTE
    transitive closure over the same portable-hash pair pipeline."""
    from .operators.dedup import connected_components, minhash_dedup

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_dedup(docs, threshold=0.8, portable=True)
    # comp feeds both join sides below; connected_components already
    # returns a materialized (file-staged) scan, so both references are
    # cheap re-reads — no extra checkpoint needed
    comp = connected_components(pairs)
    sizes = comp.groupBy("component_id").agg(F.count("*").alias("n_members"))
    return comp.join(sizes, "component_id").select(
        "doc_id", "component_id", "n_members"
    )


# Recursive closure is oracle-only (fine on dozens of pairs at sf0.01);
# the Spark side never computes reachability row-by-row.
SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE pairs AS ({SQL_MINHASH_LSH}
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach(u, x) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.x = e.u
), lbl AS (
  SELECT u AS doc_id, least(u, min(x)) AS component_id FROM reach GROUP BY u
)
SELECT l.doc_id, l.component_id, s.n_members
FROM lbl l
JOIN (
  SELECT component_id, count(*) AS n_members FROM lbl GROUP BY component_id
) s USING (component_id)
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprint, portable (md5-60bit) mode →
    full DuckDB value oracle; xxhash64 default stays the scale path
    (determinism + shift-robustness pinned in tests)."""
    from .operators.text import fingerprint

    return fingerprint(_t(spark, sf_dir, "documents"), portable=True)


SQL_DOC_FINGERPRINT = """
WITH ser AS (
  SELECT unnest(generate_series(1, (SELECT max(length(text)) FROM documents))) AS i
), g AS (
  SELECT doc_id, ('0x' || substr(md5(substring(text, i, 8)), 1, 15))::BIGINT AS h
  FROM documents JOIN ser ON ser.i <= greatest(length(text) - 7, 1)
)
SELECT doc_id, min(h) AS fingerprint FROM g GROUP BY doc_id
"""


def q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via 16-bit block LSH, portable (md5-60bit
    token hash) mode → full DuckDB oracle over fingerprints, blocking,
    and Hamming verify alike."""
    from .operators.dedup import simhash64, simhash_near_pairs

    pairs = simhash_near_pairs(
        simhash64(_t(spark, sf_dir, "documents"), portable=True), max_hamming=10
    )
    return pairs.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


SQL_SIMHASH_NEAR_PAIRS = r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
  FROM documents
), tb AS (
  SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h
  FROM tok WHERE token <> ''
), sums AS (
  SELECT doc_id, b.b AS b,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM tb, range(60) b(b)
  GROUP BY doc_id, b.b
), sh AS (
  SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS simhash
  FROM sums GROUP BY doc_id
)
-- EXHAUSTIVE pair ground truth (r03): the Spark side blocks on k+1
-- pigeonhole pieces, which is candidate-COMPLETE for the requested
-- radius, so its output must equal the all-pairs answer — the oracle no
-- longer mirrors the blocking (the r02 oracle replicated the old 4×16
-- scheme, recall gap included). O(n²) is fine at oracle scale only.
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 10
"""


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via random-hyperplane LSH buckets +
    exact cosine ≥ 0.9 inside buckets. Oracled: the hyperplanes are
    deterministic from seed 7, so SQL_EMBEDDING_NEAR_DUPS embeds the
    identical plane values as DOUBLE[] literals and reproduces bucketing
    + verify exactly. Deterministic near-duplicates (vec_id+10^6, scaled
    by 1.001 — cosine 1.0) are planted for the first 20 vectors; the
    operator must recover them."""
    from .operators.dedup import embedding_near_dups

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    planted = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
        "label",
    )
    return embedding_near_dups(emb.unionByName(planted), threshold=0.9).select(
        "vec_a", "vec_b", F.round("cos_sim", 6).alias("cos_sim")
    )


def _sql_embedding_near_dups(dim: int = 64, n_planes: int = 12, seed: int = 7) -> str:
    """DuckDB twin of q_embedding_near_dups: the seed-7 hyperplanes are
    embedded as DOUBLE[] literals (repr() round-trips doubles exactly, so
    both engines score against bit-identical planes)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim))
    bucket = "\n    + ".join(
        "(CASE WHEN list_dot_product(e, ["
        + ", ".join(repr(float(x)) for x in planes[i])
        + "]::DOUBLE[]) > 0 THEN " + str(1 << i) + " ELSE 0 END)"
        for i in range(n_planes)
    )
    return f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, list_transform(embedding::DOUBLE[], x -> x * 1.001) AS e
  FROM embeddings WHERE vec_id < 20
), bucketed AS (
  SELECT vec_id, e, {bucket} AS bucket
  FROM emb
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS cos_sim
FROM bucketed a JOIN bucketed b USING (bucket)
WHERE a.vec_id < b.vec_id
  AND list_dot_product(a.e, b.e)
      / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.9
"""


SQL_EMBEDDING_NEAR_DUPS = _sql_embedding_near_dups()


def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors — the PROBE path, fully oracled:
    assignment to fixed seed-31 cells, probe scans the n_probe=4 nearest
    cells only, cosine top-20 inside them. Centroids are seed-derived
    literals (not k-means-trained) precisely so the DuckDB twin can embed
    the identical values — distributed Lloyd training is fp-accumulation-
    order-dependent and stays pinned by tests (test_ivf_topk_recall)
    instead. Assignment/rank tie-breaks are (distance, cell) / (cos_sim
    desc, vec_id) on both sides."""
    import numpy as np

    from .operators.similarity import assign_cells

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    probe_arr = np.asarray(
        emb.filter(F.col("vec_id") == 0).head()["embedding"], dtype=np.float64
    )
    cents = np.random.RandomState(31).normal(size=(8, len(probe_arr)))
    order = np.argsort(((cents - probe_arr) ** 2).sum(axis=1), kind="stable")
    probe_cells = [int(c) for c in order[:4]]
    cand = assign_cells(emb, cents).filter(F.col("cell").isin(probe_cells))
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("probe"))
    x = cand.crossJoin(F.broadcast(probe))
    dot = F.aggregate(
        F.zip_with("embedding", "probe", lambda a, b: a * b),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate("probe", F.lit(0.0), lambda acc, v: acc + v * v))
    sim = F.round(dot / (na * nb), 6)
    top = (
        x.select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(20)
    )
    w = Window.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def _sql_ivf_ann(dim: int = 64, n_cells: int = 8, n_probe: int = 4, k: int = 20,
                 seed: int = 31) -> str:
    """DuckDB twin of q_ivf_ann with the identical seed-31 centroid
    literals. list_distance orders cells exactly like Spark's elementwise
    squared-difference fold (IEEE sqrt is monotone)."""
    import numpy as np

    cents = np.random.RandomState(seed).normal(size=(n_cells, dim))
    vals = ",\n".join(
        f"({i}, [" + ", ".join(repr(float(x)) for x in cents[i]) + "]::DOUBLE[])"
        for i in range(n_cells)
    )
    return f"""
WITH cells(cell, c) AS (VALUES {vals}),
probe AS (SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, e.label, e.emb, cells.cell,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_distance(e.emb, cells.c), cells.cell) AS rn
  FROM (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings) e
  CROSS JOIN cells
),
probecells AS (
  SELECT cells.cell FROM cells, probe
  ORDER BY list_distance(probe.p, cells.c), cells.cell LIMIT {n_probe}
),
cand AS (
  SELECT vec_id, label, emb FROM scored
  WHERE rn = 1 AND cell IN (SELECT cell FROM probecells)
),
sims AS (
  SELECT vec_id, label,
         round(list_dot_product(emb, probe.p)
               / (sqrt(list_dot_product(emb, emb))
                  * sqrt(list_dot_product(probe.p, probe.p))), 6) AS cos_sim
  FROM cand, probe
)
SELECT vec_id, label, cos_sim,
       CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
FROM sims ORDER BY rank LIMIT {k}
"""


SQL_IVF_ANN = _sql_ivf_ann()


# --- X83: exact-threshold similarity self-join (prefix filtering) ------------


def q_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs Jaccard >= 0.5 over word-bigram shingles via
    df-ordered prefix filtering (operators/dedup.py::
    prefix_jaccard_pairs) — provable-recall near-dup reconciliation.
    The oracle is the brute-force shared-token pair join: if the prefix
    filter ever missed a qualifying pair (or admitted a false one), the
    row sets diverge — the filter's correctness IS the thing on trial."""
    from .operators.dedup import prefix_jaccard_pairs

    return prefix_jaccard_pairs(
        _t(spark, sf_dir, "documents"), t_milli=500
    )


SQL_PREFIX_JACCARD = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), s AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(2, len(w)),
                                      i -> w[i-1] || ' ' || w[i])) AS s
  FROM w WHERE len(w) >= 2
), t AS (
  SELECT doc_id, unnest(s) AS tok FROM s
), sz AS (
  SELECT doc_id, len(s) AS n FROM s WHERE len(s) > 0
), i AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ic
  FROM t a JOIN t b USING (tok)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT da, db,
       ic::BIGINT AS inter_cnt,
       (sa.n + sb.n - ic)::BIGINT AS union_cnt,
       ((1000 * ic) // (sa.n + sb.n - ic))::BIGINT AS jacc_milli
FROM i
JOIN sz sa ON sa.doc_id = da
JOIN sz sb ON sb.doc_id = db
WHERE 1000 * ic >= 500 * (sa.n + sb.n - ic)
"""


# --- X85: sorted-neighborhood dedup (SNM) ------------------------------------


def q_snm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood candidate pairs (operators/dedup.py::
    sorted_neighborhood_pairs): normalized 32-char blocking key, global
    (key, id) sort via the bucketed-rank decomposition, neighbors within
    window 8, JVM levenshtein <= 4 verify. The oracle recomputes the
    SAME total order with a plain ROW_NUMBER and a rank-distance self
    join — if the two-level cell decomposition ever mis-ranks a row (or
    the block trick drops a neighbor pair), the row sets diverge."""
    from .operators.dedup import sorted_neighborhood_pairs

    return sorted_neighborhood_pairs(_t(spark, sf_dir, "documents"))


SQL_SNM_PAIRS = """
WITH k AS (
  SELECT doc_id,
         substr(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', '', 'g'),
                1, 32) AS key
  FROM documents
), r AS (
  SELECT doc_id, key, ROW_NUMBER() OVER (ORDER BY key, doc_id) AS rnk FROM k
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.key, b.key) AS INT) AS dist
FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk - a.rnk < 8
WHERE levenshtein(a.key, b.key) <= 4
"""


# --- X95: asymmetric containment detection (quotes / excerpts) ---------------


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X95: containment pairs (operators/dedup.py::containment_pairs) —
    the asymmetric complement of Jaccard dedup: a small document whose
    shingles sit inside a big one (quote, excerpt, wrapper page).
    Construction: each doc gets a unique 20-token text (tokens are
    md5(doc_id:i) prefixes, so cross-doc shingle overlap is ~zero);
    every even doc also emits an 8-token QUOTE doc (+100000 id) that is
    the exact prefix of its parent — Jaccard(parent, quote) ≈ 0.44 but
    containment(quote) ≈ 950+, so a symmetric threshold misses every
    pair this query reports. A shared ' boilerplatefooter' suffix on
    all docs exercises the _cap_groups guard (footer shingles sit on
    ~750 docs, capped at 8; they stay in the per-doc sizes). Portable
    md5h60 shingles; the oracle re-derives shingle sets, cap, and
    floor-div containments exactly."""
    from .operators.dedup import containment_pairs

    d = _t(spark, sf_dir, "documents")

    def synth(n_tokens: int) -> F.Column:
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(n_tokens - 1)),
            lambda i: F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit(":"), i.cast("string")
                    )
                ),
                1,
                8,
            ),
        )
        return F.concat(F.array_join(toks, " "), F.lit(" boilerplatefooter"))

    parents = d.select("doc_id", synth(20).alias("text"))
    quotes = d.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 100000).alias("_qid"), "doc_id", synth(8).alias("text")
    )
    docs = parents.unionByName(
        quotes.select(F.col("_qid").alias("doc_id"), "text")
    )
    return containment_pairs(
        docs, k=5, min_shared=2, min_containment_milli=800, cap=8, portable=True
    )


SQL_CONTAINMENT_PAIRS = """
WITH parents AS (
  SELECT doc_id,
         array_to_string(list_transform(generate_series(0, 19),
           i -> substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR), 1, 8)), ' ')
         || ' boilerplatefooter' AS text
  FROM documents
), quotes AS (
  SELECT doc_id + 100000 AS qid,
         array_to_string(list_transform(generate_series(0, 7),
           i -> substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR), 1, 8)), ' ')
         || ' boilerplatefooter' AS text
  FROM documents WHERE doc_id % 2 = 0
), docs AS (
  SELECT doc_id, text FROM parents
  UNION ALL SELECT qid AS doc_id, text FROM quotes
), sh AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(substr(text, i, 5)), 1, 15))::BIGINT AS h
  FROM docs, LATERAL unnest(generate_series(1, greatest(len(text) - 4, 1))) AS g(i)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), capped AS (
  SELECT doc_id, h FROM (
    SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS gsz FROM sh
  ) WHERE gsz <= 8
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM capped a JOIN capped b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= 2
), scored AS (
  SELECT p.doc_a, p.doc_b, p.shared, sa.n AS n_a, sb.n AS n_b,
         (p.shared * 1000) // sa.n AS cont_a_milli,
         (p.shared * 1000) // sb.n AS cont_b_milli
  FROM pairs p
  JOIN sizes sa ON p.doc_a = sa.doc_id
  JOIN sizes sb ON p.doc_b = sb.doc_id
)
SELECT *, CASE WHEN cont_a_milli >= 800 AND cont_b_milli >= 800 THEN 'mutual'
               WHEN cont_a_milli >= 800 THEN 'a_in_b'
               ELSE 'b_in_a' END AS direction
FROM scored
WHERE greatest(cont_a_milli, cont_b_milli) >= 800
"""


# --- X108: cross-document verbatim spans (ExactSubstr-style) ------------------


def q_cross_doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X108: cross-doc verbatim runs (operators/dedup.py::
    cross_doc_spans). Every doc_id%51==0 document (10 at sf0.01) gets a
    shared 6-token boilerplate sentence appended — a 45-pair clique
    whose diagonal runs span 4 matched trigrams (run_tokens 6); every
    doc_id%13==0 doc appends a 2-token decoy that can never form a
    trigram anchor shared across docs (its third word is the doc's own
    last word). Natural rare-trigram single matches (run_tokens 3) are
    filtered by min_run_tokens=4, so surviving pairs are genuinely
    verbatim overlaps. The oracle rebuilds the positional stream, the
    df window, the cap, and the pos − row_number islands."""
    from .operators.dedup import cross_doc_spans

    d = _t(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    t = F.when(
        F.col("doc_id") % 13 == 0, F.concat(t, F.lit(" alpha beta"))
    ).otherwise(t)
    t = F.when(
        F.col("doc_id") % 51 == 0,
        F.concat(t, F.lit(" alpha beta gamma delta epsilon zeta")),
    ).otherwise(t)
    return cross_doc_spans(
        d.select("doc_id", t.alias("text")),
        n=3,
        df_min=2,
        df_max=16,
        max_positions_per_gram=64,
        min_run_tokens=4,
    )


SQL_CROSS_DOC_SPANS = r"""
WITH deco AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 13 = 0 THEN trim(text) || ' alpha beta'
          ELSE trim(text) END)
    || (CASE WHEN doc_id % 51 = 0
             THEN ' alpha beta gamma delta epsilon zeta' ELSE '' END) AS t
  FROM documents
), toks AS (
  SELECT doc_id, regexp_split_to_array(trim(t), '\s+') AS w FROM deco
), g AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(w) - 2),
                i -> {pos: i - 1,
                      ng: w[i] || ' ' || w[i+1] || ' ' || w[i+2]})) AS s
  FROM toks WHERE len(w) >= 3
), gp AS (
  SELECT doc_id, s.pos AS pos, s.ng AS ng FROM g
), rare AS (
  SELECT ng FROM (
    SELECT ng, count(DISTINCT doc_id) AS df FROM gp GROUP BY ng
  ) WHERE df BETWEEN 2 AND 16
), gr AS (
  SELECT doc_id, pos, ng FROM (
    SELECT gp.*, count(*) OVER (PARTITION BY gp.ng) AS c
    FROM gp JOIN rare USING (ng)
  ) WHERE c <= 64
), p AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.pos AS pa, a.pos - b.pos AS diag
  FROM gr a JOIN gr b ON a.ng = b.ng AND a.doc_id < b.doc_id
), i AS (
  SELECT *, pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                    ORDER BY pa) AS grp
  FROM p
), runs AS (
  SELECT doc_a, doc_b, count(*) + 2 AS run_tokens
  FROM i GROUP BY doc_a, doc_b, diag, grp
  HAVING count(*) + 2 >= 4
)
SELECT doc_a, doc_b,
       max(run_tokens)::BIGINT AS max_run_tokens,
       count(*) AS n_runs
FROM runs GROUP BY doc_a, doc_b
"""


# --- X132: cross-source duplication matrix ------------------------------------


def q_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X132: WHO copies from WHOM — the provenance question a corpus
    builder asks right after near-dup detection: MinHash-LSH pairs
    (portable mode, X2's exact pipeline) joined to each side's source
    and aggregated into an unordered source×source duplicate-pair
    matrix. Mirrors/syndication show up as heavy off-diagonal cells;
    boilerplate-within-a-source as the diagonal. Oracle chains the full
    minhash oracle as a CTE (corpus_pipeline discipline)."""
    from .operators.dedup import minhash_dedup

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_dedup(docs, threshold=0.8, portable=True)
    sa = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("_sa"))
    sb = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("_sb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("_sa", "_sb").alias("src_a"),
            F.greatest("_sa", "_sb").alias("src_b"),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_dup_pairs"))
    )


def _sql_source_dup_matrix() -> str:
    return f"""
WITH pairs AS ({SQL_MINHASH_LSH}
), j AS (
  SELECT least(da.source, db.source) AS src_a,
         greatest(da.source, db.source) AS src_b
  FROM pairs p JOIN documents da ON p.doc_a = da.doc_id
               JOIN documents db ON p.doc_b = db.doc_id
)
SELECT src_a, src_b, count(*) AS n_dup_pairs FROM j GROUP BY src_a, src_b
"""


# --- X105: dedup clustering quality audit ------------------------------------


def q_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X105: pair-level precision/recall of a clustering vs ground truth
    (operators/dedup.py::dedup_audit). Truth groups documents in runs of
    10 (truth = doc_id div 10); the audited clustering is the same
    partition with an injected defect — every doc_id%7==0 doc is shifted
    +5 before bucketing, splitting its true group (FN pairs) and
    polluting a neighbor (FP pairs). The oracle recomputes the three
    C(n,2) contingency sums relationally; every count and both milli
    ratios must match exactly."""
    from .operators.dedup import dedup_audit

    d = _t(spark, sf_dir, "documents").select("doc_id")
    truth = d.select("doc_id", F.expr("doc_id div 10").alias("truth_id"))
    assign = d.select(
        "doc_id",
        F.expr(
            "(doc_id + CASE WHEN doc_id % 7 = 0 THEN 5 ELSE 0 END) div 10"
        ).alias("cluster_id"),
    )
    return dedup_audit(assign, truth)


SQL_DEDUP_AUDIT = """
WITH j AS (
  SELECT doc_id,
         (doc_id + CASE WHEN doc_id % 7 = 0 THEN 5 ELSE 0 END) // 10 AS c,
         doc_id // 10 AS t
  FROM documents
), ct AS (
  SELECT sum(n * (n - 1))::HUGEINT AS tp2
  FROM (SELECT count(*) AS n FROM j GROUP BY c, t)
), cc AS (
  SELECT sum(n * (n - 1))::HUGEINT AS pred2, count(*) AS n_clusters
  FROM (SELECT count(*) AS n FROM j GROUP BY c)
), tt AS (
  SELECT sum(n * (n - 1))::HUGEINT AS true2, count(*) AS n_truth
  FROM (SELECT count(*) AS n FROM j GROUP BY t)
), nd AS (
  SELECT count(*) AS n_docs FROM j
), base AS (
  SELECT n_docs, n_clusters, n_truth,
         (tp2 // 2)::BIGINT AS tp_pairs,
         (pred2 // 2)::BIGINT AS pred_pairs,
         (true2 // 2)::BIGINT AS true_pairs
  FROM nd CROSS JOIN ct CROSS JOIN cc CROSS JOIN tt
)
SELECT *,
       pred_pairs - tp_pairs AS fp_pairs,
       true_pairs - tp_pairs AS fn_pairs,
       CASE WHEN pred_pairs = 0 THEN 1000
            ELSE (1000 * tp_pairs) // pred_pairs END AS precision_milli,
       CASE WHEN true_pairs = 0 THEN 1000
            ELSE (1000 * tp_pairs) // true_pairs END AS recall_milli
FROM base
"""


def register(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "q_dedup_audit": q_dedup_audit,
            "q_cross_doc_spans": q_cross_doc_spans,
            "q_source_dup_matrix": q_source_dup_matrix,
            "q_lang_id": q_lang_id,
            "q_ngram_jaccard": q_ngram_jaccard,
            "q_minhash_lsh": q_minhash_lsh,
            "q_dedup_components": q_dedup_components,
            "q_doc_fingerprint": q_doc_fingerprint,
            "q_simhash_near_pairs": q_simhash_near_pairs,
            "q_embedding_near_dups": q_embedding_near_dups,
            "q_ivf_ann": q_ivf_ann,
            "q_prefix_jaccard": q_prefix_jaccard,
            "q_snm_pairs": q_snm_pairs,
            "q_containment_pairs": q_containment_pairs,
            "q_cluster_churn": q_cluster_churn,
            "q_threshold_sweep": q_threshold_sweep,
        }
    )
    oracles.update(
        {
            "q_dedup_audit": SQL_DEDUP_AUDIT,
            "q_cross_doc_spans": SQL_CROSS_DOC_SPANS,
            "q_source_dup_matrix": _sql_source_dup_matrix(),
            "q_lang_id": SQL_LANG_ID,
            "q_ngram_jaccard": SQL_NGRAM_JACCARD,
            "q_minhash_lsh": SQL_MINHASH_LSH,
            "q_dedup_components": SQL_DEDUP_COMPONENTS,
            "q_doc_fingerprint": SQL_DOC_FINGERPRINT,
            "q_simhash_near_pairs": SQL_SIMHASH_NEAR_PAIRS,
            "q_embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
            "q_ivf_ann": SQL_IVF_ANN,
            "q_prefix_jaccard": SQL_PREFIX_JACCARD,
            "q_snm_pairs": SQL_SNM_PAIRS,
            "q_containment_pairs": SQL_CONTAINMENT_PAIRS,
            "q_cluster_churn": SQL_CLUSTER_CHURN,
            "q_threshold_sweep": SQL_THRESHOLD_SWEEP,
        }
    )


# --- X152: dedup-cluster churn (exact Rand index) -----------------------------


def q_cluster_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X152: round-over-round clustering stability (operators/dedup.py
    ::clustering_churn). Old clusters are doc_id div 10; the new round
    moves every doc_id ≡ 0,1,2 (mod 30) into one big cluster 999 — a
    planted merge-heavy churn whose exact Rand index, split count, and
    merge count the oracle recomputes from the same contingency."""
    from .operators.dedup import clustering_churn

    d = _t(spark, sf_dir, "documents")
    old = d.select("doc_id", F.expr("doc_id div 10").alias("cluster_id"))
    new = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 30 < 3, F.lit(999))
        .otherwise(F.expr("doc_id div 10"))
        .alias("cluster_id"),
    )
    return clustering_churn(old, new)


SQL_CLUSTER_CHURN = """
WITH o AS (
  SELECT doc_id, doc_id // 10 AS co FROM documents
), n AS (
  SELECT doc_id,
         CASE WHEN doc_id % 30 < 3 THEN 999 ELSE doc_id // 10 END AS cn
  FROM documents
), cells AS (
  SELECT co, cn, count(*) AS m
  FROM o JOIN n USING (doc_id) GROUP BY co, cn
), si AS (
  SELECT sum(x.s)::HUGEINT AS s, count(*)::BIGINT AS k,
         sum(CASE WHEN x.span > 1 THEN 1 ELSE 0 END)::BIGINT AS splits
  FROM (SELECT co, sum(m) AS ni, count(*) AS span,
               (sum(m)::HUGEINT * (sum(m) - 1)) // 2 AS s
        FROM cells GROUP BY co) x
), sj AS (
  SELECT sum(x.s)::HUGEINT AS s, count(*)::BIGINT AS k,
         sum(CASE WHEN x.span > 1 THEN 1 ELSE 0 END)::BIGINT AS merges
  FROM (SELECT cn, sum(m) AS nj, count(*) AS span,
               (sum(m)::HUGEINT * (sum(m) - 1)) // 2 AS s
        FROM cells GROUP BY cn) x
), sij AS (
  SELECT sum((m::HUGEINT * (m - 1)) // 2)::HUGEINT AS s,
         sum(m)::BIGINT AS n_docs
  FROM cells
)
SELECT sij.n_docs,
       si.k AS clusters_old, sj.k AS clusters_new,
       CASE WHEN sij.n_docs < 2 THEN 1000 ELSE (
         1000 * ((sij.n_docs::HUGEINT * (sij.n_docs - 1)) // 2
                 + 2 * sij.s - si.s - sj.s)
         // ((sij.n_docs::HUGEINT * (sij.n_docs - 1)) // 2)
       )::BIGINT END AS rand_milli,
       si.splits, sj.merges
FROM sij, si, sj
"""


# --- X159: dedup-threshold PR sweep -------------------------------------------


def q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X159: one-pass precision/recall across candidate thresholds
    (operators/dedup.py::threshold_sweep). Scored pairs (d, d+250)
    carry synthetic milli scores (37d mod 1001); truth is every third
    pair — so each threshold's exact confusion counts are pure number
    theory the oracle replays."""
    from .operators.dedup import threshold_sweep

    d = _t(spark, sf_dir, "documents")
    pairs = d.filter(F.col("doc_id") < 250).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 250).alias("doc_b"),
        ((F.col("doc_id") * 37) % 1001).alias("score_milli"),
    )
    truth = d.filter((F.col("doc_id") < 250) & (F.col("doc_id") % 3 == 0)).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 250).alias("doc_b"),
    )
    return threshold_sweep(pairs, truth)


SQL_THRESHOLD_SWEEP = """
WITH pairs AS (
  SELECT doc_id AS doc_a, doc_id + 250 AS doc_b,
         (doc_id * 37) % 1001 AS score
  FROM documents WHERE doc_id < 250
), truth AS (
  SELECT doc_id AS doc_a, doc_id + 250 AS doc_b
  FROM documents WHERE doc_id < 250 AND doc_id % 3 = 0
), j AS (
  SELECT p.score, (t.doc_a IS NOT NULL) AS is_true
  FROM pairs p LEFT JOIN truth t USING (doc_a, doc_b)
), thr AS (SELECT unnest([500, 600, 700, 800, 900]) AS threshold)
SELECT thr.threshold::BIGINT AS threshold,
       sum(CASE WHEN j.score >= thr.threshold THEN 1 ELSE 0 END)::BIGINT
         AS n_predicted,
       sum(CASE WHEN j.is_true THEN 1 ELSE 0 END)::BIGINT AS n_truth,
       sum(CASE WHEN j.score >= thr.threshold AND j.is_true
                THEN 1 ELSE 0 END)::BIGINT AS tp,
       CASE WHEN sum(CASE WHEN j.score >= thr.threshold THEN 1 ELSE 0 END) = 0
            THEN 1000
            ELSE (1000 * sum(CASE WHEN j.score >= thr.threshold AND j.is_true
                                  THEN 1 ELSE 0 END))
                 // sum(CASE WHEN j.score >= thr.threshold THEN 1 ELSE 0 END)
       END::BIGINT AS precision_milli,
       CASE WHEN sum(CASE WHEN j.is_true THEN 1 ELSE 0 END) = 0 THEN 1000
            ELSE (1000 * sum(CASE WHEN j.score >= thr.threshold AND j.is_true
                                  THEN 1 ELSE 0 END))
                 // sum(CASE WHEN j.is_true THEN 1 ELSE 0 END)
       END::BIGINT AS recall_milli
FROM j CROSS JOIN thr
GROUP BY thr.threshold
"""
