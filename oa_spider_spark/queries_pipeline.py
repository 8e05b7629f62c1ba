"""Training-pipeline query registrations (operators/pipeline.py) —
corpus curation over `documents`/`embeddings`/`events`: dedup keep-policy,
stratified sampling, vocab stats, chunking, contamination screen, PII
scrub, quantized centroids, sessionization. Every query carries a full
DuckDB value oracle (portable md5h60 for hash-dependent ops, integer
quantization for float aggregation).

Registered into the main QUERIES/ORACLES maps by
`queries.py::_register_pipeline` (which passes SQL_MINHASH_LSH in so the
dedup-keep oracle can reuse the pair-pipeline CTE without a circular
import).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- X20: dedup keep-policy (cluster representatives) ---------------------

def q_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus: MinHash-LSH pairs → connected components
    → one representative per cluster (max n_chars, tie min doc_id);
    singletons keep themselves. This is the actual "drop the dups"
    step a training pipeline runs after q_dedup_components."""
    from .operators.dedup import connected_components, minhash_dedup
    from .operators.pipeline import cluster_representatives

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_dedup(docs, threshold=0.8, portable=True)
    comp = connected_components(pairs)
    return cluster_representatives(docs, comp, prefer_col="n_chars")


def _sql_dedup_keep(sql_minhash_lsh: str) -> str:
    return f"""
WITH RECURSIVE pairs AS ({sql_minhash_lsh}
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
), labeled AS (
  SELECT d.doc_id, coalesce(l.component_id, d.doc_id) AS component_id,
         d.n_chars
  FROM documents d LEFT JOIN lbl l USING (doc_id)
), ranked AS (
  SELECT doc_id, component_id, n_chars AS rep_len,
         count(*) OVER (PARTITION BY component_id) AS n_members,
         row_number() OVER (
           PARTITION BY component_id ORDER BY n_chars DESC, doc_id ASC
         ) AS rk
  FROM labeled
)
SELECT doc_id, component_id, rep_len, n_members FROM ranked WHERE rk = 1
"""


# --- X21: deterministic stratified sampling -------------------------------

STRAT_RATES = {"en": 500, "zh": 300}
STRAT_DEFAULT = 100


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix control: keep 50% of en, 30% of zh, 10% of the rest,
    decided by a pure hash of doc_id (retry-safe, partition-invariant —
    no RNG; see operators/pipeline.py scale notes)."""
    from .operators.pipeline import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(
        docs, STRAT_RATES, default_permille=STRAT_DEFAULT
    ).select("doc_id", "lang", "strat_key")


SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang,
       CAST(('0x' || substr(md5('strat:' || doc_id::VARCHAR), 1, 15))::BIGINT
            % 1000 AS INT) AS strat_key
FROM documents
WHERE ('0x' || substr(md5('strat:' || doc_id::VARCHAR), 1, 15))::BIGINT % 1000
      < (CASE lang WHEN 'en' THEN {STRAT_RATES['en']}
                   WHEN 'zh' THEN {STRAT_RATES['zh']}
                   ELSE {STRAT_DEFAULT} END)
"""


# --- X22: document-frequency top-k (vocab / stopword stats) ---------------

def q_df_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus document frequency, top 20 tokens — TakeOrderedAndProject,
    never a global sort (guardrailed in tests/test_plans.py)."""
    from .operators.pipeline import doc_frequency_topk

    return doc_frequency_topk(_t(spark, sf_dir, "documents"), k=20)


SQL_DF_STOPWORDS = """
SELECT token, count(*) AS df FROM (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
) GROUP BY token
ORDER BY df DESC, token ASC
LIMIT 20
"""


# --- X23: context-window chunking -----------------------------------------

def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-token windows, stride 24 — context-window packing.
    Portable chunk hash so the oracle checks the text bytes too."""
    from .operators.pipeline import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=32, stride=24
    )


SQL_DOC_CHUNKS = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), s AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, greatest(len(toks) - 1, 0), 24)) AS st
  FROM t
), c AS (
  SELECT doc_id,
         CAST(st // 24 AS INT) AS chunk_idx,
         CAST(st AS INT) AS start_tok,
         CAST(len(list_slice(toks, st + 1, st + 32)) AS INT) AS n_chunk_tokens,
         array_to_string(list_slice(toks, st + 1, st + 32), ' ') AS chunk_text
  FROM s
)
SELECT doc_id, chunk_idx, start_tok, n_chunk_tokens, chunk_text,
       ('0x' || substr(md5(chunk_text), 1, 15))::BIGINT AS chunk_hash
FROM c
"""


# --- X24: benchmark-contamination screen ----------------------------------

def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination: docs with doc_id % 23 == 0 play the benchmark
    set; every other doc is scored by the fraction of its word 5-grams
    that appear anywhere in the benchmark (broadcast shingle set)."""
    from .operators.pipeline import contamination_check

    docs = _t(spark, sf_dir, "documents")
    probe = docs.filter(F.col("doc_id") % 23 != 0)
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    return contamination_check(probe, bench, gram_words=5, flag_ratio=0.1)


SQL_CONTAMINATION = """
WITH grams AS (
  SELECT doc_id,
         ('0x' || substr(md5(g), 1, 15))::BIGINT AS gram_hash
  FROM (
    SELECT DISTINCT doc_id,
           array_to_string(list_slice(toks, i, i + 4), ' ') AS g
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         LATERAL unnest(generate_series(1, greatest(len(toks) - 4, 1))) u(i)
  )
), bench AS (
  SELECT DISTINCT gram_hash FROM grams WHERE doc_id % 23 = 0
), scored AS (
  SELECT g.doc_id,
         count(*) AS n_shingles,
         CAST(sum(CASE WHEN b.gram_hash IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_overlap
  FROM grams g LEFT JOIN bench b USING (gram_hash)
  WHERE g.doc_id % 23 <> 0
  GROUP BY g.doc_id
)
SELECT doc_id, n_shingles, n_overlap,
       round(n_overlap * 1.0 / n_shingles, 6) AS contam_ratio,
       n_overlap * 1.0 / n_shingles >= 0.1 AS contaminated
FROM scored
"""


# --- X25: PII redaction ----------------------------------------------------

def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over deterministically augmented text (each doc gets a
    synthetic 'contact <email> tel <11-digit phone>' footer — the
    corpus itself is plain words, so the footer is the planted PII the
    scrub must find). Counts from the raw text; emails replaced before
    phones."""
    from .operators.pipeline import redact_pii

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        did.cast("string"),
        # '+tag' local part and '-host' domain exercise the '+'/'-'
        # character classes (a scrub missing them leaves '-host.example
        # .com' behind — the ADVICE r03 leak)
        F.lit("+tag@mail"),
        (did % 10).cast("string"),
        F.lit("-host.example.com tel 13"),
        F.lpad(((did * 7919) % 1000000000).cast("string"), 9, "0"),
    )
    return redact_pii(d.withColumn("aug", aug), text_col="aug")


SQL_PII_REDACT = r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id::VARCHAR || '+tag@mail'
              || (doc_id % 10)::VARCHAR || '-host.example.com tel 13'
              || lpad(((doc_id * 7919) % 1000000000)::VARCHAR, 9, '0') AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._+-]+@[A-Za-z0-9.-]+')) AS INT)
           AS n_emails,
       CAST(len(regexp_extract_all(t, '\b1[0-9]{10}\b')) AS INT) AS n_phones,
       regexp_replace(
         regexp_replace(t, '[A-Za-z0-9._+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
         '\b1[0-9]{10}\b', '<PHONE>', 'g'
       ) AS redacted
FROM aug
"""


# --- X26: quantized per-language embedding centroid -----------------------

def q_lang_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language centroid in integer micro-units: quantize-then-sum
    makes a distributed float aggregation exact and value-oracle-able
    (float sums are accumulation-order-dependent; integer sums are not)."""
    from .operators.pipeline import lang_centroid_quantized

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    return lang_centroid_quantized(docs, emb)


SQL_LANG_CENTROID = """
WITH x AS (
  SELECT d.lang,
         CAST(generate_subscripts(e.embedding, 1) - 1 AS INT) AS dim,
         CAST(floor(CAST(unnest(e.embedding) AS DOUBLE) * 1000000.0)
              AS BIGINT) AS q
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
)
SELECT lang, dim, count(*) AS n,
       CAST(sum(q) AS BIGINT) AS sum_q,
       CAST(floor(CAST(sum(q) AS BIGINT) * 1.0 / count(*)) AS BIGINT) AS mean_q
FROM x GROUP BY lang, dim
"""


# --- X27: sessionization (per-session granularity; the summary-level
# q_sessionize in queries.py predates this and stays) ---------------------------------------------------

SESSION_GAP_S = 21600


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (6 h) over the event log, integer-microsecond
    time math, per-user partitioned windows."""
    from .operators.pipeline import sessionize

    return sessionize(_t(spark, sf_dir, "events"), gap_s=SESSION_GAP_S)


SQL_SESSIONIZE = f"""
WITH t AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {SESSION_GAP_S * 1_000_000}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), s AS (
  SELECT user_id, us,
         CAST(sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS session_seq
  FROM t
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(us) AS start_us, max(us) AS end_us,
       max(us) - min(us) AS duration_us
FROM s GROUP BY user_id, session_seq
"""


# --- X38: incremental (new-batch-vs-corpus) near-dup disposition ----------

def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-increment shape: docs with doc_id % 5 == 0 play the new
    batch, the rest the existing corpus. Every new doc gets a
    disposition row: dup_of = best corpus match at Jaccard >= 0.8 (max
    jaccard, tie min corpus id) or NULL if novel. The corpus is never
    self-joined and never re-shingled per batch (operators/dedup.py::
    incremental_near_dups)."""
    from .operators.dedup import incremental_near_dups

    docs = _t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    out = incremental_near_dups(new, corpus, threshold=0.8, portable=True)
    return out.select(
        "doc_id", "dup_of", F.round("jaccard", 6).alias("jaccard")
    )


# Independent DuckDB twin: same portable hashes, but candidates come from
# a new×corpus band join (never corpus×corpus) and every new doc keeps a
# row via the final LEFT JOIN.
SQL_INCREMENTAL_DEDUP = """
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
  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), verified AS (
  SELECT doc_a, doc_b, n_inter * 1.0 / (za.sz + zb.sz - n_inter) AS j
  FROM (
    SELECT doc_a, doc_b, count(*) AS n_inter
    FROM cand
    JOIN sh sa ON sa.doc_id = doc_a
    JOIN sh sb ON sb.doc_id = doc_b AND sb.shingle_hash = sa.shingle_hash
    GROUP BY doc_a, doc_b
  )
  JOIN sizes za ON za.doc_id = doc_a
  JOIN sizes zb ON zb.doc_id = doc_b
  WHERE n_inter * 1.0 / (za.sz + zb.sz - n_inter) >= 0.8
), best AS (
  SELECT doc_a, doc_b, j,
         row_number() OVER (PARTITION BY doc_a ORDER BY j DESC, doc_b ASC) AS rk
  FROM verified
)
SELECT n.doc_id, b.doc_b AS dup_of, round(b.j, 6) AS jaccard
FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) n
LEFT JOIN best b ON b.doc_a = n.doc_id AND b.rk = 1
"""


# --- X89: temperature-balanced corpus allocation ---------------------------


def q_temperature_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilingual resampling targets at alpha = 1/2 (mT5/XLM-R
    temperature sampling): per-language doc budget ∝ isqrt(n_l·10⁶),
    largest-remainder rounding so the targets sum to the budget
    EXACTLY. One corpus-sized count shuffle; all the allocation math
    runs on the #languages-row frame in pure integers
    (operators/pipeline.py::temperature_targets)."""
    from .operators.pipeline import temperature_targets

    docs = _t(spark, sf_dir, "documents")
    return temperature_targets(docs, group_col="lang", total=20000)


# The oracle recomputes the whole allocation independently: DuckDB's own
# sqrt seeds the same ±1 integer fix-up (the fix-up makes isqrt exact on
# both engines, so differing libms cannot diverge), `//` on the
# non-negative quotient matches Spark's `div`, and the largest-remainder
# ranking uses the identical (rem DESC, lang) tie-break.
SQL_TEMPERATURE_TARGETS = """
WITH c AS (
  SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang
), m AS (
  SELECT lang, n_docs, n_docs * 1000000 AS mm FROM c
), s AS (
  SELECT lang, n_docs, mm,
         CAST(FLOOR(SQRT(mm::DOUBLE)) AS BIGINT) AS s0
  FROM m
), w AS (
  SELECT lang, n_docs,
         s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= mm THEN 1 ELSE 0 END)
            - (CASE WHEN s0 * s0 > mm THEN 1 ELSE 0 END) AS weight
  FROM s
), t AS (
  SELECT lang, n_docs, weight,
         SUM(weight) OVER () AS w_tot,
         20000 * weight AS num
  FROM w
), b AS (
  SELECT lang, n_docs, weight,
         num // w_tot AS base, num % w_tot AS rem
  FROM t
), d AS (
  SELECT lang, n_docs, weight, base,
         20000 - SUM(base) OVER () AS deficit,
         row_number() OVER (ORDER BY rem DESC, lang) AS rk
  FROM b
)
SELECT lang, n_docs, weight,
       (base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END)::BIGINT
         AS target_docs
FROM d
"""


# --- X123: embedding-centroid drift monitor ----------------------------------


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X123: per-language centroid drift (operators/pipeline.py::
    embedding_drift). The 'new' snapshot is the SAME vector set with a
    +0.25 shift injected into dimension 0 for en/zh documents only —
    natural sampling noise is exactly zero, so the monitor must read
    ~250000 micro L1 (the quantized shift) for en/zh and 0 elsewhere;
    threshold 100000 flags precisely the shifted languages. Float
    discipline: the shift is F.lit(0.25) / 0.25::DOUBLE with identical
    expression shape both engines (CLAUDE.md)."""
    from .operators.pipeline import embedding_drift

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    joined = emb.join(
        docs.select(F.col("doc_id").alias("vec_id"), "lang"), "vec_id"
    )
    shifted = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(
            (i == 0) & F.col("lang").isin("en", "zh"), x + F.lit(0.25)
        ).otherwise(x),
    )
    new = joined.select("vec_id", shifted.alias("embedding"))
    return embedding_drift(docs, emb, new, threshold_micro=100_000)


SQL_EMBEDDING_DRIFT = """
WITH d AS (
  SELECT doc_id, lang FROM documents
), x AS (
  SELECT d.lang,
         CAST(generate_subscripts(e.embedding, 1) - 1 AS INT) AS dim,
         CAST(unnest(e.embedding) AS DOUBLE) AS x
  FROM d JOIN embeddings e ON d.doc_id = e.vec_id
), old AS (
  SELECT lang, dim,
         CAST(floor(CAST(sum(floor(x * 1000000.0)) AS BIGINT) * 1.0
                    / count(*)) AS BIGINT) AS m
  FROM x GROUP BY lang, dim
), newx AS (
  SELECT lang, dim,
         CASE WHEN dim = 0 AND lang IN ('en', 'zh')
              THEN x + 0.25::DOUBLE ELSE x END AS x
  FROM x
), neww AS (
  SELECT lang, dim,
         CAST(floor(CAST(sum(floor(x * 1000000.0)) AS BIGINT) * 1.0
                    / count(*)) AS BIGINT) AS m
  FROM newx GROUP BY lang, dim
)
SELECT o.lang, count(*) AS n_dims,
       sum(abs(o.m - n.m))::BIGINT AS l1_micro,
       max(abs(o.m - n.m))::BIGINT AS max_dim_micro,
       sum(abs(o.m - n.m)) > 100000 AS drifted
FROM old o JOIN neww n ON o.lang = n.lang AND o.dim = n.dim
GROUP BY o.lang
"""


def register(
    queries: dict[str, Callable[[SparkSession, str], DataFrame]],
    oracles: dict[str, str],
    sql_minhash_lsh: str,
) -> None:
    queries.update(
        {
            "q_dedup_keep": q_dedup_keep,
            "q_stratified_sample": q_stratified_sample,
            "q_df_stopwords": q_df_stopwords,
            "q_doc_chunks": q_doc_chunks,
            "q_contamination": q_contamination,
            "q_grouped_topk": q_grouped_topk,
            "q_pii_redact": q_pii_redact,
            "q_lang_centroid": q_lang_centroid,
            "q_embedding_drift": q_embedding_drift,
            "q_user_sessions": q_sessionize,
            "q_incremental_dedup": q_incremental_dedup,
            "q_temperature_targets": q_temperature_targets,
        }
    )
    oracles.update(
        {
            "q_dedup_keep": _sql_dedup_keep(sql_minhash_lsh),
            "q_stratified_sample": SQL_STRATIFIED_SAMPLE,
            "q_df_stopwords": SQL_DF_STOPWORDS,
            "q_doc_chunks": SQL_DOC_CHUNKS,
            "q_contamination": SQL_CONTAMINATION,
            "q_grouped_topk": SQL_GROUPED_TOPK,
            "q_pii_redact": SQL_PII_REDACT,
            "q_lang_centroid": SQL_LANG_CENTROID,
            "q_embedding_drift": SQL_EMBEDDING_DRIFT,
            "q_user_sessions": SQL_SESSIONIZE,
            "q_incremental_dedup": SQL_INCREMENTAL_DEDUP,
            "q_temperature_targets": SQL_TEMPERATURE_TARGETS,
        }
    )


# --- X164: generic grouped top-k by score ----------------------------------


def q_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X164: top-5 events by exact cent value per event_type
    (operators/pipeline.py::grouped_topk — the two-level cutoff form,
    below-cutoff cells discarded before any window). Oracle is the
    plain per-group window DuckDB can afford at sf0.01."""
    from .operators.pipeline import grouped_topk

    e = _t(spark, sf_dir, "events")
    rows = e.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return grouped_topk(
        rows, group_cols=["event_type"], score_col="cents",
        id_col="event_id", k=5,
    )


SQL_GROUPED_TOPK = """
SELECT event_type, event_id, cents, rank FROM (
  SELECT event_type, event_id,
         CAST(round(value * 100, 0) AS BIGINT) AS cents,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY CAST(round(value * 100, 0) AS BIGINT) DESC, event_id
         )::BIGINT AS rank
  FROM events
) WHERE rank <= 5
"""
