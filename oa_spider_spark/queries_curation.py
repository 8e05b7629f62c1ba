"""Corpus-curation and graph-analysis query registrations (round 4):
repetition quality rules, integer TF-IDF, co-occurrence triangles,
deterministic hash splits. Every query carries a full DuckDB value
oracle in the repo's exact-integer discipline (milli-unit fractions via
integer div, portable md5h60 where assignment depends on a hash).

Registered into the main QUERIES/ORACLES maps by
`queries.py::_register_curation`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- X53: repetition / boilerplate quality rules ----------------------------


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document — top-word /
    top-bigram / distinct-word fractions in exact integer milli-units
    plus the keep/drop verdict (operators/text.py::repetition_stats).
    The curation rule family a training pipeline runs after dedup."""
    from .operators.text import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


SQL_REPETITION_STATS = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), words AS (
  SELECT doc_id, unnest(t) AS w FROM toks
), wc AS (
  SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w
), ws AS (
  SELECT doc_id, max(c) AS top_word_cnt, count(*) AS n_distinct,
         sum(c)::BIGINT AS n_words
  FROM wc GROUP BY doc_id
), bigr AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(2, len(t)),
                               i -> t[i-1] || ' ' || t[i])) AS b
  FROM toks WHERE len(t) >= 2
), bc AS (
  SELECT doc_id, b, count(*) AS c FROM bigr GROUP BY doc_id, b
), bs AS (
  SELECT doc_id, max(c) AS top_bigram_cnt, sum(c)::BIGINT AS n_bigrams
  FROM bc GROUP BY doc_id
)
SELECT ws.doc_id,
       n_words,
       ((top_word_cnt * 1000) // n_words)::BIGINT AS top_word_milli,
       coalesce((top_bigram_cnt * 1000) // n_bigrams, 0)::BIGINT
         AS top_bigram_milli,
       ((n_distinct * 1000) // n_words)::BIGINT AS distinct_milli,
       ((n_distinct * 1000) // n_words >= 300
        AND coalesce((top_bigram_cnt * 1000) // n_bigrams, 0) <= 60) AS keep
FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
"""


# --- X54: integer TF-IDF top terms ------------------------------------------


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by the all-integer
    rarity-weighted score (tf·1000·N div df) — TF-IDF ranking with the
    monotone log dropped for cross-engine bit-stability
    (operators/text.py::tfidf_top_terms)."""
    from .operators.text import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


SQL_TFIDF_TOP_TERMS = r"""
WITH words AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM words GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         ((tf.tf * 1000 * n.n_docs) // df.df)::BIGINT AS score_milli
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, score_milli,
       rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score_milli DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= 3
"""


# --- X55: co-occurrence graph triangles -------------------------------------


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the user co-occurrence graph (users sharing
    an (event_type, minute) activity bucket): one row (n_nodes,
    n_edges, n_triangles). Degree-oriented counting bounds every wedge
    fan-out at O(√m) — the hub-safe formulation (operators/graph.py::
    triangle_count); hot buckets are dropped by the shared
    `_cap_groups` guard before the pair join (cap 64). (The hour-bucket
    variant of this graph at sf0.1 is 789k edges / 197M triangles and
    counts in ~30 s at local[16] — the minute bucket is the
    realistically sparse graph.)"""
    from .operators.graph import cooccurrence_edges, triangle_count

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("minute", "ts").alias("tb"), "user_id"
    )
    edges = cooccurrence_edges(
        ev, node_col="user_id", group_cols=("event_type", "tb"), cap=64
    )
    return triangle_count(edges)


SQL_TRIANGLE_COUNT = """
WITH g AS (
  SELECT DISTINCT event_type, date_trunc('minute', ts) AS tb, user_id FROM events
), gc AS (
  SELECT *, count(*) OVER (PARTITION BY event_type, tb) AS gsz FROM g
), gf AS (
  SELECT event_type, tb, user_id FROM gc WHERE gsz <= 64
), edges AS (
  SELECT DISTINCT a.user_id AS u, b.user_id AS v
  FROM gf a JOIN gf b USING (event_type, tb)
  WHERE a.user_id < b.user_id
), deg AS (
  SELECT n, count(*) AS d FROM (
    SELECT u AS n FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY n
), o AS (
  SELECT CASE WHEN fwd THEN u ELSE v END AS src,
         CASE WHEN fwd THEN v ELSE u END AS dst,
         CASE WHEN fwd THEN dv ELSE du END AS ddst
  FROM (
    SELECT e.u, e.v, a.d AS du, b.d AS dv,
           (a.d < b.d OR (a.d = b.d AND e.u < e.v)) AS fwd
    FROM edges e JOIN deg a ON a.n = e.u JOIN deg b ON b.n = e.v
  )
), wedges AS (
  SELECT w1.dst AS b, w2.dst AS c
  FROM o w1 JOIN o w2 ON w1.src = w2.src
  WHERE w1.ddst < w2.ddst OR (w1.ddst = w2.ddst AND w1.dst < w2.dst)
), closed AS (
  SELECT 1 FROM wedges w
  WHERE EXISTS (SELECT 1 FROM o WHERE o.src = w.b AND o.dst = w.c)
)
SELECT (SELECT count(*) FROM deg) AS n_nodes,
       (SELECT count(*) FROM edges) AS n_edges,
       (SELECT count(*) FROM closed) AS n_triangles
"""


# --- X56: deterministic train/val/test hash split ---------------------------


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document train/val/test assignment by hash bucket (80/10/10)
    — stable under corpus growth, zero shuffle (operators/pipeline.py::
    hash_split). Portable md5h60 so the oracle reproduces every
    assignment; xxhash64 is the scale default."""
    from .operators.pipeline import hash_split

    docs = _t(spark, sf_dir, "documents")
    return hash_split(docs, key_col="doc_id", portable=True).select(
        "doc_id", "split"
    )


SQL_HASH_SPLIT = """
SELECT doc_id,
       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT
           % 100 AS b
  FROM documents
)
"""


# --- X59: per-group exactly-k hash sample ------------------------------------


def q_grouped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 documents per language by hash rank — the balanced-
    mixture sampler, built as cutoff-prefilter + metadata-sized window
    so no task ever sorts a whole language partition
    (operators/pipeline.py::grouped_sample_exact_k)."""
    from .operators.pipeline import grouped_sample_exact_k

    docs = _t(spark, sf_dir, "documents")
    return grouped_sample_exact_k(
        docs, group_col="lang", key_col="doc_id", k=20, portable=True
    ).select("doc_id", "lang", "rank")


SQL_GROUPED_SAMPLE = """
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('gsamp:' || doc_id::VARCHAR), 1, 15))::BIGINT AS hh
  FROM documents
), c AS (
  SELECT lang, count(*) AS n_g FROM documents GROUP BY lang
), s AS (
  SELECT h.doc_id, h.lang, h.hh,
         CASE WHEN c.n_g <= 160 THEN 1152921504606846976
              ELSE (1152921504606846976 // c.n_g) * 160 END AS cutoff
  FROM h JOIN c USING (lang)
)
SELECT doc_id, lang, rank FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rank
  FROM s WHERE hh < cutoff
) WHERE rank <= 20
"""


# --- X70: ordered funnel analysis ------------------------------------------------


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel per user — view → click → purchase, each
    step's timestamp the EARLIEST occurrence strictly after the prior
    step (the product-analytics funnel, not mere set membership: a
    purchase before the first view does not count). Three keyed
    aggregations chained by join — no window over the whole event
    stream, no Python; missing steps carry the −1 sentinel so the
    result is NULL-free and value-hashable."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    base = ev.select("user_id").distinct()
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_view"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("us") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_click"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("us") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_purchase"))
    )
    out = (
        base.join(t1, "user_id", "left")
        .join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
    )
    depth = (
        F.col("t_view").isNotNull().cast("int")
        + F.col("t_click").isNotNull().cast("int")
        + F.col("t_purchase").isNotNull().cast("int")
    )
    return out.select(
        "user_id",
        F.coalesce("t_view", F.lit(-1)).alias("t_view"),
        F.coalesce("t_click", F.lit(-1)).alias("t_click"),
        F.coalesce("t_purchase", F.lit(-1)).alias("t_purchase"),
        depth.cast("int").alias("depth"),
    )


SQL_FUNNEL_STEPS = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), base AS (SELECT DISTINCT user_id FROM e),
t1 AS (
  SELECT user_id, min(us) AS t_view FROM e WHERE event_type = 'view'
  GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(us) AS t_click
  FROM e JOIN t1 USING (user_id)
  WHERE event_type = 'click' AND us > t_view
  GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(us) AS t_purchase
  FROM e JOIN t2 USING (user_id)
  WHERE event_type = 'purchase' AND us > t_click
  GROUP BY e.user_id
)
SELECT base.user_id,
       coalesce(t_view, -1) AS t_view,
       coalesce(t_click, -1) AS t_click,
       coalesce(t_purchase, -1) AS t_purchase,
       ((t_view IS NOT NULL)::INT + (t_click IS NOT NULL)::INT
        + (t_purchase IS NOT NULL)::INT)::INT AS depth
FROM base
LEFT JOIN t1 USING (user_id)
LEFT JOIN t2 USING (user_id)
LEFT JOIN t3 USING (user_id)
"""


# --- X69: new-vs-returning daily actives ----------------------------------------


def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day activity split by first-touch attribution: events,
    distinct active users, and how many of them are NEW that day (their
    first event ever). Two aggregations + one join on the user key —
    the growth-analytics staple, exact by construction (date_trunc and
    counts only). At corpus scale the first-seen table is user-sized
    and persistable; each new day appends via min-merge — the same
    incremental-index pattern as the Bloom seen-set."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = ev.join(first, "user_id")
    return (
        j.groupBy("day")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct(
                F.when(F.col("day") == F.col("first_day"), F.col("user_id"))
            ).alias("n_new_users"),
        )
        .withColumn(
            "n_returning", (F.col("n_users") - F.col("n_new_users")).cast("long")
        )
    )


SQL_NEW_VS_RETURNING = """
WITH e AS (
  SELECT user_id, date_trunc('day', ts) AS day FROM events
), first AS (
  SELECT user_id, min(day) AS first_day FROM e GROUP BY user_id
)
SELECT day,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT CASE WHEN day = first_day THEN user_id END) AS n_new_users,
       (count(DISTINCT user_id)
        - count(DISTINCT CASE WHEN day = first_day THEN user_id END))::BIGINT
         AS n_returning
FROM e JOIN first USING (user_id)
GROUP BY day
"""


# --- X68: grouped exact-OLS trend -----------------------------------------------


def q_grouped_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trend of event value over time: exact integer OLS slope
    in micro-units (operators/pipeline.py::grouped_trend) — x = epoch
    seconds, y = value cents. The segment-metric-trend aggregate with a
    value-exact oracle (DECIMAL sums + the exact-division trick)."""
    from .operators.pipeline import grouped_trend

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").alias("xs"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return grouped_trend(ev, "user_id", "xs", "cents")


SQL_GROUPED_TREND = """
WITH e AS (
  SELECT user_id, (epoch_us(ts) // 1000000)::BIGINT AS xs,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
), g AS (
  SELECT user_id, min(xs) AS x0 FROM e GROUP BY user_id
), d AS (
  SELECT e.user_id, (xs - x0)::HUGEINT AS x, cents::HUGEINT AS y
  FROM e JOIN g USING (user_id)
), s AS (
  SELECT user_id, count(*)::HUGEINT AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM d GROUP BY user_id
), c AS (
  SELECT user_id, n::BIGINT AS n_rows,
         (n * sxy - sx * sy) * 1000000 AS nm,
         (n * sxx - sx * sx) AS den
  FROM s
)
SELECT user_id, n_rows,
       CASE WHEN den = 0 THEN NULL
            ELSE ((nm - ((nm % den + den) % den)) // den)::BIGINT
       END AS slope_micro
FROM c
"""


# --- X67: corpus-trained bigram fluency score ----------------------------------


def q_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/KenLM-style LM quality filter as an exact-integer twin:
    mean corpus-transition frequency per document
    (operators/text.py::bigram_fluency) — garbled word order scores
    low, common phrasing high; no logs, no floats, value-exact oracle."""
    from .operators.text import bigram_fluency

    return bigram_fluency(_t(spark, sf_dir, "documents"))


SQL_BIGRAM_FLUENCY = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), db AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(2, len(t)), i -> t[i-1])) AS w1,
         unnest(list_transform(generate_series(2, len(t)), i -> t[i])) AS w2
  FROM toks WHERE len(t) >= 2
), model_bi AS (
  SELECT w1, w2, count(*) AS c_ab FROM db GROUP BY w1, w2
), model_uni AS (
  SELECT w1, count(*) AS c_a FROM db GROUP BY w1
)
SELECT doc_id,
       (sum((1000000 * c_ab) // c_a) // count(*))::BIGINT AS score_micro,
       count(*) AS n_bigrams
FROM db JOIN model_bi USING (w1, w2) JOIN model_uni USING (w1)
GROUP BY doc_id
"""


# --- X65: hopping (sliding) window rates --------------------------------------

_HOP_SLIDE_US = 5 * 60 * 1_000_000
_HOP_WIDTH_US = 10 * 60 * 1_000_000


def q_hopping_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event counts and exact cent totals over 10-minute
    windows hopping every 5 — each event lands in W/S = 2 overlapping
    windows via Spark's native F.window (one explode + one groupBy;
    state cost W/S × tumbling). Completes the window family: tumbling
    (X41), session (X44), hopping (this). The oracle replicates
    F.window's assignment rule — wstart = floor(t/S)·S − k·S,
    k ∈ {0,1} — in integer epoch-micro arithmetic."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    w = F.window("ts", "10 minutes", "5 minutes")
    return (
        ev.select("event_type", F.col("ts"), cents.alias("c"))
        .groupBy("event_type", w.alias("w"))
        .agg(F.count("*").alias("n_events"), F.sum("c").alias("value_cents"))
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            "n_events",
            "value_cents",
        )
    )


SQL_HOPPING_RATES = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS tu,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
), x AS (
  SELECT event_type, c,
         make_timestamp((tu // {_HOP_SLIDE_US}) * {_HOP_SLIDE_US}
                        - k * {_HOP_SLIDE_US}) AS window_start
  FROM e, unnest([0, 1]) AS t(k)
)
SELECT event_type, window_start,
       count(*) AS n_events, sum(c)::BIGINT AS value_cents
FROM x GROUP BY event_type, window_start
"""


# --- X64: k-NN majority-vote classification -----------------------------------


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label the first 10 embedding vectors by the majority label of
    their 5 exact-cosine nearest neighbors among the rest
    (operators/similarity.py::knn_classify). Ranking on the rounded
    similarity both engines, plurality ties to the smaller label."""
    from .operators.similarity import knn_classify

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return knn_classify(
        emb.filter(F.col("vec_id") >= 10), emb.filter(F.col("vec_id") < 10), k=5
    )


SQL_KNN_CLASSIFY = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe, label AS true_label
  FROM embeddings WHERE vec_id < 10
), sims AS (
  SELECT q.query_id, q.true_label, e.vec_id, e.label,
         round(list_dot_product(e.embedding::DOUBLE[], q.qe)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qe, q.qe))), 6) AS cos_sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id >= 10
), nn AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS nn_rank
    FROM sims
  ) WHERE nn_rank <= 5
), votes AS (
  SELECT query_id, true_label, label, count(*) AS votes
  FROM nn GROUP BY query_id, true_label, label
)
SELECT query_id, label AS pred_label, votes, true_label,
       (label = true_label) AS correct
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY votes DESC, label ASC) AS vr
  FROM votes
) WHERE vr = 1
"""


# --- X63: runtime Bloom-filter join -------------------------------------------


def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents semi-joined to a key set (long English doc_ids) through
    the sharded Bloom prefilter + exact confirm
    (operators/pipeline.py::bloom_filter_join) — row-identical to the
    plain semi-join, which IS the oracle; the Bloom only decides who
    pays the shuffle."""
    from .operators.pipeline import bloom_filter_join

    docs = _t(spark, sf_dir, "documents")
    keys = docs.filter(
        (F.col("lang") == "en") & (F.col("n_chars") >= 400)
    ).select("doc_id")
    return bloom_filter_join(docs, keys, "doc_id", how="left_semi").select(
        "doc_id", "lang", "n_chars"
    )


SQL_BLOOM_SEMI_JOIN = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE doc_id IN (
  SELECT doc_id FROM documents WHERE lang = 'en' AND n_chars >= 400
)
"""


# --- X62: SCD2 entity state history -------------------------------------------


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user state intervals from the event stream (state =
    event_type): version, [valid_from, valid_to) with a fixed open-end
    sentinel, and the run's event count — gaps-and-islands + groupBy,
    the SCD type-2 build (operators/temporal.py::scd2_history)."""
    from .operators.temporal import scd2_history

    ev = _t(spark, sf_dir, "events")
    return scd2_history(
        ev, key="user_id", ts_col="ts", tiebreak_col="event_id",
        state_col="event_type",
    )


SQL_SCD2_HISTORY = """
WITH chg AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS c
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), isl AS (
  SELECT *, sum(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS version
  FROM chg
), runs AS (
  SELECT user_id, version,
         min(event_type) AS event_type,
         min(ts) AS valid_from,
         count(*) AS n_events
  FROM isl GROUP BY user_id, version
)
SELECT user_id, version, event_type, valid_from,
       coalesce(lead(valid_from) OVER (PARTITION BY user_id ORDER BY version),
                TIMESTAMP '2100-01-01 00:00:00') AS valid_to,
       n_events
FROM runs
"""


# --- X61: ROLLUP multi-granularity report ------------------------------------


def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order value by (priority, year) with ROLLUP subtotals and a
    grand total in one pass — grouping sets compute every granularity
    in a single shuffle instead of N aggregations + union (the Spark
    `rollup` relational op; exact cent units). Subtotal keys are
    coalesced to 'ALL'/-1 so the result is NULL-free and value-hashable;
    gid disambiguates the levels."""
    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    yr = F.year("o_orderdate").cast("long")
    rolled = (
        orders.select(
            F.col("o_orderpriority").alias("priority"), yr.alias("yr"), cents.alias("c")
        )
        .rollup("priority", "yr")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum("c").alias("value_cents"),
            F.count("*").alias("n_orders"),
        )
    )
    return rolled.select(
        F.coalesce("priority", F.lit("ALL")).alias("priority"),
        F.coalesce("yr", F.lit(-1)).alias("yr"),
        F.col("gid").cast("long").alias("gid"),
        "value_cents",
        "n_orders",
    )


SQL_ROLLUP_ORDERS = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(yr, -1)::BIGINT AS yr,
       GROUPING(o_orderpriority, yr)::BIGINT AS gid,
       sum(c)::BIGINT AS value_cents,
       count(*) AS n_orders
FROM (
  SELECT o_orderpriority, year(o_orderdate)::BIGINT AS yr,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
  FROM orders
)
GROUP BY ROLLUP (o_orderpriority, yr)
"""


# --- X60: edit-distance-1 similarity join ------------------------------------


def q_edit1_titles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Title near-miss pairs (12-char document prefixes within
    Levenshtein ≤ 1) via FastSS deletion-neighborhood blocking — the
    short-string near-dup primitive (operators/dedup.py::edit1_pairs):
    blocking index O(n·len), equi-join candidates, exact levenshtein
    verify, hot variants dropped by `_cap_groups` (cap 64)."""
    from .operators.dedup import edit1_pairs

    titles = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring(F.trim(F.col("text")), 1, 12).alias("t")
    )
    return edit1_pairs(titles, cap=64)


SQL_EDIT1_TITLES = """
WITH s AS (
  SELECT doc_id, substring(trim(text), 1, 12) AS t FROM documents
), v0 AS (
  SELECT doc_id, t,
         unnest(list_distinct(list_append(
           list_transform(generate_series(1, length(t)),
             i -> substring(t, 1, i-1) || substring(t, i+1, length(t)-i)),
           t))) AS var
  FROM s WHERE length(t) >= 1
), v AS (
  SELECT doc_id, t, var FROM (
    SELECT *, count(*) OVER (PARTITION BY var) AS gsz FROM v0
  ) WHERE gsz <= 64
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.t AS ta, b.doc_id AS doc_b, b.t AS tb
  FROM v a JOIN v b ON a.var = b.var AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, levenshtein(ta, tb)::INT AS dist
FROM cand WHERE levenshtein(ta, tb) <= 1
"""


# --- X57: Z-order clustering key --------------------------------------------


def q_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key + 32-way cluster bucket over events (user_id ×
    value-cents): the multi-column data-skipping layout
    (operators/layout.py; file-pruning effectiveness pinned against
    real parquet footer stats in tests/test_layout.py). All-integer
    quantize/interleave so the oracle is value-exact; the float→cents
    step is the one fixed-shape double multiply (KMV discipline)."""
    from .operators.layout import zorder_value

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * F.lit(100.0)).cast("long").alias("cents"),
    )
    z = zorder_value(ev, ["user_id", "cents"], bits=16)
    return z.select(
        "event_id",
        "zval",
        F.shiftrightunsigned("zval", 27).alias("zbucket"),
    )


def _sql_zorder() -> str:
    from .operators.layout import zvalue_sql

    zexpr = zvalue_sql("ev", ["user_id", "cents"], bits=16)
    return f"""
WITH ev AS (
  SELECT event_id, user_id,
         floor(value * 100.0::DOUBLE)::BIGINT AS cents
  FROM events
)
SELECT event_id, zval, (zval >> 27)::BIGINT AS zbucket
FROM (SELECT event_id, ({zexpr})::BIGINT AS zval FROM ev)
"""


SQL_ZORDER_CLUSTER = _sql_zorder()


# --- X94: collocation mining (exact-integer lift / PMI twin) ------------------


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X94: corpus collocation mining (operators/text.py::collocations)
    — bigram lift in exact integer milli-units, the no-float monotone
    twin of PMI. The documents table is near-uniform random words
    (lift ≈ 1000 everywhere), so deterministic phrases are injected to
    create genuine collocations: every 3rd doc ends "nova prime", every
    4th "quantum flux", every 7th "nova shard" — 'nova' therefore has
    TWO completions with different marginals, exercising the c(a,·)
    denominator, and the random-text bigrams exercise the threshold's
    reject side. DECIMAL(38,0) products on the Spark side, HUGEINT in
    DuckDB — both exact, so floor-div values match bit-for-bit."""
    from .operators.text import collocations

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = d.select(
        F.concat(
            F.col("text"),
            F.when(did % 3 == 0, F.lit(" nova prime")).otherwise(F.lit("")),
            F.when(did % 4 == 0, F.lit(" quantum flux")).otherwise(F.lit("")),
            F.when(did % 7 == 0, F.lit(" nova shard")).otherwise(F.lit("")),
        ).alias("text")
    )
    return collocations(aug, min_count=5, min_lift_milli=2000)


SQL_PMI_COLLOCATIONS = r"""
WITH aug AS (
  SELECT text
         || CASE WHEN doc_id % 3 = 0 THEN ' nova prime' ELSE '' END
         || CASE WHEN doc_id % 4 = 0 THEN ' quantum flux' ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN ' nova shard' ELSE '' END AS text
  FROM documents
), toks AS (
  SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM aug
), db AS (
  SELECT unnest(list_transform(generate_series(2, len(t)), i -> t[i-1])) AS w1,
         unnest(list_transform(generate_series(2, len(t)), i -> t[i])) AS w2
  FROM toks
), pair AS (
  SELECT w1, w2, count(*) AS c_ab FROM db GROUP BY w1, w2 HAVING count(*) >= 5
), l AS (
  SELECT w1, count(*) AS c_a FROM db GROUP BY w1
), r2 AS (
  SELECT w2, count(*) AS c_b FROM db GROUP BY w2
), n AS (
  SELECT count(*) AS n_bigrams FROM db
)
SELECT p.w1, p.w2, p.c_ab, l.c_a, r2.c_b,
       CAST((1000::HUGEINT * p.c_ab * n.n_bigrams)
            // (l.c_a::HUGEINT * r2.c_b) AS BIGINT) AS lift_milli
FROM pair p JOIN l USING (w1) JOIN r2 USING (w2) CROSS JOIN n
WHERE (1000::HUGEINT * p.c_ab * n.n_bigrams)
      // (l.c_a::HUGEINT * r2.c_b) >= 2000
"""


# --- X137: bitext paragraph-alignment QA --------------------------------------


def q_bitext_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X137: alignment verification for candidate bitext pairs
    (operators/text.py::bitext_alignment_qa). Even documents pair with
    a synthetic 'translation': every 6-word paragraph suffixed 'xx'
    (ratios clear the 600 floor — aligned), except doc_id%4==2 pairs,
    whose translation DROPS the last paragraph — the count mismatch
    surfaces as a ratio-0 position via the full-outer join and the
    pair fails. The oracle recomputes paragraphs and positional ratios
    with DuckDB list lambdas."""
    from .operators.text import bitext_alignment_qa

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    a = F.regexp_replace(
        F.trim(F.col("text")), r"((?:\S+ ){5}\S+) ", "$1\n\n"
    )
    paras = F.split(a, r"\n\n")
    b = F.when(
        F.col("doc_id") % 4 == 0,
        F.array_join(
            F.transform(paras, lambda p: F.concat(p, F.lit("xx"))), "\n\n"
        ),
    ).otherwise(
        F.array_join(
            F.slice(paras, 1, F.greatest(F.size(paras) - 1, F.lit(1))), "\n\n"
        )
    )
    pairs = d.select(
        F.col("doc_id").alias("pair_id"), a.alias("text_a"), b.alias("text_b")
    )
    return bitext_alignment_qa(pairs, ["pair_id"], min_ratio_milli=600)


SQL_BITEXT_QA = r"""
WITH base AS (
  SELECT doc_id AS pair_id,
         string_split(
           regexp_replace(trim(text), '((?:\S+ ){5}\S+) ',
                          '\1' || chr(10) || chr(10), 'g'),
           chr(10) || chr(10)) AS pa
  FROM documents WHERE doc_id % 2 = 0
), p AS (
  SELECT pair_id, pa,
         CASE WHEN pair_id % 4 = 0
              THEN list_transform(pa, x -> x || 'xx')
              ELSE list_slice(pa, 1, greatest(len(pa) - 1, 1)) END AS pb
  FROM base
), r AS (
  SELECT pair_id, len(pa)::BIGINT AS n_paras_a, len(pb)::BIGINT AS n_paras_b,
         list_transform(range(1, greatest(len(pa), len(pb)) + 1),
           i -> CASE WHEN i > len(pa) OR i > len(pb) THEN 0
                     ELSE (1000 * least(length(pa[i]), length(pb[i])))
                          // greatest(length(pa[i]), length(pb[i])) END) AS rs
  FROM p
)
SELECT pair_id, n_paras_a, n_paras_b,
       len(list_filter(rs, x -> x >= 600))::BIGINT AS n_paras_ok,
       list_min(rs)::BIGINT AS min_ratio_milli,
       (n_paras_a = n_paras_b
        AND len(list_filter(rs, x -> x >= 600)) = n_paras_a) AS aligned
FROM r
"""


# --- X127: session conversion attribution ------------------------------------


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X127: first/last-touch attribution for every purchase event over
    1-hour gap sessions (operators/pipeline.py::session_attribution) —
    straight on the raw events log; session-opening purchases read
    last_touch = 'direct'."""
    from .operators.pipeline import session_attribution

    return session_attribution(
        _t(spark, sf_dir, "events"), gap_s=3600, conversion="purchase"
    )


SQL_ATTRIBUTION = """
WITH t AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
), p AS (
  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
  FROM t
), s AS (
  SELECT *, sum(CASE WHEN prev IS NULL OR us - prev > 3600000000
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
  FROM p
), a AS (
  SELECT user_id, event_id, event_type, seq,
         first_value(event_type)
           OVER (PARTITION BY user_id, seq ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS first_touch,
         lag(event_type)
           OVER (PARTITION BY user_id, seq ORDER BY us, event_id) AS lp
  FROM s
)
SELECT user_id, event_id AS conversion_id, seq::BIGINT AS session_seq,
       first_touch, coalesce(lp, 'direct') AS last_touch
FROM a WHERE event_type = 'purchase'
"""


# --- X124: join-blowup preflight ----------------------------------------------


def q_join_preflight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X124: exact join-cardinality preflight (operators/pipeline.py::
    join_preflight) for the events self-join on user_id mod 50 (right
    side thinned to every 3rd event) — the check that would have
    predicted every hot-key pair blowup `_cap_groups` guards, at
    O(distinct keys) cost. est_out_rows is the EXACT join size; the
    oracle recomputes histograms, the HUGEINT product sum, and the
    deterministic top offender."""
    from .operators.pipeline import join_preflight

    e = _t(spark, sf_dir, "events")
    left = e.select((F.col("user_id") % 50).alias("k"))
    right = e.filter(F.col("event_id") % 3 == 0).select(
        (F.col("user_id") % 50).alias("k")
    )
    return join_preflight(left, right, ["k"])


SQL_JOIN_PREFLIGHT = """
WITH l AS (
  SELECT (user_id % 50)::VARCHAR AS k FROM events
), r AS (
  SELECT (user_id % 50)::VARCHAR AS k FROM events WHERE event_id % 3 = 0
), la AS (SELECT k, count(*) AS nl FROM l GROUP BY k),
ra AS (SELECT k, count(*) AS nr FROM r GROUP BY k),
j AS (SELECT la.k, nl::HUGEINT * nr AS p FROM la JOIN ra USING (k)),
tot AS (
  SELECT count(*) AS nk, coalesce(sum(p), 0) AS est,
         coalesce(max(p), 0) AS mx
  FROM j
), top AS (SELECT k FROM j ORDER BY p DESC, k ASC LIMIT 1),
nl2 AS (SELECT count(*) AS n_left FROM l),
nr2 AS (SELECT count(*) AS n_right FROM r)
SELECT n_left, n_right, nk AS n_keys_both,
       est::BIGINT AS est_out_rows, mx::BIGINT AS max_key_out,
       top.k AS top_key,
       ((1000 * est) // (n_left + n_right))::BIGINT AS amp_milli
FROM nl2 CROSS JOIN nr2 CROSS JOIN tot CROSS JOIN top
"""


# --- X122: truncation-loss planning curve ------------------------------------


def q_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X122: context-length planning (operators/text.py::
    truncation_loss) over documents at L ∈ {16, 32, 64, 128} — the
    word-count distribution (10..99) makes every grid point distinct,
    including the zero-loss L=128 edge."""
    from .operators.text import truncation_loss

    return truncation_loss(
        _t(spark, sf_dir, "documents"), lengths=(16, 32, 64, 128)
    )


SQL_TRUNCATION_LOSS = r"""
WITH n AS (
  SELECT len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS n
  FROM documents
), g AS (
  SELECT n, unnest([16, 32, 64, 128]) AS trunc_len FROM n
)
SELECT trunc_len::BIGINT AS trunc_len,
       count(*) AS n_docs,
       sum(CASE WHEN n > trunc_len THEN 1 ELSE 0 END)::BIGINT AS docs_over,
       sum(n)::BIGINT AS total_tokens,
       sum(greatest(n - trunc_len, 0))::BIGINT AS tokens_lost,
       ((1000 * sum(greatest(n - trunc_len, 0))) // sum(n))::BIGINT
         AS lost_milli
FROM g GROUP BY trunc_len
"""


# --- X119: stable dense vocabulary ids ---------------------------------------


def q_vocab_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X119: embedding-table numbering (operators/pipeline.py::
    dense_vocab_ids). Document frequency over the documents words; the
    df>=8 head plays the PREVIOUS snapshot (assigned first, ids
    0..V₀-1), then the full vocabulary assigns incrementally — head ids
    must not move, tail terms append after max(vid) in (df DESC, term)
    order. Oracle: two flat row_numbers + the max offset."""
    from .operators.pipeline import dense_vocab_ids

    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    ).distinct()
    counts = words.groupBy("term").agg(F.count("*").alias("df"))
    existing = dense_vocab_ids(counts.filter(F.col("df") >= 8)).select(
        "term", "vid"
    )
    return dense_vocab_ids(counts, existing)


SQL_VOCAB_IDS = r"""
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
  FROM documents
), counts AS (
  SELECT term, count(*) AS df FROM pairs GROUP BY term
), old AS (
  SELECT term, df,
         row_number() OVER (ORDER BY df DESC, term) - 1 AS vid
  FROM counts WHERE df >= 8
), mx AS (
  SELECT coalesce(max(vid), -1) AS mx FROM old
), newt AS (
  SELECT term, df,
         row_number() OVER (ORDER BY df DESC, term) - 1 AS r
  FROM counts WHERE df < 8
)
SELECT term, df, vid::BIGINT AS vid, FALSE AS is_new FROM old
UNION ALL
SELECT term, df, (mx + 1 + r)::BIGINT AS vid, TRUE AS is_new
FROM newt CROSS JOIN mx
"""


# --- X118: inter-annotator agreement (exact-integer Cohen's kappa) -----------


def q_annotator_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X118: Cohen's kappa (operators/pipeline.py::annotator_agreement).
    Items i = event_id mod 3000, 5 classes: rater a labels (i·7) mod 5;
    rater b agrees except every 6th item, where the label rotates one
    class — agreement 5/6 against near-uniform marginals (chance ≈ 1/5),
    kappa ≈ 792 milli. The oracle clears the same denominators; any
    drift in the marginal sum S or the div order mismatches."""
    from .operators.pipeline import annotator_agreement

    e = _t(spark, sf_dir, "events")
    i = (F.col("event_id") % 3000).alias("item_id")
    la = ((F.col("event_id") % 3000) * 7 % 5).alias("label")
    lb = (
        ((F.col("event_id") % 3000) * 7
         + F.when(F.col("event_id") % 3000 % 6 == 0, 1).otherwise(0)) % 5
    ).alias("label")
    base = e.select(i, la, lb.alias("lb")).distinct()
    labels = base.select(
        "item_id", F.lit("a").alias("rater"), F.col("label")
    ).unionByName(
        base.select("item_id", F.lit("b").alias("rater"), F.col("lb").alias("label"))
    )
    return annotator_agreement(labels)


SQL_ANNOTATOR_KAPPA = """
WITH items AS (
  SELECT DISTINCT event_id % 3000 AS i FROM events
), j AS (
  SELECT i, (i * 7) % 5 AS la,
         (i * 7 + CASE WHEN i % 6 = 0 THEN 1 ELSE 0 END) % 5 AS lb
  FROM items
), c AS (
  SELECT count(*) AS n,
         sum(CASE WHEN la = lb THEN 1 ELSE 0 END)::BIGINT AS agree
  FROM j
), na AS (SELECT la AS c2, count(*) AS na FROM j GROUP BY la),
nb AS (SELECT lb AS c2, count(*) AS nb FROM j GROUP BY lb),
s AS (
  SELECT coalesce(sum(na.na * nb.nb), 0)::BIGINT AS s
  FROM na JOIN nb USING (c2)
)
SELECT n, agree,
       (1000 * agree) // n AS po_milli,
       (1000 * s) // (n * n) AS pe_milli,
       n * n = s AS degenerate,
       CASE WHEN n * n = s THEN CASE WHEN agree = n THEN 1000 ELSE 0 END
            ELSE (1000 * (agree * n - s)) // (n * n - s) END AS kappa_milli
FROM c CROSS JOIN s
"""


# --- X109: weekly cohort retention matrix ------------------------------------


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X109: cohort retention (operators/pipeline.py::retention_cohorts)
    straight over the events log — first-seen week per user, distinct
    activity per (cohort, age) cell, exact milli retention. Both
    engines truncate to ISO Monday weeks under the pinned UTC session
    zone; age 0 must read 1000 for every cohort."""
    from .operators.pipeline import retention_cohorts

    return retention_cohorts(_t(spark, sf_dir, "events"))


SQL_RETENTION_COHORTS = """
WITH uw AS (
  SELECT user_id AS u, date_trunc('week', ts) AS w FROM events
), first AS (
  SELECT u, min(w) AS cohort_week FROM uw GROUP BY u
), act AS (
  SELECT cohort_week, date_diff('day', cohort_week, w) // 7 AS age_weeks,
         count(DISTINCT uw.u) AS n_active
  FROM uw JOIN first ON uw.u = first.u
  GROUP BY cohort_week, age_weeks
), sizes AS (
  SELECT cohort_week, count(*) AS cohort_size FROM first GROUP BY cohort_week
)
SELECT a.cohort_week, a.age_weeks::BIGINT AS age_weeks, a.n_active,
       s.cohort_size,
       ((1000 * a.n_active) // s.cohort_size)::BIGINT AS retention_milli
FROM act a JOIN sizes s USING (cohort_week)
"""


# --- X101: Gopher structural quality rules (bitmask diagnostics) -------------


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X101: Gopher structural rules (operators/text.py::gopher_rules).
    The flat documents text is decorated deterministically so every rule
    has live branches: every 5th space becomes a newline (lines), %7
    docs get '- ' on every line (bullet rule fires), %4 docs get ' ## #'
    appended (symbol rule fires on short docs where 2/n > 50 milli), %5
    docs get '...' attached to the last word (ellipsis rule fires when
    n_lines <= 3; word-length floor 4000 splits the real distribution). Oracle rebuilds the decoration and every milli signal
    with DuckDB list lambdas — bitmask and keep must match bit-for-bit."""
    from .operators.text import gopher_rules

    d = _t(spark, sf_dir, "documents")
    t = F.regexp_replace(F.trim(F.col("text")), r"((?:\S+ ){4}\S+) ", "$1\n")
    t = (
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("- "), F.regexp_replace(t, "\n", "\n- ")),
        ).otherwise(t)
    )
    t = F.when(F.col("doc_id") % 4 == 0, F.concat(t, F.lit(" ## #"))).otherwise(t)
    t = F.when(F.col("doc_id") % 5 == 0, F.concat(t, F.lit("..."))).otherwise(t)
    return gopher_rules(
        d.select("doc_id", t.alias("text")),
        min_words=20,
        max_words=100_000,
        min_word_len_milli=4000,
        max_word_len_milli=10_000,
        max_symbol_milli=50,
        min_alpha_milli=800,
        max_bullet_milli=900,
        max_ellipsis_milli=300,
        min_stop_hits=1,
    )


SQL_GOPHER_RULES = r"""
WITH s1 AS (
  SELECT doc_id,
         regexp_replace(trim(text), '((?:\S+ ){4}\S+) ',
                        '\1' || chr(10), 'g') AS t
  FROM documents
), s2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN '- ' || replace(t, chr(10), chr(10) || '- ')
              ELSE t END AS t
  FROM s1
), s3 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN t || ' ## #' ELSE t END AS t
  FROM s2
), deco AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN t || '...' ELSE t END AS t
  FROM s3
), feat AS (
  SELECT doc_id,
    len(regexp_split_to_array(trim(t), '\s+'))::BIGINT AS n_words,
    len(string_split(t, chr(10)))::BIGINT AS n_lines,
    list_sum(list_transform(regexp_split_to_array(trim(t), '\s+'),
                            w -> length(w)))::BIGINT AS chars,
    len(list_filter(regexp_split_to_array(trim(t), '\s+'),
                    w -> w LIKE '%#%'))::BIGINT AS sym,
    len(list_filter(regexp_split_to_array(trim(t), '\s+'),
                    w -> regexp_matches(w, '[A-Za-z]')))::BIGINT AS alpha,
    len(list_filter(string_split(t, chr(10)),
                    l -> l LIKE '- %'))::BIGINT AS bullet,
    len(list_filter(string_split(t, chr(10)),
                    l -> l LIKE '%...'))::BIGINT AS ell,
    len(list_filter(['the','be','to','of','and','that','have','with'],
                    s -> list_contains(
                      regexp_split_to_array(trim(t), '\s+'), s)))::BIGINT
      AS stop_hits
  FROM deco
), m AS (
  SELECT doc_id, n_words, n_lines, stop_hits,
    ((1000 * chars) // n_words)::BIGINT AS word_len_milli,
    ((1000 * sym) // n_words)::BIGINT AS symbol_milli,
    ((1000 * alpha) // n_words)::BIGINT AS alpha_milli,
    ((1000 * bullet) // n_lines)::BIGINT AS bullet_milli,
    ((1000 * ell) // n_lines)::BIGINT AS ellipsis_milli
  FROM feat
), f AS (
  SELECT *,
    (CASE WHEN n_words < 20 OR n_words > 100000 THEN 1 ELSE 0 END
     + CASE WHEN word_len_milli < 4000 OR word_len_milli > 10000
            THEN 2 ELSE 0 END
     + CASE WHEN symbol_milli > 50 THEN 4 ELSE 0 END
     + CASE WHEN alpha_milli < 800 THEN 8 ELSE 0 END
     + CASE WHEN bullet_milli > 900 THEN 16 ELSE 0 END
     + CASE WHEN ellipsis_milli > 300 THEN 32 ELSE 0 END
     + CASE WHEN stop_hits < 1 THEN 64 ELSE 0 END)::BIGINT AS fail_mask
  FROM m
)
SELECT doc_id, n_words, n_lines, stop_hits, word_len_milli, symbol_milli,
       alpha_milli, bullet_milli, ellipsis_milli, fail_mask,
       fail_mask = 0 AS keep
FROM f
"""


# --- X102: intra-document repeated n-gram spans ------------------------------


def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X102: within-doc repeated trigrams with their span bounds
    (operators/text.py::repeated_ngram_spans) over the raw documents
    text — 29 genuinely repeated (doc, trigram) pairs exist at sf0.01,
    so both the detector and the min-occurrence threshold are live on
    undoctored data. Positions are 0-based token offsets; the oracle
    rebuilds the positional trigram stream with generate_series structs
    and must match counts and both span endpoints exactly."""
    from .operators.text import repeated_ngram_spans

    return repeated_ngram_spans(
        _t(spark, sf_dir, "documents"), n=3, min_occurrences=2
    )


SQL_REPEATED_SPANS = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), tri AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 2),
                i -> {pos: i - 1,
                      ng: t[i] || ' ' || t[i+1] || ' ' || t[i+2]})) AS s
  FROM toks WHERE len(t) >= 3
)
SELECT doc_id, s.ng AS ngram,
       count(*) AS n_occurrences,
       min(s.pos)::BIGINT AS first_pos,
       max(s.pos)::BIGINT AS last_pos
FROM tri GROUP BY doc_id, s.ng HAVING count(*) >= 2
"""


def register(
    queries: dict[str, Callable[[SparkSession, str], DataFrame]],
    oracles: dict[str, str],
) -> None:
    queries.update(
        {
            "q_gopher_rules": q_gopher_rules,
            "q_repeated_spans": q_repeated_spans,
            "q_retention_cohorts": q_retention_cohorts,
            "q_annotator_kappa": q_annotator_kappa,
            "q_vocab_ids": q_vocab_ids,
            "q_truncation_loss": q_truncation_loss,
            "q_join_preflight": q_join_preflight,
            "q_attribution": q_attribution,
            "q_bitext_qa": q_bitext_qa,
            "q_repetition_stats": q_repetition_stats,
            "q_tfidf_top_terms": q_tfidf_top_terms,
            "q_triangle_count": q_triangle_count,
            "q_hash_split": q_hash_split,
            "q_zorder_cluster": q_zorder_cluster,
            "q_grouped_sample": q_grouped_sample,
            "q_edit1_titles": q_edit1_titles,
            "q_rollup_orders": q_rollup_orders,
            "q_scd2_history": q_scd2_history,
            "q_bloom_semi_join": q_bloom_semi_join,
            "q_knn_classify": q_knn_classify,
            "q_hopping_rates": q_hopping_rates,
            "q_bigram_fluency": q_bigram_fluency,
            "q_grouped_trend": q_grouped_trend,
            "q_new_vs_returning": q_new_vs_returning,
            "q_funnel_steps": q_funnel_steps,
            "q_paragraph_dedup": q_paragraph_dedup,
            "q_corpus_pipeline": q_corpus_pipeline,
            "q_pmi_collocations": q_pmi_collocations,
            "q_entity_split": q_entity_split,
            "q_ngram_novelty": q_ngram_novelty,
            "q_readability": q_readability,
            "q_code_detect": q_code_detect,
            "q_quality_classifier": q_quality_classifier,
            "q_perplexity_buckets": q_perplexity_buckets,
            "q_corpus_datasheet": q_corpus_datasheet,
            "q_release_diff": q_release_diff,
        }
    )
    oracles.update(
        {
            "q_gopher_rules": SQL_GOPHER_RULES,
            "q_repeated_spans": SQL_REPEATED_SPANS,
            "q_retention_cohorts": SQL_RETENTION_COHORTS,
            "q_annotator_kappa": SQL_ANNOTATOR_KAPPA,
            "q_vocab_ids": SQL_VOCAB_IDS,
            "q_truncation_loss": SQL_TRUNCATION_LOSS,
            "q_join_preflight": SQL_JOIN_PREFLIGHT,
            "q_attribution": SQL_ATTRIBUTION,
            "q_bitext_qa": SQL_BITEXT_QA,
            "q_repetition_stats": SQL_REPETITION_STATS,
            "q_tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
            "q_triangle_count": SQL_TRIANGLE_COUNT,
            "q_hash_split": SQL_HASH_SPLIT,
            "q_zorder_cluster": SQL_ZORDER_CLUSTER,
            "q_grouped_sample": SQL_GROUPED_SAMPLE,
            "q_edit1_titles": SQL_EDIT1_TITLES,
            "q_rollup_orders": SQL_ROLLUP_ORDERS,
            "q_scd2_history": SQL_SCD2_HISTORY,
            "q_bloom_semi_join": SQL_BLOOM_SEMI_JOIN,
            "q_knn_classify": SQL_KNN_CLASSIFY,
            "q_hopping_rates": SQL_HOPPING_RATES,
            "q_bigram_fluency": SQL_BIGRAM_FLUENCY,
            "q_grouped_trend": SQL_GROUPED_TREND,
            "q_new_vs_returning": SQL_NEW_VS_RETURNING,
            "q_funnel_steps": SQL_FUNNEL_STEPS,
            "q_paragraph_dedup": SQL_PARAGRAPH_DEDUP,
            "q_corpus_pipeline": SQL_CORPUS_PIPELINE,
            "q_pmi_collocations": SQL_PMI_COLLOCATIONS,
            "q_entity_split": SQL_ENTITY_SPLIT,
            "q_ngram_novelty": SQL_NGRAM_NOVELTY,
            "q_readability": SQL_READABILITY,
            "q_code_detect": SQL_CODE_DETECT,
            "q_quality_classifier": SQL_QUALITY_CLASSIFIER,
            "q_perplexity_buckets": SQL_PERPLEXITY_BUCKETS,
            "q_corpus_datasheet": SQL_CORPUS_DATASHEET,
            "q_release_diff": SQL_RELEASE_DIFF,
        }
    )


# --- X81: paragraph-level boilerplate dedup ----------------------------------


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet paragraph scrub over synthetic pages: every doc renders as
    a per-source nav header + its text in 8-word paragraphs + a
    per-source copyright footer (the relational page-synth idiom of
    q_link_extract — 20 sources ⇒ each header/footer repeats ~N/20
    times and is dropped at max_df=5; content paragraphs survive).
    The operator (operators/text.py::paragraph_dedup) drops any exact
    paragraph occurring >5 times corpus-wide and reassembles the doc
    in original order."""
    from .operators.text import paragraph_dedup

    d = _t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - 1, F.lit(0)), F.lit(8)),
        lambda st: F.array_join(F.slice(w, st + 1, 8), " "),
    )
    paras = F.concat(
        F.array(F.concat(F.lit("nav menu "), F.col("source"))),
        chunks,
        F.array(F.concat(F.lit("copyright "), F.col("source"))),
    )
    pages = d.select("doc_id", paras.alias("paras"))
    return paragraph_dedup(pages, "paras", max_df=5)


SQL_PARAGRAPH_DEDUP = """
WITH w AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
), px AS (
  SELECT doc_id, 0 AS pos, 'nav menu ' || source AS para FROM w
  UNION ALL
  SELECT doc_id, CAST(st // 8 + 1 AS INT) AS pos,
         array_to_string(list_slice(w, st + 1, st + 8), ' ') AS para
  FROM (SELECT doc_id, w,
               unnest(generate_series(0, greatest(len(w) - 1, 0), 8)) AS st
        FROM w)
  UNION ALL
  SELECT doc_id,
         CAST(greatest((len(w) + 7) // 8, 1) + 1 AS INT) AS pos,
         'copyright ' || source AS para
  FROM w
), d AS (
  SELECT para FROM px GROUP BY para HAVING count(*) > 5
), f AS (
  SELECT p.doc_id, p.pos, p.para, (d.para IS NOT NULL) AS dropped
  FROM px p LEFT JOIN d ON p.para = d.para
)
SELECT doc_id,
       coalesce(string_agg(para, chr(10) ORDER BY pos)
                FILTER (WHERE NOT dropped), '') AS clean_text,
       count(*) FILTER (WHERE NOT dropped) AS n_kept,
       count(*) FILTER (WHERE dropped) AS n_dropped
FROM f
GROUP BY doc_id
"""


# --- X84: composed end-to-end curation pipeline ------------------------------


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation chain in ONE call — the shape a Dolma/CCNet
    corpus build actually runs: Gopher repetition rules (X53) ∧
    paragraph boilerplate scrub (X81, ≥3 surviving paragraphs) → token
    accounting per language. Output is the per-language yield report
    (docs in, docs kept, tokens kept, keep rate in milli-units) a
    pipeline owner reads before shipping a shard. Oracle composes the
    two stage oracles as CTEs — a drift in EITHER stage or in the
    composition logic mismatches.

    Scale shape: the stage operators keep their own audited plans; the
    composition adds two doc_id equi-joins and one ~languages-sized
    groupBy. Nothing here re-reads the corpus a second time."""
    from .operators.text import paragraph_dedup, repetition_stats

    d = _t(spark, sf_dir, "documents")
    rep = repetition_stats(d).select("doc_id", "keep")
    w = F.split(F.col("text"), " ")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - 1, F.lit(0)), F.lit(8)),
        lambda st: F.array_join(F.slice(w, st + 1, 8), " "),
    )
    paras = F.concat(
        F.array(F.concat(F.lit("nav menu "), F.col("source"))),
        chunks,
        F.array(F.concat(F.lit("copyright "), F.col("source"))),
    )
    scrub = paragraph_dedup(
        d.select("doc_id", paras.alias("paras")), "paras", max_df=5
    ).select("doc_id", "clean_text", "n_kept")
    tok = F.when(
        F.col("clean_text") == "", F.lit(0)
    ).otherwise(F.size(F.split(F.col("clean_text"), r"\s+")))
    j = (
        d.select("doc_id", "lang")
        .join(rep, "doc_id")
        .join(scrub, "doc_id")
        .withColumn("kept", F.col("keep") & (F.col("n_kept") >= 3))
        .withColumn("tok", tok)
    )
    return (
        j.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("docs_in"),
            F.sum(F.col("kept").cast("int")).cast("long").alias("docs_kept"),
            F.sum(F.when(F.col("kept"), F.col("tok")).otherwise(F.lit(0)))
            .cast("long")
            .alias("tokens_kept"),
        )
        .withColumn(
            "keep_milli",
            F.expr("(1000 * docs_kept) div docs_in").cast("long"),
        )
    )


SQL_CORPUS_PIPELINE = (
    "WITH rep_stage AS (" + SQL_REPETITION_STATS + "), para_stage AS ("
    + SQL_PARAGRAPH_DEDUP
    + """)
SELECT lang,
       count(*)::BIGINT AS docs_in,
       count(*) FILTER (WHERE kept)::BIGINT AS docs_kept,
       coalesce(sum(CASE WHEN kept THEN tok ELSE 0 END), 0)::BIGINT
         AS tokens_kept,
       ((1000 * count(*) FILTER (WHERE kept)) // count(*))::BIGINT
         AS keep_milli
FROM (
  SELECT d.lang,
         (r.keep AND p.n_kept >= 3) AS kept,
         CASE WHEN p.clean_text = '' THEN 0
              ELSE len(string_split_regex(p.clean_text, '\\s+')) END AS tok
  FROM documents d
  JOIN rep_stage r ON r.doc_id = d.doc_id
  JOIN para_stage p ON p.doc_id = d.doc_id
)
GROUP BY lang
"""
)


# --- X138: entity-disjoint split + leakage audit ------------------------------


def q_entity_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X138: host-disjoint train/val/test split with the residual-
    leakage audit (operators/pipeline.py::entity_disjoint_split).
    Hosts are h{doc_id mod 50}; fingerprints are md5 of the text
    except that every doc_id ≡ 3 (mod 20) collapses onto one of five
    shared 'template' fingerprints — the cross-host duplicates a host
    fence cannot stop, which must surface as leaked_fps wherever the
    five template hosts straddle a split boundary."""
    from .operators.pipeline import entity_disjoint_split

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    host = F.concat(F.lit("h"), (did % 50).cast("string"))
    basis = F.when(
        did % 20 == 3,
        F.concat(
            F.lit("shared-template-"),
            (F.expr("doc_id div 20") % 5).cast("string"),
        ),
    ).otherwise(F.col("text"))
    rows = d.select(host.alias("host"), F.md5(basis).alias("fp"))
    return entity_disjoint_split(
        rows, entity_col="host", fingerprint_col="fp", portable=True
    )


SQL_ENTITY_SPLIT = """
WITH base AS (
  SELECT 'h' || (doc_id % 50)::VARCHAR AS host,
         md5(CASE WHEN doc_id % 20 = 3
                  THEN 'shared-template-' || ((doc_id // 20) % 5)::VARCHAR
                  ELSE text END) AS fp,
         ('0x' || substr(md5('esplit:h' || (doc_id % 50)::VARCHAR), 1, 15))
           ::BIGINT % 100 AS b
  FROM documents
), assigned AS (
  SELECT host, fp,
         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM base
), fp_pairs AS (
  SELECT split, fp, count(*) AS n FROM assigned GROUP BY split, fp
), span AS (
  SELECT fp, count(*) AS n_splits FROM fp_pairs GROUP BY fp
), ent AS (
  SELECT split, count(DISTINCT host) AS n_entities
  FROM assigned GROUP BY split
)
SELECT p.split, e.n_entities::BIGINT AS n_entities,
       sum(p.n)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_fingerprints,
       sum(CASE WHEN s.n_splits > 1 THEN 1 ELSE 0 END)::BIGINT AS leaked_fps
FROM fp_pairs p JOIN span s USING (fp) JOIN ent e ON e.split = p.split
GROUP BY p.split, e.n_entities
"""


# --- X139: n-gram novelty vs the existing corpus ------------------------------


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X139: milli fraction of each candidate doc's distinct bigrams
    unseen anywhere in the accepted corpus (operators/text.py::
    ngram_novelty — distinct-collapsed vocabulary equi-join, the
    corpus-scale reference X24's broadcast cannot hold). Docs with
    doc_id % 3 == 0 play the incoming candidates; everything else is
    the corpus they are scored against."""
    from .operators.text import ngram_novelty

    d = _t(spark, sf_dir, "documents")
    cand = d.filter(F.col("doc_id") % 3 == 0)
    corpus = d.filter(F.col("doc_id") % 3 != 0)
    return ngram_novelty(cand, corpus, gram_words=2, stale_milli=300)


SQL_NGRAM_NOVELTY = """
WITH grams AS (
  SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gram_hash
  FROM (
    SELECT DISTINCT doc_id,
           array_to_string(list_slice(toks, i, i + 1), ' ') AS g
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         LATERAL unnest(generate_series(1, greatest(len(toks) - 1, 1))) u(i)
  )
), vocab AS (
  SELECT DISTINCT gram_hash FROM grams WHERE doc_id % 3 <> 0
), scored AS (
  SELECT g.doc_id, count(*) AS n_grams,
         sum(CASE WHEN v.gram_hash IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_novel
  FROM grams g LEFT JOIN vocab v USING (gram_hash)
  WHERE g.doc_id % 3 = 0
  GROUP BY g.doc_id
)
SELECT doc_id, n_grams::BIGINT AS n_grams, n_novel,
       ((1000 * n_novel) // n_grams)::BIGINT AS novelty_milli,
       (1000 * n_novel) // n_grams < 300 AS stale
FROM scored
"""


# --- X143: exact-integer readability scoring ----------------------------------


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X143: Flesch reading-ease + Flesch-Kincaid grade in milli
    (operators/text.py::readability). Sentence boundaries are planted
    by rewriting every ' a ' to '. ' (the corpus text is unpunctuated
    words, so occurrence counts — and therefore sentence lengths —
    vary per doc); both engines apply the identical literal
    replacement."""
    from .operators.text import readability

    d = _t(spark, sf_dir, "documents")
    t2 = F.expr("replace(text, ' a ', '. ')")
    return readability(d.withColumn("text", t2))


SQL_READABILITY = """
WITH t AS (
  SELECT doc_id, lower(replace(text, ' a ', '. ')) AS tl FROM documents
), c AS (
  SELECT doc_id,
         len(string_split_regex(trim(tl), '\\s+'))::BIGINT AS n_words,
         greatest(len(regexp_extract_all(tl, '[.!?]+')), 1)::BIGINT
           AS n_sentences,
         greatest(len(regexp_extract_all(tl, '[aeiouy]+')), 1)::BIGINT
           AS n_syllables
  FROM t
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       (206835 - (1015 * n_words) // n_sentences
        - (84600 * n_syllables) // n_words)::BIGINT AS fre_milli,
       ((390 * n_words) // n_sentences
        + (11800 * n_syllables) // n_words - 15590)::BIGINT AS grade_milli
FROM c
"""


# --- X157: code-vs-prose routing ----------------------------------------------


def q_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X157: cheap code routing (operators/text.py::code_detect). Docs
    with doc_id ≡ 0 (mod 7) gain a brace-dense snippet scaled to the
    doc length plus two keywords (the brace∧keyword branch); docs with
    doc_id ≡ 1 (mod 11) gain indented keyword lines (the
    indent∧keyword branch); everything else is plain prose and must
    not fire."""
    from .operators.text import code_detect

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    braces = F.repeat(F.lit("{};()= "), F.greatest(
        F.expr("cast(n_chars div 20 as int)"), F.lit(5)
    ))
    aug = F.when(
        did % 7 == 0,
        F.concat(F.col("text"), F.lit(" def import "), braces),
    ).when(
        did % 11 == 1,
        F.concat(
            F.col("text"),
            F.lit("\n  import os\n  return x\n  const y"),
        ),
    ).otherwise(F.col("text"))
    return code_detect(d.withColumn("text", aug))


SQL_CODE_DETECT = """
WITH aug AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0
         THEN text || ' def import '
              || repeat('{};()= ', greatest(n_chars // 20, 5))
         WHEN doc_id % 11 = 1
         THEN text || chr(10) || '  import os' || chr(10)
              || '  return x' || chr(10) || '  const y'
         ELSE text END AS t
  FROM documents
), sig AS (
  SELECT doc_id,
         greatest(length(t), 1) AS n,
         greatest(len(string_split(t, chr(10))), 1) AS nl,
         length(regexp_replace(t, '[^{}();=]', '', 'g')) AS br,
         len(list_filter(string_split(t, chr(10)),
                         ln -> regexp_matches(ln, '^(  |\\t)'))) AS ind,
         len(regexp_extract_all(
               t, '\\b(def|function|return|import|const|class)\\b'))::BIGINT
           AS keyword_hits,
         length(regexp_replace(t, '[A-Za-z0-9\\s]', '', 'g')) AS sym
  FROM aug
)
SELECT doc_id,
       ((1000 * br) // n)::BIGINT AS brace_milli,
       ((1000 * ind) // nl)::BIGINT AS indent_milli,
       keyword_hits,
       ((1000 * sym) // n)::BIGINT AS symbol_milli,
       (((1000 * br) // n >= 40 OR (1000 * ind) // nl >= 300)
        AND (keyword_hits >= 2 OR (1000 * sym) // n >= 150)) AS is_code
FROM sig
"""


# --- X158: hashing-trick quality classifier (inference) -----------------------


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X158: fastText-style linear quality filter, scoring path only
    (operators/text.py::hashed_linear_score) — the model is a 4096-
    bucket weight TABLE (deterministic synthetic weights standing in
    for a trained model: w_b = (b·2654435761 mod 2001) − 1000 micro,
    bias +500000) broadcast onto hashed token features; exact integer
    logits, portable bucket hash so the oracle reproduces every
    feature id."""
    from .operators.text import hashed_linear_score

    d = _t(spark, sf_dir, "documents")
    w = spark.range(4096).select(
        F.col("id").cast("int").alias("bucket"),
        ((F.col("id") * 2654435761) % 2001 - 1000).cast("long").alias(
            "weight_micro"
        ),
    )
    bias = spark.range(1).select(
        F.lit(-1).cast("int").alias("bucket"),
        F.lit(500000).cast("long").alias("weight_micro"),
    )
    return hashed_linear_score(
        d, w.unionByName(bias), n_buckets=4096, threshold_micro=0,
        portable=True,
    )


SQL_QUALITY_CLASSIFIER = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
  FROM documents
), feats AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % 4096 AS bucket,
         count(*) AS tf
  FROM toks WHERE tok <> '' GROUP BY 1, 2
), w AS (
  SELECT i::INT AS bucket, (i * 2654435761) % 2001 - 1000 AS weight_micro
  FROM generate_series(0, 4095) g(i)
), dots AS (
  SELECT f.doc_id, sum(f.tf * coalesce(w.weight_micro, 0))::BIGINT AS dot
  FROM feats f LEFT JOIN w USING (bucket) GROUP BY f.doc_id
)
SELECT doc_id, (dot + 500000)::BIGINT AS logit_micro,
       (dot + 500000 >= 0) AS accept
FROM dots
"""


# --- X161: CCNet head/middle/tail fluency buckets -----------------------------


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X161: LM-score mixing buckets (operators/text.py::
    fluency_buckets over X67's bigram fluency) — every doc labeled
    head/middle/tail by exact integer thirds of the global score rank,
    built on the two-level cell decomposition (never a partition-less
    window over docs). Oracle chains the fluency oracle as a CTE and
    replays the identical rank arithmetic."""
    from .operators.text import bigram_fluency, fluency_buckets

    d = _t(spark, sf_dir, "documents")
    return fluency_buckets(bigram_fluency(d))


SQL_PERPLEXITY_BUCKETS = (
    "WITH fl AS (" + SQL_BIGRAM_FLUENCY + """)
SELECT doc_id, score_micro,
       row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rank,
       CASE WHEN row_number() OVER (ORDER BY score_micro DESC, doc_id) * 3
                 <= (SELECT count(*) FROM fl) THEN 'head'
            WHEN row_number() OVER (ORDER BY score_micro DESC, doc_id) * 3
                 <= (SELECT count(*) FROM fl) * 2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM fl
"""
)


# --- X162: per-language corpus datasheet --------------------------------------


def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X162: the dataset-card numbers a corpus release publishes, per
    language — docs, whitespace tokens, code-routed docs, mean
    readability (exact milli, sum div n) — composed from the X157
    router (with its planted code fixtures) and X143 readability
    (with its planted sentence punctuation) joined 1:1 on doc_id and
    rolled up by lang; the oracle chains both stage oracles as CTEs
    so a drift in either stage or the composition mismatches."""
    from .operators.text import code_detect, readability

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    braces = F.repeat(F.lit("{};()= "), F.greatest(
        F.expr("cast(n_chars div 20 as int)"), F.lit(5)
    ))
    aug_code = F.when(
        did % 7 == 0, F.concat(F.col("text"), F.lit(" def import "), braces)
    ).when(
        did % 11 == 1,
        F.concat(F.col("text"), F.lit("\n  import os\n  return x\n  const y")),
    ).otherwise(F.col("text"))
    cd = code_detect(d.withColumn("text", aug_code)).select(
        "doc_id", "is_code"
    )
    rd = readability(
        d.withColumn("text", F.expr("replace(text, ' a ', '. ')"))
    ).select("doc_id", "fre_milli", "grade_milli")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias(
            "_tok"
        ),
    )
    j = toks.join(cd, "doc_id").join(rd, "doc_id")
    return (
        j.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_tok").cast("long").alias("n_tokens"),
            F.sum(F.col("is_code").cast("long")).alias("n_code"),
            F.expr("sum(fre_milli) div count(*)").cast("long").alias(
                "mean_fre_milli"
            ),
            F.expr("sum(grade_milli) div count(*)").cast("long").alias(
                "mean_grade_milli"
            ),
        )
    )


SQL_CORPUS_DATASHEET = (
    "WITH cd AS (" + SQL_CODE_DETECT + "), rd AS (" + SQL_READABILITY + """)
SELECT d.lang, count(*)::BIGINT AS n_docs,
       sum(len(string_split_regex(trim(d.text), '\\s+')))::BIGINT
         AS n_tokens,
       sum(CASE WHEN cd.is_code THEN 1 ELSE 0 END)::BIGINT AS n_code,
       (sum(rd.fre_milli) // count(*))::BIGINT AS mean_fre_milli,
       (sum(rd.grade_milli) // count(*))::BIGINT AS mean_grade_milli
FROM documents d
JOIN cd ON cd.doc_id = d.doc_id
JOIN rd ON rd.doc_id = d.doc_id
GROUP BY d.lang
"""
)


# --- X163: training-set release diff ------------------------------------------


def q_release_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X163: corpus release audit (operators/pipeline.py::
    release_diff). Release A = docs with doc_id % 10 < 9; release B =
    every doc, with doc_id % 20 == 0 texts amended (' updated claim'
    appended) — so per language the diff shows exactly the 10%-sample
    additions, the planted changes, zero removals, and the token delta
    those edits inject."""
    from .operators.pipeline import release_diff

    d = _t(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 10 < 9)
    new = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 20 == 0,
            F.concat(F.col("text"), F.lit(" updated claim")),
        ).otherwise(F.col("text")),
    )
    return release_diff(old, new)


SQL_RELEASE_DIFF = """
WITH o AS (
  SELECT doc_id, lang, md5(text) AS fp,
         len(string_split_regex(trim(text), '\\s+'))::BIGINT AS tok
  FROM documents WHERE doc_id % 10 < 9
), n AS (
  SELECT doc_id, lang,
         md5(CASE WHEN doc_id % 20 = 0 THEN text || ' updated claim'
                  ELSE text END) AS fp,
         len(string_split_regex(trim(
           CASE WHEN doc_id % 20 = 0 THEN text || ' updated claim'
                ELSE text END), '\\s+'))::BIGINT AS tok
  FROM documents
), j AS (
  SELECT coalesce(n.lang, o.lang) AS lang,
         CASE WHEN o.fp IS NULL THEN 'added'
              WHEN n.fp IS NULL THEN 'removed'
              WHEN o.fp <> n.fp THEN 'changed'
              ELSE 'unchanged' END AS st,
         coalesce(o.tok, 0) AS t_o, coalesce(n.tok, 0) AS t_n
  FROM o FULL OUTER JOIN n USING (doc_id)
)
SELECT lang,
       sum(CASE WHEN st = 'added' THEN 1 ELSE 0 END)::BIGINT AS n_added,
       sum(CASE WHEN st = 'removed' THEN 1 ELSE 0 END)::BIGINT AS n_removed,
       sum(CASE WHEN st = 'changed' THEN 1 ELSE 0 END)::BIGINT AS n_changed,
       sum(CASE WHEN st = 'unchanged' THEN 1 ELSE 0 END)::BIGINT
         AS n_unchanged,
       sum(t_o)::BIGINT AS tokens_old,
       sum(t_n)::BIGINT AS tokens_new,
       (sum(t_n) - sum(t_o))::BIGINT AS token_delta
FROM j GROUP BY lang
"""
