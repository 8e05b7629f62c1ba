"""Sketch, temporal-join, and graph queries: HLL distinct-count, as-of
join, bucketized range join, integer PageRank. Companion operator
modules: `operators/sketch.py`, `operators/temporal.py`,
`operators/graph.py` (scale notes there).

Oracle strategy follows the repo's portable discipline: hashes are
md5h60 (DuckDB-reproducible), ranks use `bin()`/`length()` which exist
with identical semantics in both engines, the one float step in the HLL
estimate is a fixed-shape IEEE divide by an embedded repr(float)
literal, time is integer epoch-microseconds, and money is cents. The
as-of oracle is an INDEPENDENT formulation (DuckDB LATERAL subquery vs
Spark's union+window), as is the range oracle (plain inequality join vs
Spark's grid-bucketed equi-join) — the implementations share no shape,
only semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.sketch import HLL_EST_NUM, HLL_M, HLL_P, hll_distinct
from .operators.temporal import asof_join, range_join_bucketed


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- T-HLL: distinct parts over the fact table via a 256-row shuffle -------


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l_partkey over lineitem, sketched: the shuffle moves at
    most 256 register rows per scan task instead of every distinct key.
    `exact_distinct` rides along for self-validation (cheap at test SF;
    at 100 TB it is exactly the shuffle the sketch avoids)."""
    li = _t(spark, sf_dir, "lineitem")
    est = hll_distinct(li, "l_partkey")
    exact = li.agg(
        F.countDistinct("l_partkey").cast("long").alias("exact_distinct")
    )
    return est.crossJoin(F.broadcast(exact))


_LOW = 1 << (60 - HLL_P)  # 2^52: split point between register and rank bits

SQL_HLL_DISTINCT = f"""
WITH h AS (
  SELECT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM lineitem
),
s AS (SELECT h // {_LOW} AS register, h % {_LOW} AS low FROM h),
reg AS (
  SELECT register,
         MAX(CASE WHEN low = 0 THEN 53 ELSE 53 - length(bin(low)) END) AS rho
  FROM s GROUP BY register
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS regs_seen,
         CAST({HLL_M} - count(*) AS BIGINT) AS zeros,
         CAST(sum(1::BIGINT << (53 - rho))
              + ({HLL_M} - count(*)) * (1::BIGINT << 53) AS BIGINT) AS z_scaled
  FROM reg
)
SELECT regs_seen, zeros, z_scaled,
       CAST(floor({HLL_EST_NUM!r} / CAST(z_scaled AS DOUBLE)) AS BIGINT)
         AS est_milli,
       (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem)
         AS exact_distinct
FROM agg
"""


# --- T-ASOF: most recent prior click before each error ---------------------


def q_asof_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every 'error' event: the same user's most recent strictly-
    prior 'click' (id + value in cents). Union + one window partitioned
    by user_id — never an inequality join."""
    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error")
    clicks = ev.filter(F.col("event_type") == "click")
    out = asof_join(
        errors,
        clicks,
        key="user_id",
        ts_col="ts",
        tiebreak_col="event_id",
        carry_cols=["event_id", "value"],
    )
    return out.select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("user_id"),
        F.col("prior_event_id"),
        F.round(F.col("prior_value") * 100, 0).cast("long").alias(
            "prior_value_cents"
        ),
    )


SQL_ASOF_PRIOR_CLICK = """
SELECT l.event_id,
       epoch_us(l.ts) AS ts_us,
       l.user_id,
       p.event_id AS prior_event_id,
       CAST(round(p.value * 100, 0) AS BIGINT) AS prior_value_cents
FROM events l
LEFT JOIN LATERAL (
  SELECT r.event_id, r.value
  FROM events r
  WHERE r.user_id = l.user_id AND r.event_type = 'click' AND r.ts < l.ts
  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1
) p ON true
WHERE l.event_type = 'error'
"""


# --- T-RANGE: activity inside the 10 minutes after each error --------------

_WINDOW_US = 600_000_000  # 10 minutes


def q_error_window_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event: how many events (any type, same user, the error
    itself included) land in [error_ts, error_ts + 10 min), and their
    value total in cents. Grid-bucketed equi-join — candidates bounded
    at 2x matches, no theta join."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
        "value",
    )
    intervals = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("interval_id"),
        F.col("user_id"),
        F.col("ts_us").alias("start_us"),
        (F.col("ts_us") + F.lit(_WINDOW_US)).alias("end_us"),
    )
    hits = range_join_bucketed(
        ev.select("event_id", "user_id", "ts_us", "value"),
        intervals,
        key="user_id",
        ts_col="ts_us",
        start_col="start_us",
        end_col="end_us",
        grid_us=_WINDOW_US,
    )
    return hits.groupBy("interval_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "sum_value_cents"
        ),
    )


SQL_ERROR_WINDOW_ACTIVITY = f"""
SELECT i.event_id AS interval_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type = 'error') i
JOIN (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events) e
  ON e.user_id = i.user_id
 AND e.ts_us >= i.ts_us
 AND e.ts_us < i.ts_us + {_WINDOW_US}
GROUP BY i.event_id
"""


# --- T-HLLG: per-group HLL (GROUP BY approx distinct) ----------------------


def q_hll_group_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct order count PER RETURNFLAG via grouped HLL — the
    `GROUP BY approx_count_distinct` shape: the shuffle carries at most
    groups × 256 register rows however many lineitems were scanned
    (each group holds thousands of distinct orders — well inside the
    raw-HLL regime). `exact_distinct` rides along for self-validation
    (at 100 TB it is the full-key shuffle the sketch replaces)."""
    from .operators.sketch import hll_estimate, hll_registers

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_orderkey")
    est = hll_estimate(
        hll_registers(li, "l_orderkey", group_cols=["l_returnflag"]),
        group_cols=["l_returnflag"],
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").cast("long").alias("exact_distinct")
    )
    return est.join(exact, "l_returnflag")


SQL_HLL_GROUP_DISTINCT = f"""
WITH h AS (
  SELECT l_returnflag,
         ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM lineitem
), s AS (
  SELECT l_returnflag, h // {_LOW} AS register, h % {_LOW} AS low FROM h
),
reg AS (
  SELECT l_returnflag, register,
         MAX(CASE WHEN low = 0 THEN 53 ELSE 53 - length(bin(low)) END) AS rho
  FROM s GROUP BY l_returnflag, register
),
agg AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS regs_seen,
         CAST({HLL_M} - count(*) AS BIGINT) AS zeros,
         CAST(sum(1::BIGINT << (53 - rho))
              + ({HLL_M} - count(*)) * (1::BIGINT << 53) AS BIGINT) AS z_scaled
  FROM reg GROUP BY l_returnflag
),
exact AS (
  SELECT l_returnflag, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
  FROM lineitem GROUP BY l_returnflag
)
SELECT a.l_returnflag, a.regs_seen, a.zeros, a.z_scaled,
       CAST(floor({HLL_EST_NUM!r} / CAST(a.z_scaled AS DOUBLE)) AS BIGINT)
         AS est_milli,
       e.exact_distinct
FROM agg a JOIN exact e ON e.l_returnflag = a.l_returnflag
"""


# --- T-WIN: tumbling-window event rates ------------------------------------


def q_tumbling_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type per 1-hour tumbling window: event count and value
    total in cents — expressed with F.window, the construct that is
    IDENTICAL in Structured Streaming (swap read → readStream and this
    exact aggregation runs incrementally with a watermark; the batch
    twin is what the oracle checks). One groupBy shuffle on
    (type, window), map-side combined."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "sum_value_cents"
            ),
        )
        .select(
            "event_type",
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n",
            "sum_value_cents",
        )
    )


SQL_TUMBLING_RATES = """
SELECT event_type,
       (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events
GROUP BY event_type, (epoch_us(ts) // 3600000000) * 3600000000
"""


# --- T-CMS: Count-Min token-frequency sketch -------------------------------


def q_cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequencies of the exact top-20 tokens, point-queried from
    a 4×1024 Count-Min sketch next to their exact counts. The sketch
    shuffle is at most d*w cells per scan task (map-side combine) — the
    heavy-hitter shape at token volumes where an exact groupBy of the
    full vocabulary is the dominant shuffle. est >= exact_cnt always
    (CMS overcounts only)."""
    from .operators.sketch import cms_counters, cms_lookup

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    counters = cms_counters(toks, "token")
    top = (
        toks.groupBy("token")
        .agg(F.count("*").cast("long").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("token").asc())
        .limit(20)
    )
    return cms_lookup(counters, top, "token")


SQL_CMS_TOKEN_FREQ = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), cells AS (
  SELECT r.i AS rw,
         ('0x' || substr(md5(token || '#cms' || r.i::VARCHAR), 1, 15))::BIGINT
           % 1024 AS bucket,
         count(*) AS cnt
  FROM toks CROSS JOIN range(4) r(i)
  GROUP BY 1, 2
), top AS (
  SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM toks GROUP BY token
  ORDER BY exact_cnt DESC, token ASC LIMIT 20
)
SELECT t.token, t.exact_cnt, CAST(min(c.cnt) AS BIGINT) AS est
FROM top t
CROSS JOIN range(4) r(i)
JOIN cells c
  ON c.rw = r.i
 AND c.bucket = ('0x' || substr(md5(t.token || '#cms' || r.i::VARCHAR), 1, 15))::BIGINT
                % 1024
GROUP BY t.token, t.exact_cnt
"""


# --- T-QNT: int8 embedding quantization ------------------------------------


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization of the embedding store (see
    operators/similarity.py::quantize_embeddings). Oracle checks the
    integer aggregates (q_sum, q_norm) and floor-micro scale — the
    array column itself stays Spark-side."""
    from .operators.similarity import quantize_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    return quantize_embeddings(emb).select(
        "vec_id", "scale_micro", "q_sum", "q_norm"
    )


SQL_EMBEDDING_QUANTIZE = """
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
           AS maxabs
  FROM embeddings
), sc AS (
  SELECT vec_id, embedding,
         CASE WHEN maxabs = 0 THEN 1.0 ELSE maxabs / 127 END AS scale
  FROM s
), q AS (
  SELECT vec_id, scale,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) / scale)
                                  AS BIGINT)) AS qv
  FROM sc
)
SELECT vec_id,
       CAST(floor(scale * 1000000.0) AS BIGINT) AS scale_micro,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       CAST(list_sum(list_transform(qv, y -> y * y)) AS BIGINT) AS q_norm
FROM q
"""


# --- T-SAMP: deterministic fixed-SIZE uniform sample -----------------------


def q_uniform_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k uniform corpus sample (k=100) by hash rank: order by
    md5h60('samp:' || doc_id), take k. Complements stratified_sample
    (fixed RATE): rate sampling cannot hit an exact training-budget row
    count; hash-rank sampling is exactly-k, deterministic, retry-safe,
    and stays a TakeOrderedAndProject (per-partition heaps of k — no
    global sort of the corpus, no RNG, same k rows on any cluster)."""
    from .operators.dedup import md5h60

    docs = _t(spark, sf_dir, "documents")
    rank = md5h60(F.concat(F.lit("samp:"), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", "lang", rank.alias("samp_rank"))
        .orderBy("samp_rank", "doc_id")
        .limit(100)
    )


SQL_UNIFORM_SAMPLE = """
SELECT doc_id, lang,
       ('0x' || substr(md5('samp:' || doc_id::VARCHAR), 1, 15))::BIGINT
         AS samp_rank
FROM documents
ORDER BY samp_rank, doc_id
LIMIT 100
"""


# --- T-CB: circuit-breaker batch twin over the event log -------------------


def q_circuit_open(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user error circuit breaker (threshold 3): the timestamp of
    the 3rd CONSECUTIVE error per failure run — the batch twin of the
    applyInPandasWithState streaming operator (streaming/circuit.py;
    streaming↔batch row-identity pinned in tests/test_streaming.py).
    Gaps-and-islands over user-partitioned windows — order-dependent
    semantics no windowed aggregation can express."""
    from .streaming.circuit import circuit_events_batch

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("host"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("event_id").alias("url_hash"),
        (F.col("event_type") != "error").alias("ok"),
    )
    return circuit_events_batch(ev, threshold=3).select(
        F.col("host").cast("long").alias("user_id"),
        "opened_at_us",
        "run_len",
    )


SQL_CIRCUIT_OPEN = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         (event_type <> 'error') AS ok
  FROM events
), t AS (
  SELECT *, sum(CASE WHEN ok THEN 1 ELSE 0 END) OVER (
    PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING
  ) AS island FROM e
), f AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id, island ORDER BY ts_us, event_id
  ) AS pos FROM t WHERE NOT ok
)
SELECT user_id, ts_us AS opened_at_us, CAST(pos AS INT) AS run_len
FROM f WHERE pos = 3
"""


# --- T-PR: integer PageRank over a deterministic link graph ----------------

_PR_FANOUT = 3
_PR_ITERS = 5


def _doc_link_edges(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic link graph over dense doc_ids: each doc
    links to _PR_FANOUT targets md5h60(doc_id ':' k) % n_docs — pure
    hash arithmetic, identically reproducible in SQL (no external link
    data; the real deployment feeds extract_links output here)."""
    from .operators.dedup import md5h60

    n = docs.agg(F.count("*").cast("long").alias("_n"))
    return (
        docs.select(F.col("doc_id").alias("src"))
        .crossJoin(F.broadcast(n))
        .select(
            "src",
            F.explode(
                F.array(*[
                    md5h60(
                        F.concat(F.col("src").cast("string"), F.lit(f":{k}"))
                    )
                    % F.col("_n")
                    for k in range(_PR_FANOUT)
                ])
            ).alias("dst"),
        )
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer PageRank (5 iterations, damping 0.85) over the
    deterministic doc link graph — link-structure authority for recrawl
    scheduling / training-mix weighting. Bit-identical under any
    partitioning (integer contributions only; operators/graph.py)."""
    from .operators.graph import pagerank_integer

    docs = _t(spark, sf_dir, "documents")
    edges = _doc_link_edges(docs)
    nodes = docs.select(F.col("doc_id").alias("node"))
    out = pagerank_integer(edges, nodes, iterations=_PR_ITERS)
    return out.select(F.col("node").alias("doc_id"), "rank_micro")


def _sql_pagerank() -> str:
    """The same integer recurrence unrolled as a CTE chain (recursive
    CTEs cannot aggregate in the recursive term; generation mirrors the
    repo's generated-literal oracle pattern)."""
    head = f"""
WITH nodes AS (SELECT doc_id AS node FROM documents),
edges AS (
  SELECT doc_id AS src,
         ('0x' || substr(md5(doc_id::VARCHAR || ':' || k.i::VARCHAR), 1, 15))::BIGINT
           % (SELECT count(*) FROM documents) AS dst
  FROM documents, range({_PR_FANOUT}) k(i)
),
deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes)"""
    steps = []
    for i in range(_PR_ITERS):
        steps.append(f""",
pr{i + 1} AS (
  SELECT nd.node,
         CAST(150000 + coalesce(s.c, 0) AS BIGINT) AS rank
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node,
           CAST(sum((p.rank * 850) // (1000 * d.out_deg)) AS BIGINT) AS c
    FROM edges e
    JOIN deg d ON d.src = e.src
    JOIN pr{i} p ON p.node = e.src
    GROUP BY e.dst
  ) s ON s.node = nd.node
)""")
    return (
        head
        + "".join(steps)
        + f"\nSELECT node AS doc_id, rank AS rank_micro FROM pr{_PR_ITERS}"
    )


SQL_PAGERANK = _sql_pagerank()


# --- X49: KMV distinct sketch + set algebra --------------------------------


def q_kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-slice overlap from KMV sketches (k=64): long documents
    (A = doc_ids with n_chars ≥ 500) vs English documents (B = doc_ids
    with lang='en') — |A|, |B|, |A∪B| and |A∩B| estimates in integer
    milli-units, one row. A is smaller than k (partial sketch ⇒ exact
    branch), B larger (full sketch ⇒ estimator branch), overlap genuinely
    partial — the set-algebra question HLL cannot answer
    (operators/sketch.py::kmv_set_overlap). Sketches are ≤k rows and
    persistable: production answers every later overlap question without
    rescanning either slice."""
    from .operators.sketch import kmv_set_overlap

    docs = _t(spark, sf_dir, "documents")
    return kmv_set_overlap(
        docs.filter(F.col("n_chars") >= 500), "doc_id",
        docs.filter(F.col("lang") == "en"), "doc_id",
        k=64,
    )


def _sql_kmv(expr: str, table: str, k: int) -> str:
    return (
        f"SELECT DISTINCT ('0x' || substr(md5('kmv:' || {expr}::VARCHAR), 1, 15))::BIGINT AS h "
        f"FROM {table} ORDER BY h LIMIT {k}"
    )


def _sql_kmv_est(n: str, mx: str, k: int) -> str:
    # identical float shape to sketch.py::_kmv_est_milli: ((n-1.0)·1000.0
    # ·2^60)/max, every literal cast to DOUBLE (a bare fractional literal
    # is DECIMAL in both engines — that would change the rounding shape)
    return (
        f"CASE WHEN {n} >= {k} THEN "
        f"floor((({n}::DOUBLE - 1.0::DOUBLE) * 1000.0::DOUBLE * "
        f"1152921504606846976.0::DOUBLE) / {mx}::DOUBLE)::BIGINT "
        f"ELSE ({n} * 1000)::BIGINT END"
    )


SQL_KMV_SET_OVERLAP = f"""
WITH sa AS ({_sql_kmv("doc_id", "documents WHERE n_chars >= 500", 64)}),
sb AS ({_sql_kmv("doc_id", "documents WHERE lang = 'en'", 64)}),
merged AS (
  SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb) ORDER BY h LIMIT 64
),
stats AS (
  SELECT (SELECT count(*) FROM sa) AS n_a, (SELECT max(h) FROM sa) AS max_a,
         (SELECT count(*) FROM sb) AS n_b, (SELECT max(h) FROM sb) AS max_b,
         (SELECT count(*) FROM merged) AS kk,
         (SELECT max(h) FROM merged) AS max_u,
         (SELECT count(*) FROM merged m
           WHERE m.h IN (SELECT h FROM sa) AND m.h IN (SELECT h FROM sb)) AS rho
),
est AS (
  SELECT n_a, n_b, kk, rho,
         {_sql_kmv_est("n_a", "max_a", 64)} AS a_est_milli,
         {_sql_kmv_est("n_b", "max_b", 64)} AS b_est_milli,
         {_sql_kmv_est("kk", "max_u", 64)} AS union_est_milli
  FROM stats
)
SELECT n_a, n_b, kk, rho, a_est_milli, b_est_milli, union_est_milli,
       ((rho * union_est_milli) // greatest(kk, 1))::BIGINT AS inter_est_milli
FROM est
"""


# --- X50: systematic weighted sampling (probability ∝ size) ----------------


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k sample with inclusion probability ∝ n_chars (k=100):
    systematic PPS over the doc_id-ordered cumulative-weight line, pure
    integer arithmetic — deterministic on any cluster, no RNG, no
    transcendentals (cross-engine ln/pow rounding is why A-ES was NOT
    used). Long docs can be picked more than once (n_picks ≥ 2 ⇒ weight
    > W/k), exactly like PPS sampling with replacement; Σ n_picks = k.
    The cumulative sum is the two-level bucketed pattern — never a
    partition-less window over data (operators/pipeline.py::
    systematic_weighted_sample)."""
    from .operators.pipeline import systematic_weighted_sample

    docs = _t(spark, sf_dir, "documents")
    return systematic_weighted_sample(
        docs, weight_col="n_chars", k=100, order_col="doc_id"
    )


SQL_WEIGHTED_SAMPLE = """
WITH cum AS (
  SELECT doc_id, n_chars,
         SUM(coalesce(n_chars, 0)) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS c,
         SUM(coalesce(n_chars, 0)) OVER ()::BIGINT AS w
  FROM documents
)
SELECT doc_id, n_chars,
       ((100 * c) // w - (100 * (c - coalesce(n_chars, 0))) // w)::BIGINT
         AS n_picks
FROM cum
WHERE (100 * c) // w - (100 * (c - coalesce(n_chars, 0))) // w >= 1
"""


# --- X44: streaming-native sessionization (F.session_window) --------------
#
# q_user_sessions oracles the window/lag batch sessionizer; THIS entry
# oracles the Structured-Streaming-native formulation directly (VERDICT
# r04 item 7) — same event log, same 21600 s gap, value-checked against
# an independent DuckDB gap-islands rewrite. Both split only at
# gap > g (Spark's session window closes at last_event + g INCLUSIVE),
# which is exactly what `> {gap}` in the oracle's new-session predicate
# encodes. Streaming relevance: this same expression runs unchanged
# under readStream + watermark — the batch/streaming twin property
# test_session_window_matches_sessionize pins.

SW_GAP_S = 21600


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window(
                F.col("ts").cast("timestamp"), f"{SW_GAP_S} seconds"
            ).alias("sw"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("start_us"),
            F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("end_us"),
        )
        .select("user_id", "start_us", "end_us", "n_events")
    )


SQL_SESSION_WINDOW = f"""
WITH t AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {SW_GAP_S * 1_000_000}
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
SELECT user_id, min(us) AS start_us, max(us) AS end_us,
       count(*) AS n_events
FROM s GROUP BY user_id, session_seq
"""


# --- X112: sliding-window HLL distinct (register merge across hops) ---------


def q_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X112: distinct users per 3-hour sliding window over events via
    HLL register max-merge (operators/sketch.py::hll_sliding_distinct)
    — the stream is sketched once per hourly tumble, every overlapping
    window merges 256-row sketches instead of re-shuffling keys.
    `exact_distinct` rides along (the same hop-explode on raw rows +
    windowed countDistinct — exactly the full-key shuffle the sketch
    replaces at 100 TB)."""
    from .operators.sketch import hll_sliding_distinct

    ev = _t(spark, sf_dir, "events")
    est = hll_sliding_distinct(ev, "user_id", ts_col="ts", hops=3)
    raw = ev.select(
        F.explode(
            F.array(*[
                F.expr(f"date_trunc('hour', ts) + INTERVAL {k} HOUR")
                for k in range(3)
            ])
        ).alias("win_end"),
        "user_id",
    )
    exact = raw.groupBy("win_end").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return est.join(exact, "win_end")


SQL_HLL_SLIDING = f"""
WITH h AS (
  SELECT date_trunc('hour', ts) AS tb,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
), s AS (
  SELECT tb, h // {_LOW} AS register, h % {_LOW} AS low FROM h
), reg AS (
  SELECT tb, register,
         MAX(CASE WHEN low = 0 THEN 53 ELSE 53 - length(bin(low)) END) AS rho
  FROM s GROUP BY tb, register
), wins AS (
  SELECT tb + k * INTERVAL 1 HOUR AS win_end, register, rho
  FROM reg CROSS JOIN (SELECT unnest([0, 1, 2]) AS k)
), merged AS (
  SELECT win_end, register, MAX(rho) AS rho
  FROM wins GROUP BY win_end, register
), agg AS (
  SELECT win_end,
         CAST(count(*) AS BIGINT) AS regs_seen,
         CAST({HLL_M} - count(*) AS BIGINT) AS zeros,
         CAST(sum(1::BIGINT << (53 - rho))
              + ({HLL_M} - count(*)) * (1::BIGINT << 53) AS BIGINT) AS z_scaled
  FROM merged GROUP BY win_end
), exact AS (
  SELECT win_end, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM (
    SELECT date_trunc('hour', ts) + k * INTERVAL 1 HOUR AS win_end, user_id
    FROM events CROSS JOIN (SELECT unnest([0, 1, 2]) AS k)
  ) GROUP BY win_end
)
SELECT a.win_end, a.regs_seen, a.zeros, a.z_scaled,
       CAST(floor({HLL_EST_NUM!r} / CAST(a.z_scaled AS DOUBLE)) AS BIGINT)
         AS est_milli,
       e.exact_distinct
FROM agg a JOIN exact e ON e.win_end = a.win_end
"""


def register(
    queries: dict[str, Callable[[SparkSession, str], DataFrame]],
    oracles: dict[str, str],
) -> None:
    queries.update(
        {
            "q_session_window": q_session_window,
            "q_hll_distinct": q_hll_distinct,
            "q_hll_sliding": q_hll_sliding,
            "q_asof_prior_click": q_asof_prior_click,
            "q_error_window_activity": q_error_window_activity,
            "q_pagerank": q_pagerank,
            "q_cms_token_freq": q_cms_token_freq,
            "q_tumbling_rates": q_tumbling_rates,
            "q_hll_group_distinct": q_hll_group_distinct,
            "q_circuit_open": q_circuit_open,
            "q_uniform_sample": q_uniform_sample,
            "q_embedding_quantize": q_embedding_quantize,
            "q_kmv_set_overlap": q_kmv_set_overlap,
            "q_weighted_sample": q_weighted_sample,
            "q_quant_recall": q_quant_recall,
        }
    )
    oracles.update(
        {
            "q_session_window": SQL_SESSION_WINDOW,
            "q_hll_distinct": SQL_HLL_DISTINCT,
            "q_hll_sliding": SQL_HLL_SLIDING,
            "q_asof_prior_click": SQL_ASOF_PRIOR_CLICK,
            "q_error_window_activity": SQL_ERROR_WINDOW_ACTIVITY,
            "q_pagerank": SQL_PAGERANK,
            "q_cms_token_freq": SQL_CMS_TOKEN_FREQ,
            "q_tumbling_rates": SQL_TUMBLING_RATES,
            "q_hll_group_distinct": SQL_HLL_GROUP_DISTINCT,
            "q_circuit_open": SQL_CIRCUIT_OPEN,
            "q_uniform_sample": SQL_UNIFORM_SAMPLE,
            "q_embedding_quantize": SQL_EMBEDDING_QUANTIZE,
            "q_kmv_set_overlap": SQL_KMV_SET_OVERLAP,
            "q_weighted_sample": SQL_WEIGHTED_SAMPLE,
            "q_quant_recall": SQL_QUANT_RECALL,
        }
    )


# --- X145: int8 quantization recall audit ----------------------------------


def q_quant_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X145: recall@10 of the int8-quantized inner-product ranking vs
    the full-precision reference, per query (operators/similarity.py::
    quantization_recall — the acceptance gate before an embedding
    store ships compressed). Queries are every 25th vector (20 probes
    over the 500-vector store)."""
    from .operators.similarity import quantization_recall

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    return quantization_recall(emb, queries, k=10)


SQL_QUANT_RECALL = """
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
           AS maxabs
  FROM embeddings
), sc AS (
  SELECT vec_id, embedding,
         CASE WHEN maxabs = 0 THEN 1.0 ELSE maxabs / 127 END AS scale
  FROM s
), cand AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         CAST(floor(scale * 1000000.0) AS BIGINT) AS sm,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) / scale)
                                  AS BIGINT)) AS qv
  FROM sc
), qrs AS (
  SELECT vec_id AS query_id, e AS qe, sm AS q_sm, qv AS qqv
  FROM cand WHERE vec_id % 25 = 0
), j AS (
  SELECT c.vec_id, r.query_id,
         round(list_dot_product(c.e, r.qe), 6) AS ref,
         CAST(list_dot_product(list_transform(c.qv, y -> CAST(y AS DOUBLE)),
                               list_transform(r.qqv, y -> CAST(y AS DOUBLE)))
              AS BIGINT)::HUGEINT * c.sm * r.q_sm AS qs
  FROM cand c, qrs r
), rk AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY ref DESC, vec_id) AS rr,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY qs DESC, vec_id) AS rq
  FROM j
)
SELECT query_id, 10::BIGINT AS k,
       sum(CASE WHEN rr <= 10 AND rq <= 10 THEN 1 ELSE 0 END)::BIGINT
         AS overlap,
       ((1000 * sum(CASE WHEN rr <= 10 AND rq <= 10 THEN 1 ELSE 0 END)) // 10)
         ::BIGINT AS recall_milli
FROM rk GROUP BY query_id
"""
