"""Analytics queries over the TPC-H-shaped tables (lineitem / orders /
customer / events) — the reporting layer a crawl+curation deployment
runs over its own telemetry and billing-grade tables.

Numeric discipline: every money/measure column is quantized to exact
integer units (cents, cent-percent) BEFORE aggregation — distributed
float sums are accumulation-order-dependent and cannot carry a value
oracle; integer sums are exact under any partitioning/AQE re-plan
(same rule as operators/pipeline.py::lang_centroid_quantized). The
source doubles are 2-decimal by construction (verified |x*100 -
round(x*100)| < 1e-9 at every SF), so the quantization is lossless.

Scale notes (100 TB):
* q_pricing_summary — single groupBy on a 6-value key: map-side partial
  aggregation collapses each scan task to ≤6 rows before the shuffle.
* q_top_revenue — dimension side (filtered customer) broadcast, fact
  tables hash-join on orderkey, then TakeOrderedAndProject for the
  top-k (per-partition heaps; no global sort).
* q_event_outliers — per-type moment aggregates (5 rows) broadcast back
  onto the event stream: two scans, one tiny shuffle, no window over
  the full log.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col) -> F.Column:
    return F.round(col * 100, 0).cast("long")


# --- A-PRC: pricing summary (TPC-H Q1 twin, exact integer units) ----------

PRICING_CUTOFF = "1998-12-01 00:00:00"


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """Pricing summary report per (returnflag, linestatus) over shipped
    lineitems: quantities, base price, discounted price, charge — all in
    exact integer units (cents / cent-percent / cent-percent-percent),
    so the distributed sums are reproducible and value-oracled.
    avg_price_cents uses floor(sum/count) in double (both operands exact
    and < 2^53)."""
    li = lineitem.filter(
        F.col("l_shipdate") <= F.expr(f"TIMESTAMP_NTZ '{PRICING_CUTOFF}'")
    )
    cents = _cents(F.col("l_extendedprice"))
    disc_pct = _cents(F.col("l_discount"))  # 0..10 (percent, exact)
    tax_pct = _cents(F.col("l_tax"))
    qty = F.col("l_quantity").cast("long")
    return (
        li.select(
            "l_returnflag",
            "l_linestatus",
            qty.alias("qty"),
            cents.alias("base_c"),
            (cents * (100 - disc_pct)).alias("disc_cp"),
            (cents * (100 - disc_pct) * (100 + tax_pct)).alias("charge_cpp"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").alias("sum_qty"),
            F.sum("base_c").alias("sum_base_cents"),
            F.sum("disc_cp").alias("sum_disc_cp"),
            F.sum("charge_cpp").alias("sum_charge_cpp"),
            F.count("*").alias("count_order"),
            F.floor(F.sum("base_c") / F.count("*")).cast("long").alias(
                "avg_price_cents"
            ),
        )
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pricing_summary(_t(spark, sf_dir, "lineitem"))


SQL_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(qty) AS BIGINT) AS sum_qty,
       CAST(sum(base_c) AS BIGINT) AS sum_base_cents,
       CAST(sum(disc_cp) AS BIGINT) AS sum_disc_cp,
       CAST(sum(charge_cpp) AS BIGINT) AS sum_charge_cpp,
       count(*) AS count_order,
       CAST(floor(CAST(sum(base_c) AS BIGINT) * 1.0 / count(*)) AS BIGINT)
           AS avg_price_cents
FROM (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS base_c,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS disc_cp,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
           * (100 + CAST(round(l_tax * 100, 0) AS BIGINT)) AS charge_cpp
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF}'
)
GROUP BY l_returnflag, l_linestatus
"""


# --- A-REV: top revenue orders (TPC-H Q3 twin) ----------------------------

REV_SEGMENT = "BUILDING"
REV_DATE = "1998-01-01 00:00:00"
REV_TOPK = 10


def q_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 unshipped-revenue orders for one market segment: broadcast
    the filtered customer dim, hash-join orders→lineitem on orderkey,
    aggregate exact cent-percent revenue, distributed top-k."""
    cust = F.broadcast(
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == REV_SEGMENT)
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.expr(f"TIMESTAMP_NTZ '{REV_DATE}'")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.expr(f"TIMESTAMP_NTZ '{REV_DATE}'")
    )
    cents = _cents(F.col("l_extendedprice"))
    disc_pct = _cents(F.col("l_discount"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(cents * (100 - disc_pct)).alias("revenue_cp"))
        .orderBy(F.col("revenue_cp").desc(), F.col("l_orderkey").asc())
        .limit(REV_TOPK)
    )


SQL_TOP_REVENUE = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
            AS BIGINT) AS revenue_cp
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{REV_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{REV_DATE}'
  AND l_shipdate > TIMESTAMP '{REV_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cp DESC, l_orderkey ASC
LIMIT {REV_TOPK}
"""


# --- A-OUT: per-type z-score outliers -------------------------------------

OUTLIER_Z_MILLI = 2500  # |z| >= 2.5


def q_event_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry outlier flagging: per-event-type z-score of the value
    column. Moments are exact integer sums (value quantized to cents),
    z derived via the numerically-order-free form
    z = (v - mu)/sigma = (n*v - s1) / sqrt(n*s2 - s1^2) — every double
    op consumes exact integers, so Spark and the oracle compute
    bit-identical doubles. The 5-row moment table broadcasts back onto
    the stream. Emits only the flagged rows (|z| >= 2.5)."""
    e = _t(spark, sf_dir, "events")
    v = _cents(F.col("value"))
    base = e.select("event_id", "event_type", v.alias("v"))
    stats = base.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    j = base.join(F.broadcast(stats), "event_type")
    num = F.col("n") * F.col("v") - F.col("s1")
    den = F.sqrt(
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
    )
    z_milli = F.floor(num.cast("double") * 1000.0 / den).cast("long")
    return (
        j.select(
            "event_id",
            "event_type",
            F.col("v").alias("value_cents"),
            z_milli.alias("z_milli"),
        )
        .filter((F.col("z_milli") >= OUTLIER_Z_MILLI) | (F.col("z_milli") < -OUTLIER_Z_MILLI))
    )


SQL_EVENT_OUTLIERS = f"""
WITH base AS (
  SELECT event_id, event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS v
  FROM events
), stats AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(v) AS BIGINT) AS s1,
         CAST(sum(v * v) AS BIGINT) AS s2
  FROM base GROUP BY event_type
), scored AS (
  SELECT b.event_id, b.event_type, b.v AS value_cents,
         CAST(floor(CAST(s.n * b.v - s.s1 AS DOUBLE) * 1000.0
                    / sqrt(CAST(s.n * s.s2 - s.s1 * s.s1 AS DOUBLE)))
              AS BIGINT) AS z_milli
  FROM base b JOIN stats s USING (event_type)
)
SELECT event_id, event_type, value_cents, z_milli
FROM scored
WHERE z_milli >= {OUTLIER_Z_MILLI} OR z_milli < -{OUTLIER_Z_MILLI}
"""


# --- A-BM25: relevance scoring (rational-idf BM25, exact micro-units) -----

BM25_TERMS = ["hash", "join", "vector", "stream"]
BM25_TOPK = 25


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 documents by BM25 relevance to a fixed query-term set.
    See operators/text.py::bm25_score for the numeric discipline (rational
    idf — no ln, which is not correctly-rounded-identical across JVM libm
    and DuckDB — and per-term micro-unit flooring before the sum)."""
    from .operators.text import bm25_score

    scored = bm25_score(_t(spark, sf_dir, "documents"), BM25_TERMS)
    return scored.orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    ).limit(BM25_TOPK)


def _sql_bm25() -> str:
    tf_cols = ",\n         ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    contribs = "\n       + ".join(
        f"""CASE WHEN tf_{i} > 0 THEN CAST(floor(
           ((CAST(n_docs - df_{i} AS DOUBLE) + 0.5)
              / (CAST(df_{i} AS DOUBLE) + 0.5))
           * (CAST(tf_{i} AS DOUBLE) * 2.2)
           / (CAST(tf_{i} AS DOUBLE)
              + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE)
                   / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
           * 1000000.0) AS BIGINT) ELSE 0 END"""
        for i in range(len(BM25_TERMS))
    )
    matches = " + ".join(
        f"CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END"
        for i in range(len(BM25_TERMS))
    )
    return f"""
WITH tf AS (
  SELECT doc_id, len(toks) AS dl,
         {tf_cols}
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS toks
    FROM documents
  )
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS sum_dl,
         {df_cols}
  FROM tf
)
SELECT doc_id, score_micro, n_terms FROM (
  SELECT doc_id,
       ({contribs}) AS score_micro,
       ({matches}) AS n_terms
  FROM tf CROSS JOIN stats
)
WHERE score_micro > 0
ORDER BY score_micro DESC, doc_id ASC
LIMIT {BM25_TOPK}
"""


SQL_BM25_TOPK = _sql_bm25()


# --- A-PCT: exact per-type value percentiles (histogram nearest-rank) ------

PCT_PERMILLES = (500, 950, 990)


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p95/p99 of the telemetry value per event type — the
    histogram/nearest-rank exact-percentile operator (see
    operators/pipeline.py::exact_percentiles for why this beats a raw
    window at 100 TB)."""
    from .operators.pipeline import exact_percentiles

    e = _t(spark, sf_dir, "events").select(
        "event_type", _cents(F.col("value")).alias("value_cents")
    )
    return exact_percentiles(
        e, "event_type", "value_cents", permilles=PCT_PERMILLES
    )


def _sql_percentiles() -> str:
    picks = ",\n       ".join(
        f"""min(CASE WHEN cum >= CAST(floor(((n - 1) * {pm}) / 1000.0)
                         AS BIGINT) + 1 THEN v END) AS p{pm}"""
        for pm in PCT_PERMILLES
    )
    return f"""
WITH hist AS (
  SELECT event_type AS k,
         CAST(round(value * 100, 0) AS BIGINT) AS v,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT k, v,
    CAST(sum(cnt) OVER (PARTITION BY k ORDER BY v
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
    CAST(sum(cnt) OVER (PARTITION BY k) AS BIGINT) AS n
  FROM hist
)
SELECT k AS event_type, CAST(max(n) AS BIGINT) AS n,
       {picks}
FROM scored GROUP BY k
"""


SQL_VALUE_PERCENTILES = _sql_percentiles()


# --- A-REV: local-supplier revenue by nation (TPC-H Q5 twin) ---------------

REV_FROM = "1995-01-01 00:00:00"
REV_TO = "1996-01-01 00:00:00"
REV_REGION = "ASIA"


def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation from LOCAL supply chains (customer and
    supplier in the same nation) inside one region and order year —
    the five-table join chain of TPC-H Q5 in exact integer units.

    Plan shape (pinned in tests/test_analytics.py): region→nation→
    supplier are broadcast (tiny dims), the lineitem⋈orders⋈customer
    fact chain hash-joins on its keys, and revenue is summed in
    cent-percent units (cents × (100 − discount_pct)) — exact under
    any partitioning, so the oracle is value-level."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr(f"TIMESTAMP_NTZ '{REV_FROM}'"))
        & (F.col("o_orderdate") < F.expr(f"TIMESTAMP_NTZ '{REV_TO}'"))
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == REV_REGION)
    nat = F.broadcast(
        nation.join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        ).select("n_nationkey", "n_name")
    )
    rev_cp = (
        _cents(F.col("l_extendedprice"))
        * (F.lit(100) - _cents(F.col("l_discount")))
    ).cast("long")
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(nat, supp["s_nationkey"] == nat["n_nationkey"])
    )
    return (
        j.groupBy("n_name")
        .agg(F.sum(rev_cp).alias("revenue_cent_pct"))
        .orderBy(F.col("revenue_cent_pct").desc(), F.col("n_name").asc())
    )


SQL_NATION_REVENUE = f"""
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
            AS BIGINT) AS revenue_cent_pct
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{REV_REGION}'
  AND o_orderdate >= TIMESTAMP '{REV_FROM}'
  AND o_orderdate < TIMESTAMP '{REV_TO}'
GROUP BY n_name
ORDER BY revenue_cent_pct DESC, n_name ASC
"""


# --- A-SKEW: salted join on a maximally hot key ----------------------------


def q_salted_lang_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents joined to a per-language dim on `lang` — a ~3-value key,
    so a plain hash join funnels a third of the corpus into one task.
    salted_join spreads each language over 8 tasks; the result is
    row-identical to the plain join (the oracle IS the plain join)."""
    from .operators.pipeline import salted_join

    docs = _t(spark, sf_dir, "documents")
    dim = docs.groupBy("lang").agg(F.count("*").alias("lang_docs"))
    return salted_join(docs, dim, key="lang", row_key="doc_id").select(
        "doc_id", "lang", "lang_docs"
    )


SQL_SALTED_LANG_JOIN = """
WITH dim AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS lang_docs
  FROM documents GROUP BY lang
)
SELECT doc_id, lang, lang_docs
FROM documents JOIN dim USING (lang)
"""


# --- X87: grouped MAD robust outlier census ----------------------------------


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier fence per event type (operators/
    pipeline.py::mad_outliers): exact nearest-rank median of the cents-
    quantized value, exact median of |v - med|, integer fence
    1000*dev > 3000*MAD. The oracle recomputes both nearest-rank
    medians from the same histogram/cumulative formulation."""
    from .operators.pipeline import mad_outliers

    e = _t(spark, sf_dir, "events").select(
        "event_type", _cents(F.col("value")).alias("value_cents")
    )
    return mad_outliers(e, "event_type", "value_cents", k_milli=3000)


SQL_MAD_OUTLIERS = """
WITH base AS (
  SELECT event_type AS k, CAST(round(value * 100, 0) AS BIGINT) AS v FROM events
), h1 AS (
  SELECT k, v, count(*) AS cnt FROM base GROUP BY 1, 2
), s1 AS (
  SELECT k, v,
    CAST(sum(cnt) OVER (PARTITION BY k ORDER BY v
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
    CAST(sum(cnt) OVER (PARTITION BY k) AS BIGINT) AS n
  FROM h1
), med AS (
  SELECT k, min(CASE WHEN cum >= CAST(floor(((n - 1) * 500) / 1000.0)
                          AS BIGINT) + 1 THEN v END) AS med
  FROM s1 GROUP BY k
), dev AS (
  SELECT b.k, abs(b.v - m.med) AS d, m.med
  FROM base b JOIN med m USING (k)
), h2 AS (
  SELECT k, d, count(*) AS cnt FROM dev GROUP BY 1, 2
), s2 AS (
  SELECT k, d,
    CAST(sum(cnt) OVER (PARTITION BY k ORDER BY d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
    CAST(sum(cnt) OVER (PARTITION BY k) AS BIGINT) AS n
  FROM h2
), mad AS (
  SELECT k, min(CASE WHEN cum >= CAST(floor(((n - 1) * 500) / 1000.0)
                          AS BIGINT) + 1 THEN d END) AS mad
  FROM s2 GROUP BY k
)
SELECT d.k AS event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(max(d.med) AS BIGINT) AS med,
       CAST(max(ma.mad) AS BIGINT) AS mad,
       CAST(sum(CASE WHEN 1000 * d.d > 3000 * ma.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad ma ON d.k = ma.k
GROUP BY d.k
"""


def register(
    queries: dict[str, Callable[[SparkSession, str], DataFrame]],
    oracles: dict[str, str],
) -> None:
    queries.update(
        {
            "q_pricing_summary": q_pricing_summary,
            "q_top_revenue": q_top_revenue,
            "q_event_outliers": q_event_outliers,
            "q_bm25_topk": q_bm25_topk,
            "q_value_percentiles": q_value_percentiles,
            "q_salted_lang_join": q_salted_lang_join,
            "q_nation_revenue": q_nation_revenue,
            "q_mad_outliers": q_mad_outliers,
            "q_stats_ledger": q_stats_ledger,
            "q_k_anonymity": q_k_anonymity,
        }
    )
    oracles.update(
        {
            "q_pricing_summary": SQL_PRICING_SUMMARY,
            "q_top_revenue": SQL_TOP_REVENUE,
            "q_event_outliers": SQL_EVENT_OUTLIERS,
            "q_bm25_topk": SQL_BM25_TOPK,
            "q_value_percentiles": SQL_VALUE_PERCENTILES,
            "q_salted_lang_join": SQL_SALTED_LANG_JOIN,
            "q_nation_revenue": SQL_NATION_REVENUE,
            "q_mad_outliers": SQL_MAD_OUTLIERS,
            "q_stats_ledger": SQL_STATS_LEDGER,
            "q_k_anonymity": SQL_K_ANONYMITY,
        }
    )


# --- X148: mergeable exact-moments ledger ----------------------------------


def q_stats_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X148: per-event-type lifetime statistics folded from per-round
    partials (operators/sketch.py::stats_ledger — the incremental
    bookkeeping that answers corpus-lifetime questions without
    rescanning history). Rounds are event_id div 2000; the oracle
    computes the same exact moments in ONE whole-table pass, so value
    equality IS the merge ≡ recompute proof, cross-engine."""
    from .operators.sketch import stats_ledger

    e = _t(spark, sf_dir, "events")
    rows = e.select(
        "event_type",
        F.expr("event_id div 2000").alias("round"),
        _cents(F.col("value")).alias("cents"),
    )
    return stats_ledger(
        rows, group_cols=["event_type"], partial_cols=["round"],
        value_col="cents",
    )


SQL_STATS_LEDGER = """
SELECT event_type,
       count(*)::BIGINT AS n,
       sum(c)::BIGINT AS sum_units,
       sum(c::HUGEINT * c)::BIGINT AS sumsq_units,
       min(c)::BIGINT AS min_units,
       max(c)::BIGINT AS max_units
FROM (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
)
GROUP BY event_type
"""


# --- X149: k-anonymity suppression -----------------------------------------


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X149: publishable per-(event_type, cohort) activity counts with
    k=5 suppression (operators/pipeline.py::k_anonymize) — 613 user
    cohorts per type leave many combos under k, so the rolled-up
    bucket is exercised heavily; published counts sum to the input
    row count by construction."""
    from .operators.pipeline import k_anonymize

    e = _t(spark, sf_dir, "events")
    rows = e.select(
        "event_type",
        F.concat(F.lit("u"), (F.col("user_id") % 613).cast("string")).alias(
            "cohort"
        ),
    )
    return k_anonymize(rows, quasi_cols=["event_type", "cohort"], k=5)


SQL_K_ANONYMITY = """
WITH combos AS (
  SELECT event_type, 'u' || (user_id % 613)::VARCHAR AS cohort,
         count(*) AS n
  FROM events GROUP BY 1, 2
), rw AS (
  SELECT CASE WHEN n < 5 THEN '*' ELSE event_type END AS event_type,
         CASE WHEN n < 5 THEN '*' ELSE cohort END AS cohort,
         n, (n < 5) AS suppressed
  FROM combos
)
SELECT event_type, cohort, sum(n)::BIGINT AS n, suppressed
FROM rw GROUP BY event_type, cohort, suppressed
"""
