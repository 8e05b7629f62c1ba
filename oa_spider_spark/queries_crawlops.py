"""Crawl-operations queries (SURVEY §2.12 X72–X75): the frontier's
*steady-state* toolkit — adaptive recrawl scheduling, SCD1 merge-upsert
(the lakehouse write-back a recrawl produces), crawl-trap detection,
and mergeable histogram quantiles (the latency/size-percentile monitor
a 10^10-URL crawl runs per round without sorting anything).

Everything is integer column arithmetic end-to-end (no floats except
the repo's established lossless cents quantization), so all four carry
full DuckDB value oracles. Derivations are relational over the
driver-generated tables — same discipline as every other query module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col) -> F.Column:
    return F.round(col * 100, 0).cast("long")


# --- X72: adaptive recrawl schedule ----------------------------------------

N_URLS_MOD = 997  # visits per URL ≈ events / 997 (≈10 at sf0.01)


def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-driven revisit policy (frontier/recrawl.py::
    recrawl_schedule): the event log plays a visit history — url_id =
    event_id mod 997, a visit 'changed' when the event ticks a
    url-dependent propensity (event_id%10 < url_id%11, spanning rates
    0..1000 so the interval clamp is exercised). Output: per-URL change
    rate (milli), clamped revisit interval (hours), next fetch time
    (epoch-µs)."""
    from .frontier.recrawl import recrawl_schedule

    e = _t(spark, sf_dir, "events")
    visits = e.select(
        (F.col("event_id") % N_URLS_MOD).alias("url_id"),
        "ts",
        (
            (F.col("event_id") % 10) < (F.col("event_id") % N_URLS_MOD) % 11
        ).cast("long").alias("changed"),
    )
    return recrawl_schedule(visits)


SQL_RECRAWL_SCHEDULE = f"""
WITH v AS (
  SELECT event_id % {N_URLS_MOD} AS url_id, epoch_us(ts) AS us,
         CASE WHEN (event_id % 10) < (event_id % {N_URLS_MOD}) % 11
              THEN 1 ELSE 0 END AS changed
  FROM events
), a AS (
  SELECT url_id, count(*) AS n_visits,
         CAST(sum(changed) AS BIGINT) AS n_changes,
         max(us) AS last_us
  FROM v GROUP BY url_id
), r AS (
  SELECT *, (1000 * n_changes) // n_visits AS change_rate_milli FROM a
), i AS (
  SELECT *, least(CAST(168 AS BIGINT), greatest(CAST(6 AS BIGINT),
             (24 * 1000) // greatest(change_rate_milli, 125))) AS interval_hours
  FROM r
)
SELECT url_id, n_visits, n_changes, change_rate_milli, interval_hours,
       last_us + interval_hours * 3600000000 AS next_fetch_us
FROM i
"""


# --- X73: SCD1 merge-upsert -------------------------------------------------

def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse MERGE semantics (operators/temporal.py::merge_upsert)
    over orders: base carries version = key%2; the delta (keys %3==0)
    re-prices +555 cents at version 1 except keys %5==0 which arrive
    stale at version 0. Exercises all four outcomes: delta newer,
    version tie (delta wins), delta stale (base wins), and
    pass-through keys."""
    from .operators.temporal import merge_upsert

    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        _cents(F.col("o_totalprice")).alias("price_cents"),
        (F.col("o_orderkey") % 2).alias("version"),
    )
    delta = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        (_cents(F.col("o_totalprice")) + 555).alias("price_cents"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("version"),
    )
    return merge_upsert(base, delta, ["o_orderkey"], "version")


SQL_MERGE_UPSERT = """
WITH base AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
         o_orderkey % 2 AS version, 0 AS src
  FROM orders
), delta AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) + 555 AS price_cents,
         CASE WHEN o_orderkey % 5 = 0 THEN 0 ELSE 1 END AS version, 1 AS src
  FROM orders WHERE o_orderkey % 3 = 0
), u AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey
                               ORDER BY version DESC, src DESC) AS rk
  FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
)
SELECT o_orderkey, price_cents, CAST(version AS BIGINT) AS version,
       src = 1 AS from_delta
FROM u WHERE rk = 1
"""


# --- X74: crawl-trap detection ----------------------------------------------

def q_crawl_traps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host URL-template amplification (frontier/recrawl.py::
    crawl_trap_stats): every 4th host serves a calendar-style exploding
    path (/cal/<event_id> — one template, hundreds of URLs), the rest a
    bounded 26-page site (/page/<letter> — as many templates as
    pages). The trap flag separates them at 8000 milli."""
    from .frontier.recrawl import crawl_trap_stats

    e = _t(spark, sf_dir, "events")
    hostnum = F.col("user_id") % 40
    urls = e.select(
        F.concat(
            F.lit("h"), F.lpad(hostnum.cast("string"), 3, "0"), F.lit(".example.org")
        ).alias("host"),
        F.when(
            hostnum % 4 == 0,
            F.concat(F.lit("/cal/"), F.col("event_id").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("/page/"), F.char(F.lit(97) + F.col("event_id") % 26))
        )
        .alias("path"),
    )
    return crawl_trap_stats(urls)


SQL_CRAWL_TRAPS = """
WITH u AS (
  SELECT 'h' || lpad(CAST(user_id % 40 AS VARCHAR), 3, '0') || '.example.org' AS host,
         CASE WHEN (user_id % 40) % 4 = 0
              THEN '/cal/' || CAST(event_id AS VARCHAR)
              ELSE '/page/' || chr(97 + CAST(event_id % 26 AS INT)) END AS path
  FROM events
), t AS (
  SELECT host, path, regexp_replace(path, '[0-9]+', 'N', 'g') AS template FROM u
), a AS (
  SELECT host, count(DISTINCT path) AS n_urls,
         count(DISTINCT template) AS n_templates
  FROM t GROUP BY host
)
SELECT host, n_urls, n_templates,
       (1000 * n_urls) // n_templates AS amplification_milli,
       (1000 * n_urls) // n_templates >= 8000 AS is_trap
FROM a
"""


# --- X75: mergeable histogram quantiles --------------------------------------

HIST_WIDTH = 64


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language p50/p95/p99 of document length from a fixed-width
    histogram sketch (operators/sketch.py::histogram_sketch /
    histogram_quantiles): counts merge across partitions/rounds, the
    estimate is the first-bucket upper bound (true quantile ≤ estimate
    < true + 64; invariant pinned in tests/test_crawlops.py)."""
    from .operators.sketch import histogram_quantiles, histogram_sketch

    d = _t(spark, sf_dir, "documents")
    sk = histogram_sketch(d, ["lang"], "n_chars", width=HIST_WIDTH)
    return histogram_quantiles(sk, ["lang"], permilles=(500, 950, 990), width=HIST_WIDTH)


SQL_HIST_QUANTILES = f"""
WITH s AS (
  SELECT lang, n_chars // {HIST_WIDTH} AS bucket, count(*) AS cnt
  FROM documents GROUP BY lang, bucket
), c AS (
  SELECT lang, bucket,
         CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY bucket
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
  FROM s
), e AS (
  SELECT lang, bucket, cum, n, p.permille,
         (p.permille * n + 999) // 1000 AS target
  FROM c CROSS JOIN (VALUES (500), (950), (990)) p(permille)
)
SELECT lang, permille, max(n) AS n,
       min(CASE WHEN cum >= target THEN bucket END) * {HIST_WIDTH}
         + {HIST_WIDTH - 1} AS estimate
FROM e GROUP BY lang, permille
"""


def register(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "q_recrawl_schedule": q_recrawl_schedule,
            "q_merge_upsert": q_merge_upsert,
            "q_crawl_traps": q_crawl_traps,
            "q_hist_quantiles": q_hist_quantiles,
        }
    )
    oracles.update(
        {
            "q_recrawl_schedule": SQL_RECRAWL_SCHEDULE,
            "q_merge_upsert": SQL_MERGE_UPSERT,
            "q_crawl_traps": SQL_CRAWL_TRAPS,
            "q_hist_quantiles": SQL_HIST_QUANTILES,
        }
    )
