"""Query registry: every implemented operator from SURVEY.md §2 as a
(Spark DataFrame callable, DuckDB oracle SQL) pair over the driver's
parquet tables at /root/testdata/sf*/.

The crawl-specific operators (anti-join dedup, politeness windows,
ordering, limits) run over a **derived frontier**: a deterministic,
SQL-expressible projection of the `events` table into FIXTURES.md §2
frontier shape. Deriving it with plain arithmetic (no engine-specific
hash functions) is what lets DuckDB compute the identical frontier and
serve as the oracle. Tie-breaks use `event_id` (unique) — the oracle-side
stand-in for `url_hash` (xxhash64 is not portable to DuckDB).

Aliasing rule (driver contract): every computed column carries the same
explicit alias in BOTH the DataFrame code and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.scalar import (
    abstract_of,
    b64_decode_utf8,
    clean_filename,
    name_from_url,
    squeeze_digits,
    url_param,
    valid_code,
)

BUDGET = 20
TOPK = 50


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- the derived frontier (events → FIXTURES.md §2 shape) -----------------

# Oracle-side CTE; the DataFrame twin is `frontier_df`.
FRONTIER_CTE = """
WITH frontier AS (
  SELECT
    'http://h' || lpad(CAST(user_id % 40 AS STRING), 3, '0')
        || '.example.org/'
        || (CASE WHEN event_id % 3 = 0 THEN 'mail' ELSE 'doc' END)
        || '/' || CAST(event_id AS STRING)                          AS url,
    'h' || lpad(CAST(user_id % 40 AS STRING), 3, '0')
        || '.example.org'                                           AS host,
    CASE WHEN event_id % 3 = 0 THEN 'mail' ELSE 'doc' END           AS kind,
    CAST(event_id % 100 AS INT)                                     AS priority,
    ts                                                              AS created_time,
    event_id                                                        AS event_id,
    event_id % 5 <> 0                                               AS unread
  FROM events
),
seen AS (
  SELECT event_id FROM events WHERE event_id % 7 = 0
)
"""


def frontier_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    host = F.concat(
        F.lit("h"), F.lpad((F.col("user_id") % 40).cast("string"), 3, "0"), F.lit(".example.org")
    )
    kind = F.when(F.col("event_id") % 3 == 0, "mail").otherwise("doc")
    return e.select(
        F.concat(
            F.lit("http://"), host, F.lit("/"), kind, F.lit("/"), F.col("event_id").cast("string")
        ).alias("url"),
        host.alias("host"),
        kind.alias("kind"),
        (F.col("event_id") % 100).cast("int").alias("priority"),
        F.col("ts").alias("created_time"),
        F.col("event_id").alias("event_id"),
        (F.col("event_id") % 5 != 0).alias("unread"),
    )


def seen_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0).select("event_id")


def _order():
    return [
        F.col("priority").desc(),
        F.col("created_time").desc(),
        F.when(F.col("kind") == "doc", 0).otherwise(1).asc(),
        F.col("event_id").asc(),
    ]


_ORDER_SQL = "priority DESC, created_time DESC, (CASE WHEN kind='doc' THEN 0 ELSE 1 END), event_id"


# --- queries --------------------------------------------------------------

def q_crawl_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: one crawl round's selection — unread filter (P1-P5),
    seen anti-join (J2/U3), per-host politeness budget (O4/§2.6), global
    deterministic order + limit (O1-O3). Everything ahead of the fetch
    stage, exactly as the engine stages it (SURVEY.md §3.4)."""
    f = frontier_df(spark, sf_dir).filter(F.col("unread"))
    f = f.join(seen_df(spark, sf_dir), "event_id", "left_anti")
    w = Window.partitionBy("host").orderBy(*_order())
    f = f.withColumn("host_rank", F.row_number().over(w)).filter(F.col("host_rank") <= BUDGET)
    # distributed top-500 (TakeOrderedAndProject), then rank only 500 rows —
    # the engine's round uses the fully-bucketed variant (budget_and_order)
    top = f.orderBy(*_order()).limit(500)
    g = Window.orderBy(*_order())
    return (
        top.withColumn("fetch_order", F.row_number().over(g))
        .select("fetch_order", "url", "host", "kind", "priority", "event_id")
    )


SQL_CRAWL_SELECT = FRONTIER_CTE + f"""
, unread_new AS (
  SELECT f.* FROM frontier f
  WHERE f.unread AND NOT EXISTS (SELECT 1 FROM seen s WHERE s.event_id = f.event_id)
),
budgeted AS (
  SELECT *, row_number() OVER (PARTITION BY host ORDER BY {_ORDER_SQL}) AS host_rank
  FROM unread_new
),
ordered AS (
  SELECT *, row_number() OVER (ORDER BY {_ORDER_SQL}) AS fetch_order
  FROM budgeted WHERE host_rank <= {BUDGET}
)
SELECT fetch_order, url, host, kind, priority, event_id
FROM ordered WHERE fetch_order <= 500
"""


def q_unread_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — the reference marks unread docs by an <img> inside an HTML
    snippet, filtered with a regex (`oa.py:360-363`). Reconstruct the
    idspan HTML deterministically, then filter with rlike."""
    f = frontier_df(spark, sf_dir)
    idspan = F.when(
        F.col("unread"), F.concat(F.lit("<span><img src='/images/new.png'>"), F.col("url"), F.lit("</span>"))
    ).otherwise(F.concat(F.lit("<span>"), F.col("url"), F.lit("</span>")))
    return (
        f.withColumn("idspan", idspan)
        .filter(F.col("idspan").rlike("src='/images"))
        .select("event_id", "url", "idspan")
    )


SQL_UNREAD_FILTER = FRONTIER_CTE + """
, spans AS (
  SELECT event_id, url,
         CASE WHEN unread
              THEN '<span><img src=''/images/new.png''>' || url || '</span>'
              ELSE '<span>' || url || '</span>' END AS idspan
  FROM frontier
)
SELECT event_id, url, idspan FROM spans
WHERE regexp_matches(idspan, 'src=''/images')
"""


def q_budget_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/§2.6 — per-host politeness budget as a ranking window (replaces
    the reference's [:limit] slicing, oa.py:456-459)."""
    f = frontier_df(spark, sf_dir)
    w = Window.partitionBy("host").orderBy(*_order())
    return (
        f.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= BUDGET)
        .select("host", "event_id", "host_rank", "priority")
    )


SQL_BUDGET_WINDOW = FRONTIER_CTE + f"""
SELECT host, event_id, host_rank, priority FROM (
  SELECT host, event_id, priority,
         row_number() OVER (PARTITION BY host ORDER BY {_ORDER_SQL}) AS host_rank
  FROM frontier
) WHERE host_rank <= {BUDGET}
"""


def q_topk_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1-O3 — global deterministic crawl order, top-K (docs before
    mails, CreatedTime desc — reference oa.py:553-569, oa.py:455)."""
    f = frontier_df(spark, sf_dir)
    top = f.orderBy(*_order()).limit(TOPK)  # TakeOrderedAndProject, no global sort
    w = Window.orderBy(*_order())
    return (
        top.withColumn("fetch_order", F.row_number().over(w))
        .select("fetch_order", "event_id", "kind", "priority")
    )


SQL_TOPK_PRIORITY = FRONTIER_CTE + f"""
SELECT fetch_order, event_id, kind, priority FROM (
  SELECT event_id, kind, priority,
         row_number() OVER (ORDER BY {_ORDER_SQL}) AS fetch_order
  FROM frontier
) WHERE fetch_order <= {TOPK}
"""


def q_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/U3 — exact seen-set anti-join (unread = listing − read-log)."""
    f = frontier_df(spark, sf_dir)
    return (
        f.join(seen_df(spark, sf_dir), "event_id", "left_anti")
        .groupBy("kind")
        .agg(F.count("*").alias("n_new"), F.max("event_id").alias("max_event_id"))
    )


SQL_SEEN_ANTIJOIN = FRONTIER_CTE + """
SELECT kind, count(*) AS n_new, max(event_id) AS max_event_id
FROM frontier f
WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.event_id = f.event_id)
GROUP BY kind
"""


def q_union_docs_mails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — docs ∪ mails with source-tier ordering preserved as a rank
    column (reference documents.extend(mail_files), oa.py:455)."""
    f = frontier_df(spark, sf_dir)
    docs = f.filter(F.col("kind") == "doc").withColumn("kind_rank", F.lit(0))
    mails = f.filter(F.col("kind") == "mail").withColumn("kind_rank", F.lit(1))
    return (
        docs.unionByName(mails)
        .groupBy("kind_rank", "kind")
        .agg(F.count("*").alias("n"))
    )


SQL_UNION_DOCS_MAILS = FRONTIER_CTE + """
SELECT kind_rank, kind, count(*) AS n FROM (
  SELECT kind, 0 AS kind_rank FROM frontier WHERE kind = 'doc'
  UNION ALL
  SELECT kind, 1 AS kind_rank FROM frontier WHERE kind = 'mail'
)
GROUP BY kind_rank, kind
"""


def q_digest_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 — per-site digest aggregation (reference FILENAMES g.py:21 +
    notification.py:22-31): count + deterministic sorted title list."""
    d = _t(spark, sf_dir, "documents")
    title = F.substring(F.col("text"), 1, 20).alias("title")
    # titles is a scalar (joined string), not array<string>: the driver's
    # hash canonicalization sorts the pandas frame and cannot hash lists.
    return (
        d.select("source", title)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.array_join(F.sort_array(F.collect_list("title")), "|").alias("titles"),
        )
    )


SQL_DIGEST_COLLECT = """
SELECT source, count(*) AS n_docs,
       array_to_string(list_sort(list(substring(text, 1, 20))), '|') AS titles
FROM documents GROUP BY source
"""


def q_arrays_zip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — the reference's only true join: positional zip of two
    comma-split parallel arrays into (url, name) pairs, then explode
    (`oa.py:583-586`). File lists are synthesized deterministically from
    doc_id (3 files per doc)."""
    d = _t(spark, sf_dir, "documents")
    ids = F.concat_ws(
        ",",
        (F.col("doc_id") * 10).cast("string"),
        (F.col("doc_id") * 10 + 1).cast("string"),
        (F.col("doc_id") * 10 + 2).cast("string"),
    )
    names = F.concat_ws(
        ",",
        F.concat(F.lit("att_"), (F.col("doc_id") * 10).cast("string"), F.lit(".pdf")),
        F.concat(F.lit("att_"), (F.col("doc_id") * 10 + 1).cast("string"), F.lit(".doc")),
        F.concat(F.lit("att_"), (F.col("doc_id") * 10 + 2).cast("string"), F.lit(".xls")),
    )
    zipped = F.arrays_zip(F.split(ids, ","), F.split(names, ",")).alias("z")
    e = d.select("doc_id", F.explode(zipped).alias("fx"))
    return e.select(
        "doc_id",
        F.col("fx")["0"].alias("fileid"),
        F.col("fx")["1"].alias("filename"),
    )


SQL_ARRAYS_ZIP_JOIN = """
SELECT doc_id,
       CAST(doc_id * 10 + i AS STRING) AS fileid,
       'att_' || CAST(doc_id * 10 + i AS STRING)
              || (CASE i WHEN 0 THEN '.pdf' WHEN 1 THEN '.doc' ELSE '.xls' END) AS filename
FROM documents, range(3) r(i)
"""


def q_clean_filename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — filename canonicalization (oa.py:36-53), bit-exact: strip
    Windows-forbidden chars + newline family, trim edge dots. Applied to
    deterministically messed-up titles."""
    d = _t(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit('..t<>:"/\\|?*'),
        F.col("doc_id").cast("string"),
        F.lit("\nx\r."),
    )
    return d.select("doc_id", clean_filename(messy).alias("clean_name"))


SQL_CLEAN_FILENAME = r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace('..t<>:"/\|?*' || CAST(doc_id AS STRING) || chr(10) || 'x' || chr(13) || '.',
                        '[<>:"/\\|?*' || chr(10) || chr(13) || chr(11) || chr(12) || chr(133) || chr(8232) || chr(8233) || ']',
                        '', 'g'),
         '^\.+|\.+$', '', 'g') AS clean_name
FROM documents
"""


def q_url_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F3 — query-string parsing after the last '?' (oa.py:74-79) and
    detail-URL rebuild from card/id params (oa.py:735-738)."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("http://site/page?card="),
        (F.col("doc_id") % 9).cast("string"),
        F.lit("&id="),
        F.col("doc_id").cast("string"),
    )
    return d.select(
        "doc_id",
        url_param(url, "card").alias("card"),
        url_param(url, "id").alias("id"),
        F.concat(
            F.lit("http://site/cardshow?cardid="),
            url_param(url, "card"),
            F.lit("-"),
            url_param(url, "id"),
        ).alias("detail_url"),
    )


SQL_URL_PARAMS = """
SELECT doc_id,
       CAST(doc_id % 9 AS STRING) AS card,
       CAST(doc_id AS STRING) AS id,
       'http://site/cardshow?cardid=' || CAST(doc_id % 9 AS STRING) || '-' || CAST(doc_id AS STRING) AS detail_url
FROM documents
"""


def q_name_from_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 — url[url.rfind('/')+1:] (oa.py:775-776)."""
    f = frontier_df(spark, sf_dir)
    return f.select("event_id", name_from_url(F.col("url")).alias("name"))


SQL_NAME_FROM_URL = FRONTIER_CTE + """
SELECT event_id, regexp_extract(url, '([^/]*)$', 1) AS name FROM frontier
"""


def q_abstract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/O5 — HTML-strip + first-36-chars + '[...]' (oa.py:24-34)."""
    d = _t(spark, sf_dir, "documents")
    html = F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>"))
    return d.select("doc_id", abstract_of(html).alias("abstract"))


SQL_ABSTRACT = r"""
SELECT doc_id,
       substring(trim(regexp_replace(regexp_replace('<p>' || text || '</p>', '<[^>]*>', '', 'g'), '\s+', ' ', 'g')), 1, 36)
       || '[...]' AS abstract
FROM documents
"""


def q_confusables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F10 — OCR-confusable substitution + 4-digit validation
    (oa.py:248-273): codes synthesized with letter noise."""
    d = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("O"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("l"),
        ((F.col("doc_id") + 3) % 10).cast("string"),
    )
    return d.select(
        "doc_id",
        raw.alias("raw_code"),
        squeeze_digits(raw).alias("code"),
        valid_code(raw).alias("valid"),
    )


SQL_CONFUSABLES = """
SELECT doc_id,
       'O' || CAST(doc_id % 10 AS STRING) || 'l' || CAST((doc_id + 3) % 10 AS STRING) AS raw_code,
       regexp_replace(translate('O' || CAST(doc_id % 10 AS STRING) || 'l' || CAST((doc_id + 3) % 10 AS STRING),
                                'OoIilb', '001110'), '[^0-9]', '', 'g') AS code,
       length(regexp_replace(translate('O' || CAST(doc_id % 10 AS STRING) || 'l' || CAST((doc_id + 3) % 10 AS STRING),
                                       'OoIilb', '001110'), '[^0-9]', '', 'g')) = 4 AS valid
FROM documents
"""


def q_b64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — base64 mail-body decode (oa.py:423): encode text then decode
    back; output both to prove the round trip."""
    d = _t(spark, sf_dir, "documents")
    enc = F.base64(F.encode(F.substring(F.col("text"), 1, 24), "utf-8"))
    return d.select("doc_id", enc.alias("b64"), b64_decode_utf8(enc).alias("note"))


SQL_B64_ROUNDTRIP = """
SELECT doc_id,
       base64(encode(substring(text, 1, 24))) AS b64,
       substring(text, 1, 24) AS note
FROM documents
"""


def q_collision_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 — mkdir collision rename `(n)` (oa.py:56-71) as a window:
    duplicate titles get a (n) suffix by arrival order."""
    d = _t(spark, sf_dir, "documents")
    title = F.concat(F.lit("t"), (F.col("doc_id") % 37).cast("string"))
    w = Window.partitionBy(title).orderBy(F.col("doc_id"))
    rn = F.row_number().over(w)
    return d.select(
        "doc_id",
        F.when(rn == 1, title).otherwise(
            F.concat(title, F.lit("("), (rn - 1).cast("string"), F.lit(")"))
        ).alias("folder"),
    )


SQL_COLLISION_SUFFIX = """
SELECT doc_id,
       CASE WHEN rn = 1 THEN title ELSE title || '(' || CAST(rn - 1 AS STRING) || ')' END AS folder
FROM (
  SELECT doc_id, 't' || CAST(doc_id % 37 AS STRING) AS title,
         row_number() OVER (PARTITION BY 't' || CAST(doc_id % 37 AS STRING) ORDER BY doc_id) AS rn
  FROM documents
)
"""


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline op — exact dedup by content hash over documents:
    keeper = min doc_id per md5(text); report group sizes."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
    )


SQL_EXACT_DEDUP = """
SELECT md5(text) AS content_hash, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline op — whitespace token count + char count."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        F.length("text").alias("n_chars_calc"),
    )


SQL_TOKEN_COUNT = r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       length(text) AS n_chars_calc
FROM documents
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events sessionization (30-min gap) — lag + cumulative-sum window;
    sessions per user + events per session, aggregated."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    newsess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = e.withColumn("sess_start", newsess).withColumn(
        "session_id", F.sum("sess_start").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.max("n_events").alias("max_session_len"))
    )


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS sess_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
         sum(sess_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
)
SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_len FROM (
  SELECT user_id, session_id, count(*) AS n_events FROM s GROUP BY user_id, session_id
) GROUP BY user_id
"""


def q_retry_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2/P9 — status-column routing (retryable vs fatal, run.py:23-39)
    as a CASE dispatch + per-status counts."""
    f = frontier_df(spark, sf_dir)
    status = (
        F.when(F.col("event_id") % 97 == 0, "failed")
        .when(F.col("event_id") % 17 == 0, "retry")
        .otherwise("ok")
    )
    return f.select(status.alias("status")).groupBy("status").agg(F.count("*").alias("n"))


SQL_RETRY_ROUTING = FRONTIER_CTE + """
SELECT CASE WHEN event_id % 97 = 0 THEN 'failed'
            WHEN event_id % 17 = 0 THEN 'retry'
            ELSE 'ok' END AS status,
       count(*) AS n
FROM frontier GROUP BY 1
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline op — 16-bit SimHash over word tokens, built from
    md5 (portable to the oracle): per token take 16 bits of md5, sum ±1
    per bit position weighted by token count, sign → fingerprint."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    h16 = F.conv(F.substring(F.md5(F.col("token")), 1, 4), 16, 10).cast("long")
    bits = tok.select(
        "doc_id",
        *[
            F.when(F.shiftright(h16, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1).alias(f"b{b}")
            for b in range(16)
        ],
    )
    agg = bits.groupBy("doc_id").agg(*[F.sum(f"b{b}").alias(f"s{b}") for b in range(16)])
    fp = None
    for b in range(16):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.cast("long").alias("simhash"))


SQL_SIMHASH = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents
), tb AS (
  SELECT doc_id, ('0x' || substr(md5(token), 1, 4))::BIGINT AS h16
  FROM tok WHERE token <> ''
), sums AS (
  SELECT doc_id, b.b AS b,
         sum(CASE WHEN (h16 >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM tb, range(16) b(b)
  GROUP BY doc_id, b.b
)
SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS simhash
FROM sums GROUP BY doc_id
"""


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search — brute-force cosine top-K against a probe
    vector (the embedding of vec_id = 0), JVM-side via zip_with/aggregate
    (no UDF). The scale path (LSH-bucketed) is operators/similarity.py."""
    e = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    probe = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("probe"))
    x = e.crossJoin(F.broadcast(probe))
    dot = F.aggregate(
        F.zip_with("embedding", "probe", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate("probe", F.lit(0.0), lambda acc, v: acc + v * v))
    sim = F.round(dot / (na * nb), 6)
    # orderBy+limit = TakeOrderedAndProject (distributed top-k); the rank
    # window then touches only TOPK rows — never a whole-table window
    scored = x.select("vec_id", "label", sim.alias("cos_sim"))
    top = scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(TOPK)
    w = Window.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return top.withColumn("rank", F.row_number().over(w))


SQL_COSINE_TOPK = f"""
WITH probe AS (
  SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = 0
), sims AS (
  SELECT e.vec_id, e.label,
         round(list_dot_product(e.embedding::DOUBLE[], probe.p)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(probe.p, probe.p))), 6) AS cos_sim
  FROM embeddings e, probe
)
SELECT vec_id, label, cos_sim,
       row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rank
FROM sims
QUALIFY rank <= {TOPK}
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline op — text quality heuristics: char classes,
    punctuation density, mean token length (all JVM expressions)."""
    d = _t(spark, sf_dir, "documents")
    n = F.length("text")
    n_alpha = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(F.col("text"), r"[^.!?,;:]", ""))
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.select(
        "doc_id",
        F.round(n_alpha / n, 6).alias("alpha_ratio"),
        F.round(n_punct / n, 6).alias("punct_ratio"),
        F.round(n / n_tok, 6).alias("chars_per_token"),
    )


SQL_QUALITY_SCORE = r"""
SELECT doc_id,
       round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text), 6) AS alpha_ratio,
       round(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) * 1.0 / length(text), 6) AS punct_ratio,
       round(length(text) * 1.0 / len(string_split_regex(trim(text), '\s+')), 6) AS chars_per_token
FROM documents
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 — ad-hoc JSON field access (reference r.json()['data'][...],
    oa.py:369-371,484,495) over the events.props JSON column."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("int").alias("k"),
        F.col("event_type").alias("event_type"),
    )


SQL_JSON_EXTRACT = """
SELECT event_id, json_extract_string(props, '$.k')::INT AS k, event_type
FROM events
"""


def q_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/P6 — HTML link scrape + preview-link skip (reference PyQuery
    over card pages, oa.py:806-817; skip /word/view hrefs, oa.py:771-773).
    The page HTML is synthesized deterministically per doc."""
    d = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<ul><li><a href="/doc/'), F.col("doc_id").cast("string"),
        F.lit('">d</a></li><li><a href="/word/view?id='), F.col("doc_id").cast("string"),
        F.lit('">p</a></li><li><a href="/mail/'), (F.col("doc_id") % 50).cast("string"),
        F.lit('">m</a></li></ul>'),
    )
    hrefs = F.regexp_extract_all(html, F.lit('href="([^"]+)"'), 1)
    return (
        d.select("doc_id", F.explode(hrefs).alias("href"))
        .filter(~F.col("href").startswith("/word/view"))
    )


SQL_LINK_EXTRACT = """
WITH pages AS (
  SELECT doc_id,
         '<ul><li><a href="/doc/' || CAST(doc_id AS STRING)
         || '">d</a></li><li><a href="/word/view?id=' || CAST(doc_id AS STRING)
         || '">p</a></li><li><a href="/mail/' || CAST(doc_id % 50 AS STRING)
         || '">m</a></li></ul>' AS html
  FROM documents
)
SELECT doc_id, href FROM (
  SELECT doc_id, unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS href
  FROM pages
) WHERE NOT starts_with(href, '/word/view')
"""


def q_redirect_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — redirect resolution: regex the target out of a JS body and
    absolutize it (reference to_url, oa.py:729-733)."""
    d = _t(spark, sf_dir, "documents")
    body = F.concat(
        F.lit('xhr.get("/portal/view/'), F.col("doc_id").cast("string"), F.lit('", cb)')
    )
    rel = F.regexp_extract(body, r'get\("(.+)",', 1)
    return d.select(
        "doc_id", F.concat(F.lit("http://site.example.org"), rel).alias("abs_url")
    )


SQL_REDIRECT_URL = """
SELECT doc_id,
       'http://site.example.org'
       || regexp_extract('xhr.get("/portal/view/' || CAST(doc_id AS STRING) || '", cb)',
                         'get\\("(.+)",', 1) AS abs_url
FROM documents
"""


def q_sizeof_fmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — human-readable byte sizes, 1024 ladder (reference sizeof_fmt,
    oa.py:82-87), as (scaled value, unit) columns."""
    e = _t(spark, sf_dir, "events")
    nbytes = F.floor(F.col("value") * 100000).cast("long")
    unit = (
        F.when(nbytes < 1024, "B")
        .when(nbytes < 1024**2, "KB")
        .when(nbytes < 1024**3, "MB")
        .otherwise("GB")
    )
    scaled = (
        F.when(nbytes < 1024, nbytes.cast("double"))
        .when(nbytes < 1024**2, nbytes / 1024.0)
        .when(nbytes < 1024**3, nbytes / (1024.0**2))
        .otherwise(nbytes / (1024.0**3))
    )
    return e.select(
        "event_id", nbytes.alias("nbytes"),
        F.round(scaled, 1).alias("scaled"), unit.alias("unit"),
    )


SQL_SIZEOF_FMT = """
SELECT event_id,
       CAST(floor(value * 100000) AS BIGINT) AS nbytes,
       round(CASE WHEN nbytes < 1024 THEN nbytes * 1.0
                  WHEN nbytes < 1048576 THEN nbytes / 1024.0
                  WHEN nbytes < 1073741824 THEN nbytes / 1048576.0
                  ELSE nbytes / 1073741824.0 END, 1) AS scaled,
       CASE WHEN nbytes < 1024 THEN 'B'
            WHEN nbytes < 1048576 THEN 'KB'
            WHEN nbytes < 1073741824 THEN 'MB'
            ELSE 'GB' END AS unit
FROM events
"""


def q_running_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — running byte total + mean rate per user (the reference's
    live download progress meter: save/elapsed, oa.py:183-206).
    Integer cents throughout: float cumulative sums are oracle-fragile
    (DuckDB's segment-tree window summation orders fp adds differently
    than Spark's running sum)."""
    e = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = F.sum(cents).over(w.rowsBetween(Window.unboundedPreceding, 0))
    seq = F.row_number().over(w)
    # exact integer division (Spark `div`) to mirror DuckDB's `//`: a
    # double `/` + floor disagrees with exact integer division on
    # boundary quotients (fp rounding). Values are non-negative, so
    # floor-div and truncating-div semantics coincide.
    return e.select(
        "user_id", "event_id",
        cum.alias("cum_cents"),
        (cum * 10).alias("_c10"), seq.alias("_seq"),
    ).select(
        "user_id", "event_id", "cum_cents",
        F.expr("_c10 div _seq").cast("long").alias("mean_milli"),
    )


SQL_RUNNING_BYTES = """
SELECT user_id, event_id,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cum_cents,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w * 10 // row_number() OVER w AS BIGINT) AS mean_milli
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_success_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — success-rate counters (reference y/n login-rate harness,
    test_run.py:37-57): share of events with value > 50 per type."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg((F.col("value") > 50).cast("int")), 6).alias("success_rate"),
        )
    )


SQL_SUCCESS_RATE = """
SELECT event_type, count(*) AS n,
       round(avg(CASE WHEN value > 50 THEN 1 ELSE 0 END), 6) AS success_rate
FROM events GROUP BY event_type
"""


def q_note_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17/S9 — note→HTML page render (reference write_note template,
    oa.py:145-150)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.format_string(
            "<html><head><meta charset=\"utf-8\"></head><body>%s</body></html>",
            F.substring(F.col("text"), 1, 40),
        ).alias("page"),
    )


SQL_NOTE_RENDER = """
SELECT doc_id,
       '<html><head><meta charset="utf-8"></head><body>'
       || substring(text, 1, 40) || '</body></html>' AS page
FROM documents
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_crawl_select": q_crawl_select,
    "q_unread_filter": q_unread_filter,
    "q_budget_window": q_budget_window,
    "q_topk_priority": q_topk_priority,
    "q_seen_antijoin": q_seen_antijoin,
    "q_union_docs_mails": q_union_docs_mails,
    "q_digest_collect": q_digest_collect,
    "q_arrays_zip_join": q_arrays_zip_join,
    "q_clean_filename": q_clean_filename,
    "q_url_params": q_url_params,
    "q_name_from_url": q_name_from_url,
    "q_abstract": q_abstract,
    "q_confusables": q_confusables,
    "q_b64_roundtrip": q_b64_roundtrip,
    "q_collision_suffix": q_collision_suffix,
    "q_exact_dedup": q_exact_dedup,
    "q_token_count": q_token_count,
    "q_sessionize": q_sessionize,
    "q_retry_routing": q_retry_routing,
    "q_simhash": q_simhash,
    "q_cosine_topk": q_cosine_topk,
    "q_quality_score": q_quality_score,
    "q_json_extract": q_json_extract,
    "q_link_extract": q_link_extract,
    "q_redirect_url": q_redirect_url,
    "q_sizeof_fmt": q_sizeof_fmt,
    "q_running_bytes": q_running_bytes,
    "q_success_rate": q_success_rate,
    "q_note_render": q_note_render,
}

ORACLES: dict[str, str] = {
    "q_crawl_select": SQL_CRAWL_SELECT,
    "q_unread_filter": SQL_UNREAD_FILTER,
    "q_budget_window": SQL_BUDGET_WINDOW,
    "q_topk_priority": SQL_TOPK_PRIORITY,
    "q_seen_antijoin": SQL_SEEN_ANTIJOIN,
    "q_union_docs_mails": SQL_UNION_DOCS_MAILS,
    "q_digest_collect": SQL_DIGEST_COLLECT,
    "q_arrays_zip_join": SQL_ARRAYS_ZIP_JOIN,
    "q_clean_filename": SQL_CLEAN_FILENAME,
    "q_url_params": SQL_URL_PARAMS,
    "q_name_from_url": SQL_NAME_FROM_URL,
    "q_abstract": SQL_ABSTRACT,
    "q_confusables": SQL_CONFUSABLES,
    "q_b64_roundtrip": SQL_B64_ROUNDTRIP,
    "q_collision_suffix": SQL_COLLISION_SUFFIX,
    "q_exact_dedup": SQL_EXACT_DEDUP,
    "q_token_count": SQL_TOKEN_COUNT,
    "q_sessionize": SQL_SESSIONIZE,
    "q_retry_routing": SQL_RETRY_ROUTING,
    "q_simhash": SQL_SIMHASH,
    "q_cosine_topk": SQL_COSINE_TOPK,
    "q_quality_score": SQL_QUALITY_SCORE,
    "q_json_extract": SQL_JSON_EXTRACT,
    "q_link_extract": SQL_LINK_EXTRACT,
    "q_redirect_url": SQL_REDIRECT_URL,
    "q_sizeof_fmt": SQL_SIZEOF_FMT,
    "q_running_bytes": SQL_RUNNING_BYTES,
    "q_success_rate": SQL_SUCCESS_RATE,
    "q_note_render": SQL_NOTE_RENDER,
}


# --- operator-module surface (training-pipeline ops) ----------------------

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
ORACLES["q_ivf_ann"] = SQL_IVF_ANN


def _synth_images_df(spark: SparkSession, n: int = 60) -> DataFrame:
    from . import datagen
    from .kernels.codec import average_hash, encode_image

    rows = []
    for i in range(n):
        arr = datagen.synth_image(5000 + i)
        fmt = "png" if i % 2 == 0 else "jpeg"
        rows.append(
            (f"img{i:04d}", bytearray(encode_image(arr, fmt)), int(arr.shape[1]),
             int(arr.shape[0]), fmt, datagen.synth_caption(5000 + i), average_hash(arr))
        )
    return spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )


def q_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — Arrow-batch decode + stats + PSNR re-encode verify
    over the deterministic synthetic images table. Fully value-oracled
    (r03): dims/flag recomputed relationally from the seed arithmetic,
    float stats via generated repr-literal twins."""
    from .operators.multimodal import decode_stats

    return decode_stats(_synth_images_df(spark))


def q_captcha_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1-K8 captcha pipeline as a batch stage over rendered digit
    images (rows-only; exact-code recovery pinned in tests)."""
    import numpy as np

    from .kernels.codec import encode_image
    from .kernels.image_ops import digit_templates, render_captcha
    from .operators.multimodal import captcha_solve

    t = digit_templates()
    rng = np.random.RandomState(31)
    rows = []
    for i in range(40):
        code = f"{(i * 2467 + 123) % 10000:04d}"
        rows.append((f"cap{i:03d}", bytearray(encode_image(render_captcha(code, t, noise=5, rng=rng), "png"))))
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    return captcha_solve(df)


# Ground-truth recomputation: the rendered codes are (i*2467+123) % 10000,
# so the oracle regenerates what the pixel pipeline must recover. A wrong
# binarize/segment/match step shows up as a value mismatch.
SQL_CAPTCHA_PIPELINE = """
SELECT 'cap' || lpad(i::VARCHAR, 3, '0') AS image_id,
       lpad(((i * 2467 + 123) % 10000)::VARCHAR, 4, '0') AS code
FROM range(40) t(i)
"""


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — Arrow-batch bilinear resize to 32x32 thumbnails.
    Fully value-oracled (r03) via generated literals from the Python
    twin (payload length + resized phash); exactness of the pixel path
    additionally pinned in tests/test_operators.py."""
    from .operators.multimodal import resize_images

    return resize_images(_synth_images_df(spark, 40), out_w=32, out_h=32).select(
        "image_id", "w", "h", F.length("bytes").alias("thumb_bytes"), "phash"
    )


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — every-Nth frame sampling from synthetic video
    containers, then a PNG decode of each sampled frame's dimensions.
    Fully value-oracled by ground-truth recomputation: vid i holds
    6 + i%5 frames of synth_image(9000 + i*31 + j), whose h/w are pure
    integer arithmetic on the seed (datagen.synth_image), so the oracle
    regenerates (image_id, frame_idx, frame_w, frame_h) relationally —
    a wrong container split, sample stride, or decode shows up as a
    value mismatch."""
    import pyarrow as pa

    from . import datagen
    from .kernels.codec import decode_image
    from .operators.multimodal import _map_arrow, frame_sample, synth_video_bytes

    rows = []
    for i in range(12):
        frames = [datagen.synth_image(9000 + i * 31 + j) for j in range(6 + i % 5)]
        rows.append((f"vid{i:03d}", bytearray(synth_video_bytes(frames))))
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    sampled = frame_sample(df, every_n=3)

    def dims(batch: pa.RecordBatch) -> pa.RecordBatch:
        shapes = [decode_image(bytes(d)).shape for d in batch.column("frame_bytes").to_pylist()]
        # key columns pass through from the ORIGINAL batch (pa.array
        # re-inference would re-type int32 → int64, CLAUDE.md invariant)
        return pa.RecordBatch.from_arrays(
            [batch.column("image_id"), batch.column("frame_idx"),
             pa.array([s[1] for s in shapes], pa.int32()),
             pa.array([s[0] for s in shapes], pa.int32())],
            names=["image_id", "frame_idx", "frame_w", "frame_h"],
        )

    return _map_arrow(
        sampled, dims, "image_id string, frame_idx int, frame_w int, frame_h int"
    )


# Ground-truth recomputation (the captcha-oracle pattern): vid i has
# 6 + i%5 frames; sampling stride 3 keeps j*3 < n; frame seed is
# 9000 + i*31 + idx and synth_image dims are
#   m = (seed * 2654435761) & 0xFFFFFFFF;  h = 24 + m%41;  w = 24 + (m>>8)%41
SQL_FRAME_SAMPLE = """
WITH f AS (
  SELECT i, 3 * j AS idx
  FROM range(12) v(i), range(4) s(j)
  WHERE 3 * j < 6 + i % 5
), m AS (
  SELECT i, idx, ((9000 + i * 31 + idx) * 2654435761) & 4294967295 AS mm
  FROM f
)
SELECT 'vid' || lpad(i::VARCHAR, 3, '0') AS image_id,
       idx::INT AS frame_idx,
       (24 + (mm >> 8) % 41)::INT AS frame_w,
       (24 + mm % 41)::INT AS frame_h
FROM m
"""


def q_phash_near_dup_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — perceptual-hash Hamming near-dup image pairs via
    sound k+1-block pigeonhole LSH + bit_count verify. Fully oracled:
    the phashes are deterministic (average_hash of synth_image), so the
    oracle embeds them as literals and recomputes the PAIR JOIN
    relationally (bit_count(xor) in DuckDB matches Spark's
    two's-complement semantics) — a missed candidate pair shows up as a
    row-count mismatch, which is exactly the r02 recall bug class."""
    from .operators.multimodal import phash_hamming_pairs

    return phash_hamming_pairs(_synth_images_df(spark), max_hamming=16)


def q_image_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup clusters end-to-end (the image-axis twin of
    q_dedup_keep): phash Hamming pairs (sound k+1-block LSH, radius 12)
    → connected components → one representative per cluster (max pixel
    count, tie min image_id); singleton images keep themselves. Oracle:
    literal phashes → relational pair join → recursive-CTE closure →
    the same window — every stage of the composition is value-checked."""
    from .operators.dedup import connected_components
    from .operators.multimodal import phash_hamming_pairs

    imgs = _synth_images_df(spark)
    pairs = phash_hamming_pairs(imgs, max_hamming=12)
    num = lambda c: F.substring(c, 4, 10).cast("long")  # noqa: E731
    comp = connected_components(
        pairs.select(num("img_a").alias("a"), num("img_b").alias("b")),
        src="a",
        dst="b",
    )
    labeled = (
        imgs.select("image_id", num("image_id").alias("_nid"), "w", "h")
        .join(comp, F.col("_nid") == F.col("doc_id"), "left")
        .withColumn("component_id", F.coalesce("component_id", F.col("_nid")))
    )
    cw = Window.partitionBy("component_id")
    ranked = labeled.select(
        "image_id",
        F.concat(
            F.lit("img"), F.lpad(F.col("component_id").cast("string"), 4, "0")
        ).alias("cluster_id"),
        (F.col("w") * F.col("h")).cast("long").alias("rep_px"),
        F.count("*").over(cw).alias("n_members"),
        F.row_number()
        .over(cw.orderBy((F.col("w") * F.col("h")).desc(), F.col("image_id").asc()))
        .alias("_rk"),
    )
    return ranked.filter(F.col("_rk") == 1).drop("_rk")


def _sql_image_dedup_clusters() -> str:
    vals = ",\n".join(
        f"({int(r['image_id'][3:])}, {r['phash']}, {r['dec_w']}, {r['dec_h']})"
        for r in _image_twin_rows(60)
    )
    return f"""
WITH RECURSIVE p(i, phash, w, h) AS (VALUES
{vals}
), pairs AS (
  SELECT a.i AS u, b.i AS v
  FROM p a JOIN p b ON a.i < b.i
  WHERE bit_count(xor(a.phash::BIGINT, b.phash::BIGINT)) <= 12
), edges AS (
  SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
), reach(u, x) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.x = e.u
), lbl AS (
  SELECT u AS i, least(u, min(x)) AS component_id FROM reach GROUP BY u
), labeled AS (
  SELECT p.i, coalesce(l.component_id, p.i) AS component_id,
         p.w * p.h AS px
  FROM p LEFT JOIN lbl l USING (i)
), ranked AS (
  SELECT 'img' || lpad(i::VARCHAR, 4, '0') AS image_id,
         'img' || lpad(component_id::VARCHAR, 4, '0') AS cluster_id,
         CAST(px AS BIGINT) AS rep_px,
         count(*) OVER (PARTITION BY component_id) AS n_members,
         row_number() OVER (
           PARTITION BY component_id ORDER BY px DESC, i ASC
         ) AS rk
  FROM labeled
)
SELECT image_id, cluster_id, rep_px, n_members FROM ranked WHERE rk = 1
"""


def _image_twin_rows(n: int = 60):
    """Python twin of `_synth_images_df` → decode/stats/resize, used ONLY
    to generate literal ground-truth oracles (the IVF/captcha pattern:
    `repr(float)` literals in generated SQL — CLAUDE.md oracle trick).
    Everything here is deterministic: synth_image is pure seed
    arithmetic + PCG64 noise, the codecs are the repo's own."""
    from . import datagen
    from .kernels.codec import average_hash, decode_image, encode_image, psnr
    from .operators.multimodal import _bilinear

    rows = []
    for i in range(n):
        arr = datagen.synth_image(5000 + i)
        fmt = "png" if i % 2 == 0 else "jpeg"
        dec = decode_image(encode_image(arr, fmt))
        re_dec = decode_image(encode_image(dec, fmt))
        thumb = _bilinear(dec, 32, 32)
        rows.append({
            "image_id": f"img{i:04d}",
            "dec_w": int(dec.shape[1]), "dec_h": int(dec.shape[0]),
            "mean_px": float(dec.mean()), "std_px": float(dec.std()),
            "reencode_psnr": float(min(psnr(dec, re_dec), 1e6)),
            "phash": int(average_hash(arr)),
            "thumb_bytes": len(encode_image(thumb, "png")),
            "thumb_phash": int(average_hash(thumb)),
        })
    return rows


def _sql_image_decode_stats() -> str:
    """Hybrid ground-truth oracle: dec_w/dec_h/decode_ok recomputed
    RELATIONALLY from the seed arithmetic (the q_frame_sample pattern —
    synth_image dims are pure integer ops on the seed), float stats as
    generated repr literals joined on image_id."""
    vals = ",\n".join(
        f"('{r['image_id']}', {r['mean_px']!r}, {r['std_px']!r}, {r['reencode_psnr']!r})"
        for r in _image_twin_rows(60)
    )
    return f"""
WITH m AS (
  SELECT 'img' || lpad(i::VARCHAR, 4, '0') AS image_id,
         ((5000 + i) * 2654435761) & 4294967295 AS mm
  FROM range(60) t(i)
), px(image_id, mean_px, std_px, reencode_psnr) AS (VALUES
{vals}
)
SELECT m.image_id,
       (24 + (mm >> 8) % 41)::INT AS dec_w,
       (24 + mm % 41)::INT AS dec_h,
       mean_px::DOUBLE AS mean_px,
       std_px::DOUBLE AS std_px,
       reencode_psnr::DOUBLE AS reencode_psnr,
       true AS decode_ok
FROM m JOIN px ON px.image_id = m.image_id
"""


def _sql_image_resize() -> str:
    """Generated-literal oracle for the resize stage: 32×32 dims are
    relational constants; payload length and resized phash come from the
    Python twin (deterministic bilinear + PNG encoder)."""
    vals = ",\n".join(
        f"('{r['image_id']}', {r['thumb_bytes']}, {r['thumb_phash']})"
        for r in _image_twin_rows(40)
    )
    return f"""
SELECT image_id, 32::INT AS w, 32::INT AS h,
       thumb_bytes::INT AS thumb_bytes, phash::BIGINT AS phash
FROM (VALUES
{vals}
) t(image_id, thumb_bytes, phash)
"""


def _sql_phash_near_dups() -> str:
    """Literal phashes + RELATIONAL pair recomputation: DuckDB bit_count
    over xor of two's-complement BIGINTs matches Spark's F.bit_count, so
    the oracle independently derives every pair at Hamming ≤ 16 — the
    blocking scheme on the Spark side must lose no candidate."""
    vals = ",\n".join(
        f"('{r['image_id']}', {r['phash']})" for r in _image_twin_rows(60)
    )
    return f"""
WITH p(image_id, phash) AS (VALUES
{vals}
)
SELECT a.image_id AS img_a, b.image_id AS img_b,
       bit_count(xor(a.phash::BIGINT, b.phash::BIGINT))::INT AS hamming
FROM p a JOIN p b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash::BIGINT, b.phash::BIGINT)) <= 16
"""


QUERIES.update(
    {
        "q_lang_id": q_lang_id,
        "q_ngram_jaccard": q_ngram_jaccard,
        "q_minhash_lsh": q_minhash_lsh,
        "q_dedup_components": q_dedup_components,
        "q_doc_fingerprint": q_doc_fingerprint,
        "q_simhash_near_pairs": q_simhash_near_pairs,
        "q_embedding_near_dups": q_embedding_near_dups,
        "q_ivf_ann": q_ivf_ann,
        "q_image_decode_stats": q_image_decode_stats,
        "q_captcha_pipeline": q_captcha_pipeline,
        "q_phash_near_dup_images": q_phash_near_dup_images,
        "q_image_dedup_clusters": q_image_dedup_clusters,
        "q_image_resize": q_image_resize,
        "q_frame_sample": q_frame_sample,
    }
)

ORACLES.update(
    {
        "q_lang_id": SQL_LANG_ID,
        "q_ngram_jaccard": SQL_NGRAM_JACCARD,
        "q_minhash_lsh": SQL_MINHASH_LSH,
        "q_dedup_components": SQL_DEDUP_COMPONENTS,
        "q_doc_fingerprint": SQL_DOC_FINGERPRINT,
        "q_simhash_near_pairs": SQL_SIMHASH_NEAR_PAIRS,
        "q_embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
        "q_captcha_pipeline": SQL_CAPTCHA_PIPELINE,
        "q_frame_sample": SQL_FRAME_SAMPLE,
        # r03: the last three rows-only queries gained full ground-truth
        # oracles (relational dims + generated repr literals for the
        # codec-dependent values; relational pair join for phash) — the
        # no_oracle set is now empty.
        "q_image_decode_stats": _sql_image_decode_stats(),
        "q_image_resize": _sql_image_resize(),
        "q_phash_near_dup_images": _sql_phash_near_dups(),
        "q_image_dedup_clusters": _sql_image_dedup_clusters(),
    }
)

def _synth_page(d: DataFrame):
    """Deterministic per-doc HTML page with the reference's structures:
    id-div (oa.py:390), center file anchors incl. a /word/view preview
    (oa.py:771-776), .ul1 li card list (oa.py:806-817), and a plain table
    (oa.py:922-941). Pure column concat — the PARSING is the operator."""
    sid = F.col("doc_id").cast("string")
    cards = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int")),
            lambda i: F.concat(
                F.lit('<li><a href="/doc/'), sid, F.lit("-"), i.cast("string"),
                F.lit('">card '), i.cast("string"), F.lit("</a></li>"),
            ),
        ),
    )
    return F.concat(
        F.lit('<html><body><div id="weaDocDetailHtmlContent"><p>'),
        F.substring("text", 1, 20),
        F.lit("</p><b>doc "), sid,
        F.lit('</b></div><center><a href="/word/view?id='), sid,
        F.lit('">preview</a><a href="/docs/file_'), sid,
        F.lit('.pdf"></a></center><ul class="ul1">'), cards,
        F.lit("</ul><table><tr><td>h1</td><td>h2</td></tr><tr><td>"),
        F.col("source"), F.lit("</td><td>"), F.col("n_chars").cast("string"),
        F.lit("</td></tr></table></body></html>"),
    )


def q_html_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/F15 — REAL HTML parse stage (DOM build + CSS-subset selectors
    inside mapInArrow, operators/html.py), reproducing the reference's
    PyQuery shapes: #id select, descendant anchors with /word/view skip,
    .class li cards, nth-child table cell. The oracle recomputes every
    extracted field from the doc columns the page was synthesized from —
    a wrong parse (dropped node, bad nth-child indexing, text not
    collapsed) mismatches values."""
    from .operators.html import parse_fields

    d = _t(spark, sf_dir, "documents")
    pages = d.select("doc_id", _synth_page(d).alias("page"))
    return parse_fields(
        pages,
        "page",
        {
            "content_text": ("#weaDocDetailHtmlContent", "text"),
            "first_file_href": ("center a", "first_href"),
            "n_cards": (".ul1 li a", "count"),
            "cell_text": ("table tr:nth-child(2) td:nth-child(2)", "text"),
        },
    )


SQL_HTML_PARSE = r"""
SELECT doc_id,
       trim(regexp_replace(substring(text, 1, 20) || ' doc ' || doc_id::VARCHAR,
                           '\s+', ' ', 'g')) AS content_text,
       '/docs/file_' || doc_id::VARCHAR || '.pdf' AS first_file_href,
       CAST(doc_id % 3 + 1 AS INT) AS n_cards,
       n_chars::VARCHAR AS cell_text
FROM documents
"""


def q_html_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/P6/F13 — parsed link scrape: explode (href, name) per page from
    real DOM anchors, skipping /word/view previews; textless anchors fall
    back to the url tail (oa.py:775-776)."""
    from .operators.html import extract_links

    d = _t(spark, sf_dir, "documents")
    pages = d.select("doc_id", _synth_page(d).alias("page"))
    return extract_links(pages, "page", "body a")


SQL_HTML_LINKS = """
SELECT doc_id,
       '/docs/file_' || doc_id::VARCHAR || '.pdf' AS href,
       'file_' || doc_id::VARCHAR || '.pdf' AS name
FROM documents
UNION ALL
SELECT d.doc_id,
       '/doc/' || d.doc_id::VARCHAR || '-' || r.i::VARCHAR AS href,
       'card ' || r.i::VARCHAR AS name
FROM documents d JOIN range(3) r(i) ON r.i <= d.doc_id % 3
"""


QUERIES["q_html_parse"] = q_html_parse
ORACLES["q_html_parse"] = SQL_HTML_PARSE
QUERIES["q_html_links"] = q_html_links
ORACLES["q_html_links"] = SQL_HTML_LINKS


def q_attachments_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — doc→attachments child-table equi-join (the reference's second
    fetch attaching an attachment list to its parent doc, oa.py:372-382,
    1056-1062). The child table is a deterministic fan-out of documents
    (doc_id % 3 + 1 attachments per doc); the join is a plain equi-join
    on doc_id — at scale both sides are hash-partitioned on the key, and
    since the child derives from the parent here the join co-locates
    (one shuffle each, no broadcast needed for a same-cardinality child;
    a small dimension-side child would take F.broadcast)."""
    d = _t(spark, sf_dir, "documents")
    atts = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int"))).alias("i"),
    ).select(
        "doc_id",
        (F.col("doc_id") * 10 + F.col("i")).alias("att_id"),
        F.concat(
            F.lit("att_"), (F.col("doc_id") * 10 + F.col("i")).cast("string"), F.lit(".bin")
        ).alias("filename"),
        ((F.col("doc_id") * 7919 + F.col("i") * 131) % 100000).alias("att_bytes"),
    )
    docs = d.select("doc_id", "source", F.substring("text", 1, 12).alias("title"))
    return docs.join(atts, "doc_id").select(
        "doc_id", "source", "title", "att_id", "filename", "att_bytes"
    )


SQL_ATTACHMENTS_JOIN = """
SELECT d.doc_id, d.source, substring(d.text, 1, 12) AS title,
       d.doc_id * 10 + r.i AS att_id,
       'att_' || (d.doc_id * 10 + r.i)::VARCHAR || '.bin' AS filename,
       (d.doc_id * 7919 + r.i * 131) % 100000 AS att_bytes
FROM documents d JOIN range(3) r(i) ON r.i <= d.doc_id % 3
"""

QUERIES["q_attachments_join"] = q_attachments_join
ORACLES["q_attachments_join"] = SQL_ATTACHMENTS_JOIN


def q_digest_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18 — digest HTML render (reference notification.py:23-31 nested
    ol/li/ul): each site's <li>source (n)<ul><li>title</li>…</ul></li>
    fragment, rendered distributively with transform/concat (the final
    <ol> page assembly is a trivial concat over ~n_sites rows). Titles
    sorted for determinism."""
    d = _t(spark, sf_dir, "documents")
    title = F.substring(F.col("text"), 1, 20).alias("title")
    agg = (
        d.select("source", title)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("title")).alias("_titles"),
        )
    )
    items = F.array_join(
        F.transform("_titles", lambda t: F.concat(F.lit("<li>"), t, F.lit("</li>"))), ""
    )
    return agg.select(
        "source",
        F.concat(
            F.lit("<li>"), F.col("source"),
            F.lit(" ("), F.col("n_docs").cast("string"), F.lit(")<ul>"),
            items, F.lit("</ul></li>"),
        ).alias("digest_html"),
    )


SQL_DIGEST_RENDER = """
SELECT source,
       '<li>' || source || ' (' || count(*)::VARCHAR || ')<ul>'
       || array_to_string(
            list_transform(list_sort(list(substring(text, 1, 20))),
                           t -> '<li>' || t || '</li>'), '')
       || '</ul></li>' AS digest_html
FROM documents GROUP BY source
"""

QUERIES["q_digest_render"] = q_digest_render
ORACLES["q_digest_render"] = SQL_DIGEST_RENDER


def q_gbk_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16 — legacy-charset (GBK) decode in the Arrow parse stage
    (reference r.content.decode('GBK'), oa.py:931,963). Binary in, string
    out. Oracled by ground-truth recomputation: the plaintext is a
    deterministic function of i, so the oracle regenerates what the
    decode stage must produce from the GBK bytes."""
    from .operators.multimodal import decode_text

    texts = [f"通知文件{i}公告会议第{i % 7}号" for i in range(60)]
    df = spark.createDataFrame(
        [(i, bytearray(t.encode("gbk"))) for i, t in enumerate(texts)],
        "doc_id int, body binary",
    )
    return decode_text(df, "GBK").select("doc_id", "text")


SQL_GBK_DECODE = """
SELECT CAST(i AS INT) AS doc_id,
       '通知文件' || i::VARCHAR || '公告会议第' || (i % 7)::VARCHAR || '号' AS text
FROM range(60) t(i)
"""

QUERIES["q_gbk_decode"] = q_gbk_decode
ORACLES["q_gbk_decode"] = SQL_GBK_DECODE


def q_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio source — AUD0 container decode in mapInArrow
    (binary column in, typed metadata out; the audio analog of the image
    decode stage). Oracled by ground-truth recomputation of the
    header-derived fields (sample_rate / n_samples / duration_ms are
    closed-form in i); the sample-level stats (rms/peak) are pinned
    against a numpy twin in tests/test_operators.py instead."""
    from .operators.multimodal import audio_stats, synth_audio_bytes

    df = spark.createDataFrame(
        [(f"aud{i:03d}", bytearray(synth_audio_bytes(i))) for i in range(50)],
        "audio_id string, bytes binary",
    )
    return audio_stats(df).select("audio_id", "sample_rate", "n_samples", "duration_ms")


SQL_AUDIO_STATS = """
SELECT 'aud' || lpad(i::VARCHAR, 3, '0') AS audio_id,
       CAST(16000 AS INT) AS sample_rate,
       CAST(16000 * (1 + i % 3) + i * 7 AS BIGINT) AS n_samples,
       CAST((16000 * (1 + i % 3) + i * 7) * 1000 // 16000 AS BIGINT) AS duration_ms
FROM range(50) t(i)
"""

QUERIES["q_audio_stats"] = q_audio_stats
ORACLES["q_audio_stats"] = SQL_AUDIO_STATS


def q_rsa_auth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — RSA auth-token encryption (reference JSEncrypt.py:17-19,
    oa.py:321-332: `encrpt(username + rsa_code, pub) + rsa_flag`).
    Portable textbook mode over the fixed 61-bit key: token →
    md5h60 % n → m^65537 mod n (one Arrow-batch modpow; md5 JVM-side).
    The oracle replays the exact modpow in DuckDB HUGEINT as sixteen
    squarings + one multiply (e = 2^16 + 1). The full-width PKCS#1
    envelope path (functions/rsa.py::rsa_encrypt) is roundtrip-pinned in
    tests/test_functions.py."""
    from .functions.rsa import RSA_CODE, RSA_FLAG, rsa_encrypt_portable

    d = _t(spark, sf_dir, "documents")
    token = F.concat(
        F.lit("user"), F.col("doc_id").cast("string"), F.lit(":" + RSA_CODE)
    )
    c = rsa_encrypt_portable(token)
    return d.select(
        "doc_id",
        c.alias("cipher"),
        F.concat(c.cast("string"), F.lit(RSA_FLAG)).alias("auth_token"),
    )


def _sql_rsa_auth() -> str:
    """Generated oracle: md5h60(token) % n, then the e=65537 modpow
    unrolled as 16 nested HUGEINT squaring subqueries + final multiply.
    Nested (not textually expanded) so the SQL stays linear in size."""
    from .functions.rsa import PORTABLE_N, RSA_CODE, RSA_FLAG

    n = PORTABLE_N
    inner = f"""
SELECT doc_id, m, m AS x FROM (
  SELECT doc_id,
         CAST(('0x' || substr(md5('user' || doc_id::VARCHAR || ':{RSA_CODE}'), 1, 15))::BIGINT
              % {n} AS HUGEINT) AS m
  FROM documents
)"""
    for _ in range(16):
        inner = f"SELECT doc_id, m, (x * x) % {n} AS x FROM ({inner})"
    return f"""
SELECT doc_id,
       CAST((x * m) % {n} AS BIGINT) AS cipher,
       CAST((x * m) % {n} AS BIGINT)::VARCHAR || '{RSA_FLAG}' AS auth_token
FROM ({inner})
"""


QUERIES["q_rsa_auth"] = q_rsa_auth
ORACLES["q_rsa_auth"] = _sql_rsa_auth()


def q_captcha_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K10 — learned-model OCR (reference ddddocr path, oa.py:300-303)
    over the same rendered captcha set as q_captcha_pipeline, via the
    seeded closed-form classifier (kernels/nn_ocr.py). Ground-truth
    oracle: codes are (i*2467+987) % 10000 by construction, so a wrong
    feature grid / weight solve / argmax shows up as a value mismatch."""
    import numpy as np

    from .kernels.codec import encode_image
    from .kernels.image_ops import digit_templates, render_captcha
    from .operators.multimodal import captcha_solve_nn

    t = digit_templates()
    rng = np.random.RandomState(47)
    rows = []
    for i in range(40):
        code = f"{(i * 2467 + 987) % 10000:04d}"
        rows.append(
            (f"nn{i:03d}", bytearray(encode_image(render_captcha(code, t, noise=5, rng=rng), "png")))
        )
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    return captcha_solve_nn(df)


SQL_CAPTCHA_NN = """
SELECT 'nn' || lpad(i::VARCHAR, 3, '0') AS image_id,
       lpad(((i * 2467 + 987) % 10000)::VARCHAR, 4, '0') AS code
FROM range(40) t(i)
"""

QUERIES["q_captcha_nn"] = q_captcha_nn
ORACLES["q_captcha_nn"] = SQL_CAPTCHA_NN


# Training-pipeline queries (corpus curation: dedup keep-policy,
# stratified sampling, vocab stats, chunking, contamination, PII scrub,
# quantized centroids, sessionization) live in queries_pipeline.py;
# SQL_MINHASH_LSH is passed in so the dedup-keep oracle reuses the pair
# pipeline without a circular import.
from .queries_pipeline import register as _register_pipeline  # noqa: E402

_register_pipeline(QUERIES, ORACLES, SQL_MINHASH_LSH)

# Analytics/reporting queries over the TPC-H-shaped tables (exact
# integer-unit numerics; see queries_analytics.py module doc).
from .queries_analytics import register as _register_analytics  # noqa: E402

_register_analytics(QUERIES, ORACLES)

# Sketch + temporal joins (HLL distinct, as-of, bucketized range; see
# queries_temporal.py module doc).
from .queries_temporal import register as _register_temporal  # noqa: E402

_register_temporal(QUERIES, ORACLES)

# Curation + graph analysis (repetition rules, integer TF-IDF,
# co-occurrence triangles, hash splits; see queries_curation.py).
from .queries_curation import register as _register_curation  # noqa: E402

_register_curation(QUERIES, ORACLES)

# Login-envelope composition (K8 OCR → F9/F10 validate → F8 RSA seal;
# the batch twin of frontier/auth.py's real-socket login).
from .queries_auth import register as _register_auth  # noqa: E402

_register_auth(QUERIES, ORACLES)

# Storage-strategy queries (bucketed co-located join, value-oracled
# against the plain join; see queries_storage.py).
from .queries_storage import register as _register_storage  # noqa: E402

_register_storage(QUERIES, ORACLES)
