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
    """Per-user session summary (30-min gap): sessions per user + longest
    session. Folded onto the shared gap-sessionizer (operators/pipeline.py::
    sessionize) per VERDICT r04 #8 — one sessionization code path
    engine-wide; q_user_sessions exposes the same operator at per-session
    granularity (6-h gap)."""
    from .operators.pipeline import sessionize

    s = sessionize(_t(spark, sf_dir, "events"), gap_s=1800)
    return s.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").alias("max_session_len"),
    )


SQL_SESSIONIZE = """
WITH t AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), s AS (
  SELECT user_id,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM t
), g AS (
  SELECT user_id, session_seq, count(*) AS n_events
  FROM s GROUP BY user_id, session_seq
)
SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_len
FROM g GROUP BY user_id
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


# --- domain-split query modules --------------------------------------------
# Each module registers its (query, oracle) pairs into the dicts above;
# keys are unique so registration order is cosmetic. SQL_MINHASH_LSH is
# re-exported by queries_dedup so the dedup-keep oracle in
# queries_pipeline can compose the pair pipeline without a circular
# import.

# Text/embedding dedup + ANN (minhash LSH, simhash pairs/components,
# winnowing fingerprints, hyperplane near-dups, IVF; see queries_dedup.py).
from .queries_dedup import SQL_MINHASH_LSH  # noqa: E402
from .queries_dedup import register as _register_dedup  # noqa: E402

_register_dedup(QUERIES, ORACLES)

# Multimodal decode/OCR (images, frames, audio, GBK, captcha template +
# learned; see queries_media.py).
from .queries_media import register as _register_media  # noqa: E402

_register_media(QUERIES, ORACLES)

# HTML scrape + render surface (CSS parse, link harvest, attachments
# join, digest render; see queries_content.py).
from .queries_content import register as _register_content  # noqa: E402

_register_content(QUERIES, ORACLES)

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
# the batch twin of frontier/auth.py's real-socket login) + bulk RSA
# token sealing (F8).
from .queries_auth import register as _register_auth  # noqa: E402

_register_auth(QUERIES, ORACLES)

# Storage-strategy queries (bucketed co-located join, value-oracled
# against the plain join; see queries_storage.py).
from .queries_storage import register as _register_storage  # noqa: E402

_register_storage(QUERIES, ORACLES)

# Crawl-operations queries (recrawl scheduling, SCD1 merge-upsert,
# trap detection, histogram quantiles; see queries_crawlops.py).
from .queries_crawlops import register as _register_crawlops  # noqa: E402

_register_crawlops(QUERIES, ORACLES)
