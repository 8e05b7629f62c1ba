"""Content extraction + rendering queries (SURVEY S5/S9/J4/F15/F17/F18):
CSS-selector HTML parse, /word/view link harvest, doc→attachments equi
join, digest ol/li render — the scrape-and-render surface over synthetic
pages derived relationally from the documents table. Split out of
queries.py (VERDICT r04 #8, pure hygiene — no behavior change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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


# --- X82: anchor-text aggregation (inverted link-text index) -----------------


def q_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-target anchor-text aggregation — the inverted link-text index
    a crawler builds from its harvested edges (the web-graph "anchor
    file" of Brin & Page 1998 §4.1; reference harvests the links at
    oa.py:806-817 but never target-aggregates them). Each doc emits 3
    outlinks relationally (target = /doc/{(doc_id*7+j) % 200}, anchor =
    the doc's j-th word); the operator inverts the edge list: per
    target, total in-links, distinct anchor texts, and the dominant
    anchor (most frequent, ties to the lexicographically smallest).

    Scale shape: explode → groupBy(target, anchor) with map-side
    combine (the only corpus-sized shuffle) → row_number window
    partitioned by target over the pre-aggregated counts (bounded by
    per-target anchor variety, never raw edges) → one keyed groupBy.
    Never a window over the raw edge list: a popular target at 100 TB
    has billions of in-links but only thousands of distinct anchors."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    links = base.select(
        "doc_id",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("j"),
        "w",
    ).select(
        F.concat(
            F.lit("/doc/"),
            ((F.col("doc_id") * 7 + F.col("j")) % 200).cast("string"),
        ).alias("target"),
        F.coalesce(F.get("w", F.col("j")), F.lit("")).alias("anchor"),
    )
    pc = links.groupBy("target", "anchor").agg(F.count("*").alias("c"))
    win = Window.partitionBy("target").orderBy(F.desc("c"), F.asc("anchor"))
    return (
        pc.withColumn("rn", F.row_number().over(win))
        .groupBy("target")
        .agg(
            F.sum("c").cast("long").alias("n_links"),
            F.count("*").cast("long").alias("n_anchors"),
            F.max(F.when(F.col("rn") == 1, F.col("anchor"))).alias("top_anchor"),
            F.max(F.when(F.col("rn") == 1, F.col("c")))
            .cast("long")
            .alias("top_anchor_links"),
        )
    )


SQL_ANCHOR_TEXT = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), l AS (
  SELECT '/doc/' || CAST((doc_id * 7 + j) % 200 AS VARCHAR) AS target,
         coalesce(w[j + 1], '') AS anchor
  FROM (SELECT doc_id, w, unnest([0, 1, 2]) AS j FROM w)
), pc AS (
  SELECT target, anchor, count(*) AS c FROM l GROUP BY target, anchor
), r AS (
  SELECT *, row_number() OVER (PARTITION BY target
                               ORDER BY c DESC, anchor ASC) AS rn
  FROM pc
)
SELECT target,
       sum(c)::BIGINT AS n_links,
       count(*)::BIGINT AS n_anchors,
       max(CASE WHEN rn = 1 THEN anchor END) AS top_anchor,
       max(CASE WHEN rn = 1 THEN c END)::BIGINT AS top_anchor_links
FROM r
GROUP BY target
"""


# --- X98: positional inverted index + exact phrase query --------------------


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X98: exact phrase search (operators/text.py::phrase_match) — the
    positional-index primitive behind verbatim contamination checks and
    quoted-query retrieval. The documents text is near-uniform random
    words, so deterministic phrases are injected: every 3rd doc ends
    " alpha beta" (a bigram DECOY sharing the phrase's prefix), every
    5th " alpha beta gamma" (a true match), every 20th a SECOND
    " alpha beta gamma" (n_matches = 2, and on %15 docs the decoy +
    match concatenation exercises the cross-boundary restart: ... alpha
    beta alpha beta gamma has only ONE trigram occurrence). The oracle
    rebuilds the postings relationally and replays the positional
    intersection chain; any drift in the +1 stepping, the sort, or the
    0-based first_pos mismatches."""
    from .operators.text import phrase_match

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = d.select(
        did,
        F.concat(
            F.col("text"),
            F.when(did % 3 == 0, F.lit(" alpha beta")).otherwise(F.lit("")),
            F.when(did % 5 == 0, F.lit(" alpha beta gamma")).otherwise(F.lit("")),
            F.when(did % 20 == 0, F.lit(" alpha beta gamma")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return phrase_match(aug, ["alpha", "beta", "gamma"])


SQL_PHRASE_SEARCH = r"""
WITH aug AS (
  SELECT doc_id, text
         || CASE WHEN doc_id % 3 = 0 THEN ' alpha beta' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' alpha beta gamma' ELSE '' END
         || CASE WHEN doc_id % 20 = 0 THEN ' alpha beta gamma' ELSE '' END AS text
  FROM documents
), toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM aug
), post AS (
  SELECT doc_id, unnest(t) AS term,
         unnest(list_transform(generate_series(1, len(t)), i -> i - 1)) AS pos
  FROM toks
), p0 AS (
  SELECT doc_id, list_sort(list(pos)) AS ps FROM post WHERE term = 'alpha' GROUP BY doc_id
), p1 AS (
  SELECT doc_id, list_sort(list(pos)) AS ps FROM post WHERE term = 'beta' GROUP BY doc_id
), p2 AS (
  SELECT doc_id, list_sort(list(pos)) AS ps FROM post WHERE term = 'gamma' GROUP BY doc_id
), s1 AS (
  SELECT p0.doc_id,
         list_intersect(list_transform(p0.ps, p -> p + 1), p1.ps) AS cur
  FROM p0 JOIN p1 USING (doc_id)
), s2 AS (
  SELECT s1.doc_id,
         list_intersect(list_transform(s1.cur, p -> p + 1), p2.ps) AS cur
  FROM s1 JOIN p2 USING (doc_id)
  WHERE len(s1.cur) > 0
)
SELECT doc_id, len(cur) AS n_matches, list_min(cur) - 2 AS first_pos
FROM s2 WHERE len(cur) > 0
"""


# --- X130: JSON-LD structured-data harvest ------------------------------------


def q_jsonld_harvest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X130: schema.org entity mining (operators/html.py::
    jsonld_harvest). Pages /u/{e}: every even page embeds an Article
    block (name a{e}, a derived datePublished), every %3 page a second
    Product block with NO date (NULL must survive), every %7 page a
    MALFORMED block (dropped — its block_idx gap is the tell). The
    oracle derives the entity rows relationally and applies DuckDB's
    own JSON extraction to the same literals."""
    from .operators.html import jsonld_harvest

    e = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    art = F.concat(
        F.lit('<script type="application/ld+json">{"@type":"Article","name":"a'),
        eid.cast("string"),
        F.lit('","datePublished":"2024-01-'),
        F.lpad((eid % 28 + 1).cast("string"), 2, "0"),
        F.lit('"}</script>'),
    )
    prod = F.concat(
        F.lit("<script type='application/ld+json'>"),
        F.lit('{"@type":"Product","name":"p'),
        eid.cast("string"),
        F.lit('"}</script>'),
    )
    bad = F.lit('<script type="application/ld+json">{oops</script>')
    html = F.concat(
        F.lit("<html><head>"),
        F.when(eid % 2 == 0, art).otherwise(F.lit("")),
        F.when(eid % 7 == 0, bad).otherwise(F.lit("")),
        F.when(eid % 3 == 0, prod).otherwise(F.lit("")),
        F.lit("</head></html>"),
    )
    pages = e.select(
        F.concat(F.lit("/u/"), eid.cast("string")).alias("url"),
        html.alias("html"),
    )
    return jsonld_harvest(pages)


SQL_JSONLD_HARVEST = """
WITH ev AS (
  SELECT event_id AS e, '/u/' || event_id AS url FROM events
), blocks AS (
  SELECT url,
         '{"@type":"Article","name":"a' || e || '","datePublished":"2024-01-'
           || lpad((e % 28 + 1)::VARCHAR, 2, '0') || '"}' AS b,
         0 AS ord
  FROM ev WHERE e % 2 = 0
  UNION ALL
  SELECT url, '{oops', 1 FROM ev WHERE e % 7 = 0
  UNION ALL
  SELECT url, '{"@type":"Product","name":"p' || e || '"}', 2
  FROM ev WHERE e % 3 = 0
), idx AS (
  SELECT url, b,
         (row_number() OVER (PARTITION BY url ORDER BY ord) - 1)::INT
           AS block_idx
  FROM blocks
)
SELECT url, block_idx,
       json_extract_string(b, '$."@type"') AS jtype,
       json_extract_string(b, '$.name') AS name,
       json_extract_string(b, '$.datePublished') AS date_published
FROM idx
WHERE json_valid(b) AND json_extract_string(b, '$."@type"') IS NOT NULL
"""


# --- X129: soft-404 detection -------------------------------------------------


def q_soft404(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X129: soft-404 screen (operators/html.py::soft404_detect). Pages
    /u/{e}: every 7th serves 'Page Not Found' boilerplate with status
    200 (the phrase path), every 5th a near-empty linkless stub (the
    dead-end path), every 13th a HARD 404 with error text — which must
    NOT flag (T2 owns it); everyone else gets real text plus an
    outlink. The oracle re-derives the strip/token/link signals."""
    from .operators.html import soft404_detect

    e = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    body = (
        F.when(eid % 13 == 0, F.lit("<p>404 page not found</p>"))
        .when(eid % 7 == 0, F.lit("<h1>Page Not Found</h1><p>error 404</p>"))
        .when(eid % 5 == 0, F.lit("<p>stub</p>"))
        .otherwise(
            F.concat(
                F.lit("<p>real content words one two three four five six "
                      "seven eight nine ten eleven</p><a href=\"/u/"),
                (eid + 1).cast("string"),
                F.lit('">next</a>'),
            )
        )
    )
    pages = e.select(
        F.concat(F.lit("/u/"), eid.cast("string")).alias("url"),
        F.when(eid % 13 == 0, 404).otherwise(200).cast("int").alias("status"),
        F.concat(F.lit("<html><body>"), body, F.lit("</body></html>")).alias(
            "html"
        ),
    )
    return soft404_detect(pages, min_tokens=12)


SQL_SOFT404 = """
WITH pg AS (
  SELECT '/u/' || event_id AS url,
         CASE WHEN event_id % 13 = 0 THEN 404 ELSE 200 END AS status,
         CASE WHEN event_id % 13 = 0 THEN '<p>404 page not found</p>'
              WHEN event_id % 7 = 0
                THEN '<h1>Page Not Found</h1><p>error 404</p>'
              WHEN event_id % 5 = 0 THEN '<p>stub</p>'
              ELSE '<p>real content words one two three four five six '
                   || 'seven eight nine ten eleven</p><a href="/u/'
                   || (event_id + 1) || '">next</a>' END AS body
  FROM events
), f AS (
  SELECT url, status,
    lower(trim(regexp_replace(regexp_replace(
      '<html><body>' || body || '</body></html>',
      '(?s)<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))) AS vis,
    '<html><body>' || body || '</body></html>' AS h
  FROM pg
), s AS (
  SELECT url, status,
    (contains(vis, 'page not found') OR contains(vis, '404')
     OR contains(vis, 'does not exist')
     OR contains(vis, 'no longer available')) AS phrase_hit,
    (CASE WHEN vis = '' THEN 0
          ELSE len(string_split(vis, ' ')) END)::BIGINT AS n_tokens,
    (len(string_split(lower(h), '<a ')) - 1)::BIGINT AS n_links
  FROM f
)
SELECT url, status, phrase_hit, n_tokens, n_links,
       (status = 200 AND (phrase_hit OR (n_tokens < 12 AND n_links = 0)))
         AS soft404
FROM s
"""


# --- X121: HTML table -> relational cells -------------------------------------


def q_table_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X121: bulk table mining (operators/html.py::extract_tables).
    Every doc publishes a 3-row key/value table (th header row, a
    source row, an inner-<b>-tagged label the strip must flatten) and
    every 4th doc a SECOND one-cell table — multi-table indexing,
    th+td mixing, and tag stripping all live. The oracle derives the
    cell relation directly from the source columns, never touching the
    HTML — extraction drift mismatches values."""
    from .operators.html import extract_tables

    d = _t(spark, sf_dir, "documents")
    t1 = F.concat(
        F.lit("<table><tr><th>k</th><th>v</th></tr><tr><td>src</td><td>"),
        F.col("source"),
        F.lit("</td></tr><tr><td><b>n</b></td><td>"),
        F.col("n_chars").cast("string"),
        F.lit("</td></tr></table>"),
    )
    html = F.concat(
        F.lit("<html><body>"),
        t1,
        F.when(
            F.col("doc_id") % 4 == 0,
            F.lit("<table><tr><td>extra</td></tr></table>"),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    return extract_tables(d.select("doc_id", html.alias("html")))


SQL_TABLE_EXTRACT = """
SELECT doc_id, 0 AS table_idx, 0 AS row_idx, 0 AS col_idx, 'k' AS cell_text
FROM documents
UNION ALL SELECT doc_id, 0, 0, 1, 'v' FROM documents
UNION ALL SELECT doc_id, 0, 1, 0, 'src' FROM documents
UNION ALL SELECT doc_id, 0, 1, 1, source FROM documents
UNION ALL SELECT doc_id, 0, 2, 0, 'n' FROM documents
UNION ALL SELECT doc_id, 0, 2, 1, n_chars::VARCHAR FROM documents
UNION ALL SELECT doc_id, 1, 0, 0, 'extra' FROM documents WHERE doc_id % 4 = 0
"""


# --- X115: charset detection cascade ------------------------------------------


def q_charset_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X115: WHATWG-order charset sniffing (operators/multimodal.py::
    charset_detect). Six deterministic variants from events: a UTF-8
    BOM payload; a header charset that OVERRIDES a contradicting meta
    (precedence pinned); a meta-only GBK; a high-byte GBK-looking body
    with no declarations (heuristic fires); plain ASCII; and the
    http-equiv meta form with the charset buried in the content
    attribute."""
    from .operators.multimodal import charset_detect

    e = _t(spark, sf_dir, "events")
    v = (F.col("event_id") % 6).alias("v")
    base = e.select(F.col("event_id").alias("blob_id"), v)
    hexes = F.array(
        F.lit("EFBBBF414243"),
        F.lit("414243"),
        F.lit("414243"),
        F.lit("C4E3BAC3C4E3"),
        F.lit("68656C6C6F"),
        F.lit("414243"),
    )
    headers = F.array(
        F.lit("text/html"),
        F.lit("text/html; charset=ISO-8859-1"),
        F.lit("text/html"),
        F.lit("text/html"),
        F.lit("text/html"),
        F.lit("text/html"),
    )
    htmls = F.array(
        F.lit("<html></html>"),
        F.lit('<html><meta charset="utf-8"></html>'),
        F.lit('<html><meta charset="GBK"></html>'),
        F.lit("<html></html>"),
        F.lit("<html></html>"),
        F.lit(
            '<html><meta http-equiv="Content-Type"'
            ' content="text/html; charset=big5"></html>'
        ),
    )
    blobs = base.select(
        "blob_id",
        F.element_at(hexes, F.col("v").cast("int") + 1).alias("lead_hex"),
        F.element_at(headers, F.col("v").cast("int") + 1).alias("header_ct"),
        F.element_at(htmls, F.col("v").cast("int") + 1).alias("html"),
    )
    return charset_detect(blobs).select(
        "blob_id", "highbyte_milli", "charset", "charset_source"
    )


SQL_CHARSET_DETECT = """
WITH base AS (
  SELECT event_id AS blob_id, event_id % 6 AS v FROM events
), blobs AS (
  SELECT blob_id,
    ['EFBBBF414243','414243','414243','C4E3BAC3C4E3','68656C6C6F','414243'][v + 1]
      AS hx,
    ['text/html','text/html; charset=ISO-8859-1','text/html','text/html',
     'text/html','text/html'][v + 1] AS header_ct,
    ['<html></html>','<html><meta charset="utf-8"></html>',
     '<html><meta charset="GBK"></html>','<html></html>','<html></html>',
     '<html><meta http-equiv="Content-Type" content="text/html; charset=big5"></html>'
    ][v + 1] AS html
  FROM base
), f AS (
  SELECT blob_id, hx, header_ct, html,
    length(hx) // 2 AS np,
    len(list_filter(range(1, length(hx) // 2 + 1),
        i -> substr(hx, (2 * i - 1)::INT, 1) >= '8')) AS hb,
    CASE WHEN hx LIKE 'EFBBBF%' THEN 'utf-8'
         WHEN hx LIKE 'FFFE%' THEN 'utf-16le'
         WHEN hx LIKE 'FEFF%' THEN 'utf-16be' END AS bom,
    nullif(lower(regexp_extract(header_ct, '(?i)charset=([A-Za-z0-9_-]+)', 1)),
           '') AS hdr,
    nullif(lower(regexp_extract(html,
           '(?i)<meta[^>]*charset=["'']?([A-Za-z0-9_-]+)', 1)), '') AS meta
  FROM blobs
), m AS (
  SELECT blob_id,
    (CASE WHEN np > 0 THEN (1000 * hb) // np ELSE 0 END)::BIGINT
      AS highbyte_milli,
    bom, hdr, meta
  FROM f
)
SELECT blob_id, highbyte_milli,
       coalesce(bom, hdr, meta,
                CASE WHEN highbyte_milli > 300 THEN 'gbk-likely'
                     ELSE 'ascii' END) AS charset,
       CASE WHEN bom IS NOT NULL THEN 'bom'
            WHEN hdr IS NOT NULL THEN 'header'
            WHEN meta IS NOT NULL THEN 'meta'
            ELSE 'heuristic' END AS charset_source
FROM m
"""


# --- X114: render-tier routing ------------------------------------------------


def q_render_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X114: headless-render routing (operators/html.py::render_routing).
    Pages synthesized from documents: every %3 doc carries two script
    blocks (one sized by doc_id — script-dominated for short docs),
    every %5 doc a root mount div, every %15 doc truncated server text
    (50 chars) — the SPA signature (mount + no visible text) that MUST
    route to render even when script share alone wouldn't. The oracle
    replicates the strip-regex byte accounting, not the generator."""
    from .operators.html import render_routing

    d = _t(spark, sf_dir, "documents")
    txt = F.when(
        F.col("doc_id") % 15 == 0, F.substring(F.trim(F.col("text")), 1, 50)
    ).otherwise(F.trim(F.col("text")))
    h = F.concat(
        F.lit("<html><body><p>"),
        txt,
        F.lit("</p>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('<script src="a.js"></script><script>var x="'),
                F.repeat(F.lit("x"), (F.col("doc_id") % 400 + 100).cast("int")),
                F.lit('";</script>'),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit('<div id="root"></div>')).otherwise(
            F.lit("")
        ),
        F.lit("</body></html>"),
    )
    return render_routing(d.select("doc_id", h.alias("html")))


SQL_RENDER_ROUTING = r"""
WITH doc AS (
  SELECT doc_id,
    CASE WHEN doc_id % 15 = 0 THEN substr(trim(text), 1, 50)
         ELSE trim(text) END AS txt
  FROM documents
), pg AS (
  SELECT doc_id,
    '<html><body><p>' || txt || '</p>'
    || CASE WHEN doc_id % 3 = 0
            THEN '<script src="a.js"></script><script>var x="'
                 || repeat('x', (doc_id % 400) + 100) || '";</script>'
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN '<div id="root"></div>' ELSE '' END
    || '</body></html>' AS h
  FROM doc
), m AS (
  SELECT doc_id, h, length(h) AS total,
         regexp_replace(h, '(?is)<script\b.*?</script>', '', 'g') AS nos
  FROM pg
), f AS (
  SELECT doc_id,
    len(regexp_extract_all(h, '(?i)<script\b'))::BIGINT AS script_blocks,
    ((1000 * (total - length(nos))) // total)::BIGINT AS script_milli,
    length(trim(regexp_replace(nos, '(?s)<[^>]*>', '', 'g')))::BIGINT
      AS visible_chars,
    (contains(lower(h), 'id="root"') OR contains(lower(h), 'id="app"')
     OR contains(lower(h), 'data-reactroot')
     OR contains(lower(h), 'ng-app')) AS spa_marker
  FROM m
)
SELECT doc_id, script_blocks, script_milli, visible_chars, spa_marker,
       CASE WHEN (spa_marker AND visible_chars < 200) OR script_milli > 700
            THEN 'render' ELSE 'static' END AS route
FROM f
"""


def register(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "q_html_parse": q_html_parse,
            "q_html_links": q_html_links,
            "q_attachments_join": q_attachments_join,
            "q_digest_render": q_digest_render,
            "q_anchor_text": q_anchor_text,
            "q_phrase_search": q_phrase_search,
            "q_render_routing": q_render_routing,
            "q_charset_detect": q_charset_detect,
            "q_table_extract": q_table_extract,
            "q_soft404": q_soft404,
            "q_jsonld_harvest": q_jsonld_harvest,
            "q_asset_extract": q_asset_extract,
            "q_heading_outline": q_heading_outline,
            "q_main_content": q_main_content,
        }
    )
    oracles.update(
        {
            "q_html_parse": SQL_HTML_PARSE,
            "q_html_links": SQL_HTML_LINKS,
            "q_attachments_join": SQL_ATTACHMENTS_JOIN,
            "q_digest_render": SQL_DIGEST_RENDER,
            "q_anchor_text": SQL_ANCHOR_TEXT,
            "q_phrase_search": SQL_PHRASE_SEARCH,
            "q_render_routing": SQL_RENDER_ROUTING,
            "q_charset_detect": SQL_CHARSET_DETECT,
            "q_table_extract": SQL_TABLE_EXTRACT,
            "q_soft404": SQL_SOFT404,
            "q_jsonld_harvest": SQL_JSONLD_HARVEST,
            "q_asset_extract": SQL_ASSET_EXTRACT,
            "q_heading_outline": SQL_HEADING_OUTLINE,
            "q_main_content": SQL_MAIN_CONTENT,
        }
    )


# --- X142: subresource asset extraction + per-page budget ---------------------


def q_asset_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X142: media-tier asset harvest (operators/html.py::
    extract_assets). Each doc renders a page with (doc_id mod 5)+1
    images — the FIRST repeated verbatim to exercise per-page dedup —
    a stylesheet on even docs and a script on every third doc; budget
    4, images first, so gallery pages (4-5 images) push their css and
    script past the admission line."""
    from .operators.html import extract_assets

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    n_img = (did % 5) + 1
    imgs = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_img - 1),
            lambda k: F.concat(
                F.lit('<img class="ph" src="/img/'),
                ((did % 40) + k).cast("string"),
                F.lit('.jpg">'),
            ),
        ),
        "",
    )
    dup = F.concat(
        F.lit('<img class="ph" src="/img/'),
        (did % 40).cast("string"),
        F.lit('.jpg">'),
    )
    css = F.when(
        did % 2 == 0,
        F.lit('<link rel="stylesheet" href="/s/main.css">'),
    ).otherwise(F.lit(""))
    js = F.when(
        did % 3 == 0, F.lit('<script defer src="/js/app.js"></script>')
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head>"), css, js, F.lit("</head><body>"),
        imgs, dup, F.lit("</body></html>"),
    )
    pages = d.select("doc_id", html.alias("html"))
    return extract_assets(pages, html_col="html", per_page_budget=4)


SQL_ASSET_EXTRACT = """
WITH pg AS (
  SELECT doc_id,
    '<html><head>'
    || CASE WHEN doc_id % 2 = 0
            THEN '<link rel="stylesheet" href="/s/main.css">' ELSE '' END
    || CASE WHEN doc_id % 3 = 0
            THEN '<script defer src="/js/app.js"></script>' ELSE '' END
    || '</head><body>'
    || array_to_string(list_transform(
         generate_series(0, doc_id % 5),
         k -> '<img class="ph" src="/img/' || ((doc_id % 40) + k)::VARCHAR
              || '.jpg">'), '')
    || '<img class="ph" src="/img/' || (doc_id % 40)::VARCHAR || '.jpg">'
    || '</body></html>' AS html
  FROM documents
), tags AS (
  SELECT doc_id, url, 1 AS priority, i - 1 AS pos FROM (
    SELECT doc_id,
           regexp_extract_all(html, '<img[^>]*\\ssrc="([^"]+)"', 1) AS l
    FROM pg), LATERAL unnest(generate_series(1, len(l))) u(i),
    LATERAL (SELECT l[i] AS url) v
  UNION ALL
  SELECT doc_id, url, 2 AS priority, i - 1 AS pos FROM (
    SELECT doc_id,
           regexp_extract_all(html, '<link[^>]*\\shref="([^"]+\\.css)"', 1) AS l
    FROM pg), LATERAL unnest(generate_series(1, len(l))) u(i),
    LATERAL (SELECT l[i] AS url) v
  UNION ALL
  SELECT doc_id, url, 3 AS priority, i - 1 AS pos FROM (
    SELECT doc_id,
           regexp_extract_all(html, '<script[^>]*\\ssrc="([^"]+)"', 1) AS l
    FROM pg), LATERAL unnest(generate_series(1, len(l))) u(i),
    LATERAL (SELECT l[i] AS url) v
), dd AS (
  SELECT doc_id, url AS asset_url,
         min(priority)::INT AS priority,
         min(pos)::BIGINT AS first_pos
  FROM tags GROUP BY doc_id, url
), k AS (
  SELECT *,
         CASE priority WHEN 1 THEN 'img' WHEN 2 THEN 'css'
              ELSE 'script' END AS kind,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY priority, first_pos, asset_url) AS rank
  FROM dd
)
SELECT doc_id, asset_url, priority, first_pos, kind,
       rank::INT AS rank, (rank <= 4) AS admitted
FROM k
"""


# --- X153: heading-outline (TOC) extraction -----------------------------------


def q_heading_outline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X153: section-tree extraction (operators/html.py::
    heading_outline). Each doc renders an h1 plus (doc_id mod 3)+1 h2
    sections, even-numbered sections carrying an h3 — so every parent
    arity (null for h1, the h1 for h2s, the owning h2 for h3s) and
    both section_end cases (next sibling / page end) occur."""
    from .operators.html import heading_outline

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    n = (did % 3) + 1
    secs = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda k: F.concat(
                F.lit("<h2>S"), k.cast("string"), F.lit("</h2>"),
                F.when(
                    k % 2 == 0,
                    F.concat(F.lit("<h3>D"), k.cast("string"), F.lit("</h3>")),
                ).otherwise(F.lit("")),
            ),
        ),
        "",
    )
    html = F.concat(
        F.lit("<html><body><h1>T"), did.cast("string"), F.lit("</h1>"),
        secs, F.lit("</body></html>"),
    )
    return heading_outline(d.select("doc_id", html.alias("html")))


SQL_HEADING_OUTLINE = """
WITH pg AS (
  SELECT doc_id,
    '<html><body><h1>T' || doc_id::VARCHAR || '</h1>'
    || array_to_string(list_transform(
         generate_series(0, doc_id % 3),
         k -> '<h2>S' || k::VARCHAR || '</h2>'
              || CASE WHEN k % 2 = 0
                      THEN '<h3>D' || k::VARCHAR || '</h3>' ELSE '' END),
       '')
    || '</body></html>' AS html
  FROM documents
), blk AS (
  SELECT doc_id, (i - 1)::BIGINT AS pos, l[i] AS b
  FROM (SELECT doc_id,
               regexp_extract_all(html, '(?s)<h[1-6][^>]*>.*?</h[1-6]>')
                 AS l
        FROM pg),
       LATERAL unnest(generate_series(1, len(l))) u(i)
), h AS (
  SELECT doc_id, pos,
         substr(b, 3, 1)::INT AS level,
         trim(regexp_replace(regexp_replace(b, '(?s)<[^>]*>', ' ', 'g'),
                             '\\s+', ' ', 'g')) AS title
  FROM blk
), w AS (
  SELECT *,
    max(CASE WHEN level < 2 THEN pos END) OVER back AS p2,
    max(CASE WHEN level < 3 THEN pos END) OVER back AS p3,
    max(CASE WHEN level < 4 THEN pos END) OVER back AS p4,
    max(CASE WHEN level < 5 THEN pos END) OVER back AS p5,
    max(CASE WHEN level < 6 THEN pos END) OVER back AS p6,
    min(CASE WHEN level <= 1 THEN pos END) OVER fwd AS e1,
    min(CASE WHEN level <= 2 THEN pos END) OVER fwd AS e2,
    min(CASE WHEN level <= 3 THEN pos END) OVER fwd AS e3,
    min(CASE WHEN level <= 4 THEN pos END) OVER fwd AS e4,
    min(CASE WHEN level <= 5 THEN pos END) OVER fwd AS e5,
    min(CASE WHEN level <= 6 THEN pos END) OVER fwd AS e6
  FROM h
  WINDOW back AS (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         fwd AS (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT doc_id, pos, level, title,
       (CASE level WHEN 1 THEN NULL WHEN 2 THEN p2 WHEN 3 THEN p3
             WHEN 4 THEN p4 WHEN 5 THEN p5 ELSE p6 END)::BIGINT
         AS parent_pos,
       (CASE level WHEN 1 THEN e1 WHEN 2 THEN e2 WHEN 3 THEN e3
             WHEN 4 THEN e4 WHEN 5 THEN e5 ELSE e6 END)::BIGINT
         AS section_end
FROM w
"""


# --- X156: main-content extraction by link density ----------------------------


def q_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X156: Boilerpipe-style content scrub (operators/html.py::
    main_content_extract). Each page carries a nav block (pure anchor
    text — density 1000, dropped), two prose blocks cut from the doc
    text (kept when they clear 20 chars), and a pager block (anchors
    only, dropped); the oracle recomputes block pos/length/density
    from the same synthesis and md5s the identical reassembly."""
    from .operators.html import main_content_extract

    d = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<p class="nav"><a href="/">Home</a> <a href="/a">About</a>'
              '</p>'),
        F.lit("<p>"), F.substring("text", 1, 40), F.lit("</p>"),
        F.lit("<p>"), F.substring("text", 41, 40), F.lit("</p>"),
        F.lit('<p><a href="/p">Prev</a><a href="/n">Next</a></p>'),
    )
    return main_content_extract(d.select("doc_id", html.alias("html")))


SQL_MAIN_CONTENT = """
WITH pg AS (
  SELECT doc_id,
    '<p class="nav"><a href="/">Home</a> <a href="/a">About</a></p>'
    || '<p>' || substring(text, 1, 40) || '</p>'
    || '<p>' || substring(text, 41, 40) || '</p>'
    || '<p><a href="/p">Prev</a><a href="/n">Next</a></p>' AS html
  FROM documents
), blk AS (
  SELECT doc_id, (i - 1)::BIGINT AS pos, l[i] AS b
  FROM (SELECT doc_id,
               regexp_extract_all(html, '(?s)<p[^>]*>.*?</p>') AS l
        FROM pg),
       LATERAL unnest(generate_series(1, len(l))) u(i)
), sc AS (
  SELECT doc_id, pos,
         trim(regexp_replace(b, '(?s)<[^>]*>', '', 'g')) AS t,
         length(trim(regexp_replace(b, '(?s)<[^>]*>', '', 'g')))
         - length(trim(regexp_replace(
             regexp_replace(b, '(?s)<a[^>]*>.*?</a>', '', 'g'),
             '(?s)<[^>]*>', '', 'g'))) AS lk
  FROM blk
), kp AS (
  SELECT doc_id, pos, t,
         ((1000 * lk) // greatest(length(t), 1) < 500
          AND length(t) >= 20) AS keep
  FROM sc
)
SELECT doc_id, count(*)::BIGINT AS n_blocks,
       count(*) FILTER (WHERE keep)::BIGINT AS n_kept,
       coalesce(sum(length(t)) FILTER (WHERE keep), 0)::BIGINT
         AS main_chars,
       md5(coalesce(string_agg(t, chr(10) ORDER BY pos)
                    FILTER (WHERE keep), '')) AS main_md5
FROM kp GROUP BY doc_id
"""
