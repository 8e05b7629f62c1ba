"""Sitemap XML parsing — raw sitemap/sitemapindex text to the per-host
URL discovery table the frontier seeds from.

The reference discovers URLs only by scraping listing pages
(/root/reference/oa_spider/oa.py:113-214); a deployed crawler's other
discovery channel is the sitemap protocol (sitemaps.org), reached from
the `Sitemap:` lines the X91 robots parser already surfaces. This module
is the downstream consumer: raw XML text in, one row per <url>/<sitemap>
entry out, ready to anti-join against the seen set.

Everything is pure column regex/string expressions (Java regex on the
Spark side, RE2 in the DuckDB oracle — so no backreferences anywhere):
a sitemap is KB..MB-sized text and entries are row-local after one
explode, so the whole parse is a zero-shuffle narrow map over however
many million sitemap fetches the round staged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# XML entity decoding, &amp; LAST so "&amp;lt;" decodes to the literal
# "&lt;" (the standard two-phase pitfall).
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")]


def _xml_unescape(col: F.Column) -> F.Column:
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _tag(block: F.Column, tag: str) -> F.Column:
    """Trimmed text content of the first <tag>…</tag> in the block
    ('' when absent); (?s) so values may wrap across lines."""
    return F.trim(F.regexp_extract(block, rf"(?s)<{tag}>(.*?)</{tag}>", 1))


def parse_sitemaps(df: DataFrame) -> DataFrame:
    """Parse (host, sitemap_xml) rows into one row per entry:

      (host, kind, loc, lastmod, changefreq, priority_milli)

    * `kind` is 'url' for <urlset> entries and 'sitemap' for
      <sitemapindex> entries (index rows are fed back to the fetcher,
      url rows to the frontier);
    * XML comments are stripped before block extraction, so
      commented-out entries never surface;
    * `loc` is entity-decoded (&amp; → & etc.) and entries without a
      <loc> are dropped — they name nothing to fetch;
    * `lastmod`/`changefreq` are NULL when absent; `priority` (a 0..1
      decimal per the protocol) becomes exact milli-units with the
      repo's standard integer quantization, NULL when absent.

    One explode per kind, a union, zero shuffles — every expression is
    row-local, and the distinct() dedup of repeated entries inside one
    document is left to the caller's seen anti-join where it belongs.
    """
    xml = F.regexp_replace(F.col("sitemap_xml"), r"(?s)<!--.*?-->", "")

    def entries(kind: str) -> DataFrame:
        block = F.explode(
            F.expr(
                f"regexp_extract_all(_clean, '(?s)<{kind}>(.*?)</{kind}>', 1)"
            )
        ).alias("block")
        b = F.col("block")
        prio = _tag(b, "priority")
        return (
            df.select("host", xml.alias("_clean"))
            .select("host", block)
            .select(
                "host",
                F.lit(kind).alias("kind"),
                _xml_unescape(_tag(b, "loc")).alias("loc"),
                F.nullif(_tag(b, "lastmod"), F.lit("")).alias("lastmod"),
                F.nullif(_tag(b, "changefreq"), F.lit("")).alias("changefreq"),
                F.when(
                    prio != "",
                    F.round(prio.cast("double") * 1000, 0).cast("long"),
                ).alias("priority_milli"),
            )
            .filter(F.col("loc") != "")
        )

    return entries("url").unionByName(entries("sitemap"))


def coverage_diff(declared: DataFrame, crawled: DataFrame) -> DataFrame:
    """Declared-vs-crawled coverage census per host — the closing audit
    of the discovery loop (X92 parse → X107 feed → rounds): how much of
    what each host DECLARES has actually been crawled, and how much of
    what was crawled the host never declared (orphans — the hidden
    inventory sitemap-only crawls miss). Both inputs (host, url); one
    full-outer url-keyed join tagged by side, one host-keyed
    conditional aggregate. coverage_milli = 1000·both div declared
    (1000 when the sitemap is exhausted), orphan_milli = 1000·orphans
    div crawled."""
    d = declared.select("host", "url").distinct().withColumn("_d", F.lit(1))
    c = crawled.select("host", "url").distinct().withColumn("_c", F.lit(1))
    j = d.join(c, ["host", "url"], "full_outer")
    return (
        j.groupBy("host")
        .agg(
            F.sum(F.coalesce(F.col("_d"), F.lit(0))).alias("n_declared"),
            F.sum(F.coalesce(F.col("_c"), F.lit(0))).alias("n_crawled"),
            F.sum(
                F.when(F.col("_d").isNotNull() & F.col("_c").isNotNull(), 1)
                .otherwise(0)
            ).alias("n_both"),
        )
        .select(
            "host",
            "n_declared",
            "n_crawled",
            "n_both",
            F.expr(
                "CASE WHEN n_declared = 0 THEN 0 "
                "ELSE 1000 * n_both div n_declared END"
            ).alias("coverage_milli"),
            F.expr(
                "CASE WHEN n_crawled = 0 THEN 0 "
                "ELSE 1000 * (n_crawled - n_both) div n_crawled END"
            ).alias("orphan_milli"),
        )
    )
