"""URL canonicalization + hashing as pure Column expressions.

The seen-set key is ``xxhash64(url_canon)`` (FIXTURES.md §2-3); the whole
canonicalization must therefore be deterministic and identical everywhere
it is computed. Rules (superset of what the reference's sites need —
the reference never canonicalizes because its server does dedup, §1.3):

  * strip the fragment
  * lowercase scheme and host
  * drop default ports (:80 http, :443 https)
  * sort query parameters bytewise (stable dedup of reordered queries)
  * drop a trailing '?' left by an empty query

All built-in functions — the expression stays inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def host_of(url: Column | str) -> Column:
    """lowercased host[:port] — the politeness partition key."""
    c = F.col(url) if isinstance(url, str) else url
    no_frag = F.substring_index(c, "#", 1)
    rest = F.substring_index(no_frag, "://", -1)
    return F.lower(F.substring_index(F.substring_index(rest, "/", 1), "?", 1))


def canonicalize_url(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    no_frag = F.substring_index(c, "#", 1)
    scheme = F.lower(F.substring_index(no_frag, "://", 1))
    rest = F.substring_index(no_frag, "://", -1)
    hostport = F.lower(F.substring_index(F.substring_index(rest, "/", 1), "?", 1))
    host = F.when(scheme == "http", F.regexp_replace(hostport, ":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(hostport, ":443$", "")).otherwise(hostport)
    )
    # path+query = rest minus the leading host[:port]
    pathq = F.substring(
        rest,
        F.length(F.substring_index(F.substring_index(rest, "/", 1), "?", 1)) + 1,
        F.lit(2**30),
    )
    path = F.substring_index(pathq, "?", 1)
    has_q = F.instr(pathq, "?") > 0
    query = F.substring_index(pathq, "?", -1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(has_q & (sorted_q != ""), F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )


def url_hash(url_canon: Column | str) -> Column:
    """Seen-set key: 64-bit xxhash of the canonical URL (FIXTURES.md §3).

    The reference's analog is server-side read-marking keyed by doc id
    (`oa.py:384,507-510`); at 10^10-URL scale the key must be a fixed-width
    integer so the Bloom filter and the seen table stay compact.
    """
    c = F.col(url_canon) if isinstance(url_canon, str) else url_canon
    return F.xxhash64(c)


def with_url_columns(df, url_col: str = "url"):
    """Attach url_canon / url_hash / host derived columns."""
    canon = canonicalize_url(url_col)
    return (
        df.withColumn("url_canon", canon)
        .withColumn("url_hash", url_hash(F.col("url_canon")))
        .withColumn("host", host_of(url_col))
    )
