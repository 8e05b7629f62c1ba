"""Storage-strategy query: the bucketed co-located join (X42) as a
first-class, value-oracled `queries()` entry (VERDICT r04 item 7).

The 100-TB story: fact tables are written CLUSTERED BY their join key
ONCE, and every later join on that key reads co-located buckets instead
of re-shuffling terabytes per query. The plan property (SortMergeJoin
with ZERO Exchange, bucket-pruned point reads) is pinned in
tests/test_bucketing.py; THIS entry value-checks the data path — the
oracle is the plain (non-bucketed) join, so any row lost, duplicated,
or mis-bucketed by the CTAS → bucketed-read → join pipeline shows up as
a value mismatch. Same trick as the X34 salted join and X63 Bloom join:
the optimized physical strategy must be invisible in the result.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STAGE = os.environ.get(
    "SPARK_GRAFT_STAGE_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
)


def _bucketed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, lang, n_chars) as a CLUSTERED BY (doc_id) table,
    created once per (session, sf_dir) — reruns reuse the existing table
    exactly like a production catalog would."""
    # the location carries the Spark application id: a CTAS at a leftover
    # LOCATION from a previous session's run fails (the dir outlives the
    # in-memory catalog entry), so each session gets its own directory
    digest = hashlib.md5(
        f"{sf_dir}|{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:8]
    name = f"oa_docs_bucketed_{digest}"
    if not spark.catalog.tableExists(name):
        loc = f"{_STAGE}/{name}"
        if os.path.isdir(loc):  # crashed prior run of THIS session id
            import shutil

            shutil.rmtree(loc)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs.createOrReplaceTempView(f"_src_{name}")
        spark.sql(
            f"CREATE TABLE {name} USING PARQUET "
            f"CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO 8 BUCKETS "
            f"LOCATION '{loc}' "
            f"AS SELECT doc_id, lang, n_chars FROM _src_{name}"
        )
    return spark.table(name)


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _bucketed_docs(spark, sf_dir)
    # the merge hint pins SortMergeJoin: at oracle scale the small side
    # would auto-broadcast and skip the bucketed read — at 100 TB neither
    # side broadcasts, and the hint recreates that shape (zero-Exchange
    # co-located join, pinned in tests/test_bucketing.py)
    sampled = t.filter(F.col("doc_id") % 3 == 0).select("doc_id", "n_chars")
    return (
        t.alias("a").hint("merge")
        .join(sampled.alias("b"), "doc_id")
        .select("doc_id", F.col("a.lang").alias("lang"),
                F.col("b.n_chars").alias("n_chars"))
    )


# the oracle IS the plain join — bucketing must be result-invisible
SQL_BUCKETED_JOIN = """
SELECT a.doc_id AS doc_id, a.lang AS lang, b.n_chars AS n_chars
FROM documents a
JOIN (SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 0) b
  USING (doc_id)
"""


def register(
    queries: dict[str, Callable[[SparkSession, str], DataFrame]],
    oracles: dict[str, str],
) -> None:
    queries["q_bucketed_join"] = q_bucketed_join
    oracles["q_bucketed_join"] = SQL_BUCKETED_JOIN
