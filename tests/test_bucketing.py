"""Bucketed-table co-located join: the storage-level strategy that
removes the join shuffle entirely (SURVEY scale notes — at 100 TB the
fact tables are written bucketed on their join keys ONCE, and every
downstream join on those keys reads co-located buckets instead of
re-shuffling terabytes per query).

The tables live at an explicit tmpfs LOCATION (no warehouse dir is
polluted; the in-memory catalog entry is dropped at the end)."""

import os
import shutil
import uuid

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
STAGE = os.environ.get("SPARK_GRAFT_STAGE_DIR", "/dev/shm")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_elides_exchange(spark):
    """documents joined to itself on doc_id: the plain parquet read
    shuffles both sides; the bucketed table joins with ZERO Exchange
    nodes — and identical rows."""
    name = f"docs_bucketed_{uuid.uuid4().hex[:8]}"
    loc = f"{STAGE}/{name}"
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    try:
        docs.createOrReplaceTempView("_docs_src")
        spark.sql(
            f"CREATE TABLE {name} USING PARQUET "
            f"CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO 8 BUCKETS "
            f"LOCATION '{loc}' "
            f"AS SELECT doc_id, lang, n_chars FROM _docs_src"
        )
        t = spark.table(name)
        # merge hint pins SortMergeJoin: at test scale the tiny table
        # would auto-broadcast and the planner would skip bucketed
        # reads entirely (at 100 TB neither side is broadcastable —
        # the hint recreates the real shape)
        joined = (
            t.alias("a").hint("merge").join(t.alias("b"), "doc_id").select(
                "doc_id", F.col("a.lang"), F.col("b.n_chars")
            )
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # the same merge join over plain parquet must shuffle both sides
        plain = (
            docs.alias("a").hint("merge").join(docs.alias("b"), "doc_id")
            .select("doc_id", F.col("a.lang"), F.col("b.n_chars"))
        )
        assert "Exchange hashpartitioning" in _plan(plain), _plan(plain)
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
        # bucket pruning: a point filter on the bucket column reads
        # 1 of 8 buckets (SelectedBucketsCount in the scan).
        # autoBucketedScan must be off for a scan-only plan — by default
        # the planner keeps the bucketed layout only when it saves an
        # exchange, which a bare filter does not.
        auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        prev = spark.conf.get(auto)
        try:
            spark.conf.set(auto, "false")
            pruned = _plan(t.filter(F.col("doc_id") == 42))
            assert "SelectedBucketsCount: 1 out of 8" in pruned, pruned
        finally:
            spark.conf.set(auto, prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(loc, ignore_errors=True)
