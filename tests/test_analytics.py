"""Analytics queries (queries_analytics.py): the invariants beyond the
DuckDB oracles — exact-integer reproducibility under repartitioning,
plan shapes (broadcast dim, distributed top-k, no Python evals), and a
hand-computed z-score check."""

import math

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from oa_spider_spark.queries_analytics import (
    pricing_summary,
    q_event_outliers,
    q_pricing_summary,
    q_top_revenue,
)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_partition_invariant(spark):
    """Integer-unit sums must be identical under any partitioning —
    the property float sums lack and the whole point of quantizing."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    a = sorted(map(tuple, pricing_summary(li).collect()))
    b = sorted(map(tuple, pricing_summary(li.repartition(17)).collect()))
    assert a == b


def test_top_revenue_broadcasts_dim_and_uses_topk(spark):
    df = q_top_revenue(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    rows = df.collect()
    assert 0 < len(rows) <= 10
    revs = [r["revenue_cp"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_event_outliers_match_hand_computation(spark):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("v")
    )
    rows = e.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["event_id"], r["v"]))
    expect = set()
    for t, vs in by_type.items():
        n = len(vs)
        s1 = sum(v for _, v in vs)
        s2 = sum(v * v for _, v in vs)
        den = math.sqrt(float(n * s2 - s1 * s1))
        for eid, v in vs:
            zm = math.floor(float(n * v - s1) * 1000.0 / den)
            if zm >= 2500 or zm < -2500:
                expect.add((eid, zm))
    got = {
        (r["event_id"], r["z_milli"])
        for r in q_event_outliers(spark, SF_DIR).collect()
    }
    assert got == expect and len(got) > 0


def test_analytics_plans_are_jvm_only(spark):
    for name in ("q_pricing_summary", "q_top_revenue", "q_event_outliers"):
        p = _plan(entry_mod.queries()[name](spark, SF_DIR))
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in p, f"{marker} in {name}"


def test_pricing_summary_pushes_filter_and_prunes_scan(spark):
    df = q_pricing_summary(spark, SF_DIR)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan
    # scan must not read join keys / partkeys it doesn't need
    # (plan toString truncates ReadSchema, so parse the FileScan output list)
    import re

    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    cols = {c.split("#")[0] for c in m.group(1).split(",") if c}
    assert cols == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    }, cols
