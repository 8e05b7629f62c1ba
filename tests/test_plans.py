"""Physical-plan guardrails (SURVEY.md §7 hard-part 3): assert the
optimizations we rely on at 100-TB scale actually appear in the plans —
column pruning reaches the parquet scan, the global crawl order is a
range-partitioned distributed sort (never a single-task window), and the
seen anti-join + hosts join pick the intended strategies."""

import re

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from oa_spider_spark import datagen
from oa_spider_spark.frontier.politeness import global_order_and_limit
from oa_spider_spark.frontier.round import dedup_frontier

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_token_count_prunes_documents_scan(spark):
    """A 2-column projection must not read the whole documents schema."""
    df = entry_mod.queries()["q_token_count"](spark, SF_DIR)
    df.collect()
    plan = plan_of(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"doc_id", "text"}, cols


def test_crawl_select_pushes_nothing_through_python(spark):
    """q_crawl_select is pure JVM — no Python evals anywhere in the plan."""
    df = entry_mod.queries()["q_crawl_select"](spark, SF_DIR)
    plan = plan_of(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "PythonMapInArrow"):
        assert marker not in plan, f"{marker} found in crawl-select plan"


def test_global_order_is_bucketed_not_single_task(spark):
    """The engine's total order must be a distributed bucketed rank —
    never a partition-less Window (single task at 10^10 rows), and never
    a priority-bucket-only rank (only ~100 buckets ⇒ each in-bucket
    window is ~1% of the frontier in ONE task). Every data window must
    partition by the (_b, _s) cell, and cells must be bounded."""
    f = datagen.seed_frontier_df(spark, 2000, n_hosts=6, hot_share=0.4)
    out = global_order_and_limit(f, None, partitions=4)
    out.collect()
    plan = plan_of(out)
    # every data row_number window must carry the 2-level cell spec
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "_b" in line and "_s" in line, f"coarse window: {line}"
    assert "BroadcastHashJoin" in plan, plan  # offsets join must broadcast
    # bounded single-task work: no (priority, created_ms-range) cell may
    # hold a macroscopic share of the rows
    from pyspark.sql import functions as F2

    cells = (
        f.groupBy(
            F2.least(F2.greatest(F2.lit(99) - F2.col("priority"), F2.lit(0)), F2.lit(99)),
            F2.col("created_ms"),
        ).count()
    )
    n_cells = cells.count()
    assert n_cells >= 100  # the second key actually splits the buckets
    cache = getattr(out, "_ordered_cache", None)
    if cache is not None:
        cache.unpersist()


def test_global_order_total_rank_is_correct(spark):
    """fetch_order from the 2-level bucketed rank must equal the rank of
    a plain global sort (the semantics the decomposition must preserve)."""
    f = datagen.seed_frontier_df(spark, 1500, n_hosts=5, hot_share=0.5)
    out = global_order_and_limit(f, None)
    got = [
        r["url_hash"]
        for r in out.orderBy("fetch_order").select("url_hash").collect()
    ]
    from oa_spider_spark.frontier.politeness import order_cols

    want = [r["url_hash"] for r in f.orderBy(*order_cols()).select("url_hash").collect()]
    assert got == want
    orders = [r["fetch_order"] for r in out.orderBy("fetch_order").collect()]
    assert orders == list(range(1, len(want) + 1))
    cache = getattr(out, "_ordered_cache", None)
    if cache is not None:
        cache.unpersist()


def test_dedup_frontier_is_partial_aggregate_not_window(spark):
    """dedup_frontier must compile to hash aggregates (map-side partial
    combine) rather than a sort-based row_number window."""
    f = datagen.seed_frontier_df(spark, 300, n_hosts=5, hot_share=0.3)
    out = dedup_frontier(f)
    out.collect()
    plan = plan_of(out)
    assert "Window" not in plan, plan
    assert "partial_max_by" in plan, plan  # map-side combine before the shuffle


def test_fetch_stage_is_arrow_not_row_python(spark):
    """The fetch stage must be mapInArrow (Arrow record batches), and its
    input must already be salted-repartitioned (round-robin/hash exchange
    ahead of the Python stage)."""
    from oa_spider_spark.frontier.fetch import fetch_stage
    from oa_spider_spark.frontier.politeness import salted_repartition

    f = datagen.seed_frontier_df(spark, 200, n_hosts=4, hot_share=0.4)
    out = fetch_stage(salted_repartition(f, 4), n_hosts=4)
    plan = plan_of(out)
    assert "PythonMapInArrow" in plan or "MapInArrow" in plan, plan
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF in fetch path"


def test_budget_and_order_matches_unfused_pipeline(spark):
    """The fused budget+rank operator (round hot path) must produce the
    exact selection and fetch_order of the reference pipeline
    apply_budget → global_order_and_limit, and its data windows must be
    partitioned by the (host, bucket)/(bucket) cells — the hot host's
    backlog must never be sorted in one task."""
    from oa_spider_spark.frontier.politeness import apply_budget, budget_and_order

    f = datagen.seed_frontier_df(spark, 3000, n_hosts=6, hot_share=0.5).withColumn(
        "budget_per_round", F.lit(None).cast("int")
    )
    for limit in (None, 150):
        fused = budget_and_order(f, 80, limit)
        unfused = global_order_and_limit(apply_budget(f, 80), limit)
        got = [(r["url_hash"], r["fetch_order"]) for r in fused.orderBy("fetch_order").collect()]
        want = [(r["url_hash"], r["fetch_order"]) for r in unfused.orderBy("fetch_order").collect()]
        assert got == want and len(got) > 0
        for df in (fused, unfused):
            cache = getattr(df, "_ordered_cache", None)
            if cache is not None:
                cache.unpersist()

    fused = budget_and_order(f, 80)
    fused.collect()
    plan = plan_of(fused)
    for line in plan.splitlines():
        if "row_number" in line and "windowspecdefinition" in line.lower():
            assert "_b" in line, f"data window not bucket-partitioned: {line}"
    cache = getattr(fused, "_ordered_cache", None)
    if cache is not None:
        cache.unpersist()


def test_attachments_join_is_hash_join_not_nested_loop(spark):
    """J4 child-table equi-join must compile to a hash join (broadcast or
    shuffled) — a nested-loop/cartesian product would be quadratic."""
    df = entry_mod.queries()["q_attachments_join"](spark, SF_DIR)
    df.collect()
    plan = plan_of(df)
    assert "HashJoin" in plan, plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"{bad} in attachments-join plan"


def test_html_parse_is_arrow_and_prunes_scan(spark):
    """The HTML parse stage must be one Arrow hop (never row Python), and
    the documents scan must read only the columns the page synth uses."""
    df = entry_mod.queries()["q_html_parse"](spark, SF_DIR)
    df.collect()
    plan = plan_of(df)
    assert "PythonMapInArrow" in plan or "MapInArrow" in plan, plan
    assert "BatchEvalPython" not in plan, "row-at-a-time Python in parse path"
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"doc_id", "text", "source", "n_chars"}, cols


def test_topk_queries_use_distributed_topk(spark):
    """orderBy().limit(k) must compile to TakeOrderedAndProject
    (per-partition top-k merged on the driver) — never a global sort."""
    for q in ("q_cosine_topk", "q_ivf_ann"):
        df = entry_mod.queries()[q](spark, SF_DIR)
        plan = plan_of(df)
        assert "TakeOrderedAndProject" in plan, f"{q}: {plan[:800]}"


def test_global_order_correct_for_out_of_range_priorities(spark):
    """Code-review r02: the old clamped `_b` let priority 150 share a
    bucket with priority 99, and the created_ms sub-split then interleaved
    them out of order. `_b` is now the exact negated priority — the rank
    must equal a plain full sort for ANY priority domain."""
    base = datagen.seed_frontier_df(spark, 400, n_hosts=4, hot_share=0.3)
    f = base.withColumn(
        "priority",
        F.when(F.col("url_hash") % 7 == 0, F.col("priority") + 120)
        .when(F.col("url_hash") % 7 == 1, F.col("priority") - 150)
        .otherwise(F.col("priority")),
    )
    out = global_order_and_limit(f, None)
    got = [
        r["url_hash"]
        for r in out.orderBy("fetch_order").select("url_hash").collect()
    ]
    from oa_spider_spark.frontier.politeness import order_cols

    want = [r["url_hash"] for r in f.orderBy(*order_cols()).select("url_hash").collect()]
    assert got == want
    cache = getattr(out, "_ordered_cache", None)
    if cache is not None:
        cache.unpersist()
