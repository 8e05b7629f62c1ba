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


def test_bm25_matches_hand_computation(spark):
    """Pure-Python mirror of the rational-idf BM25 (CPython doubles are
    the same IEEE ops) over sf0.001 — validates tokenization, stats, and
    the micro-unit flooring end-to-end."""
    import re

    from oa_spider_spark.queries_analytics import BM25_TERMS, BM25_TOPK, q_bm25_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    toks = {
        r["doc_id"]: [w for w in re.split(r"[^a-z0-9]+", r["text"].lower()) if w]
        for r in docs
    }
    n_docs = len(toks)
    sum_dl = sum(len(t) for t in toks.values())
    avgdl = float(sum_dl) / float(n_docs)
    dfs = [sum(1 for t in toks.values() if term in t) for term in BM25_TERMS]
    scored = []
    for doc_id, t in toks.items():
        dl = len(t)
        score = 0
        n_terms = 0
        for term, df in zip(BM25_TERMS, dfs):
            tf = sum(1 for w in t if w == term)
            if tf == 0:
                continue
            n_terms += 1
            idf = (float(n_docs - df) + 0.5) / (float(df) + 0.5)
            denom = float(tf) + 1.2 * (1.0 - 0.75 + 0.75 * (float(dl) / avgdl))
            score += math.floor(idf * (float(tf) * 2.2) / denom * 1000000.0)
        if score > 0:
            scored.append((-score, doc_id, n_terms))
    scored.sort()
    expect = [(d, -s, n) for s, d, n in scored[:BM25_TOPK]]
    got = [
        (r["doc_id"], r["score_micro"], r["n_terms"])
        for r in q_bm25_topk(spark, SF_DIR).collect()
    ]
    assert got == expect


def test_bm25_plan_topk_and_jvm_only(spark):
    from oa_spider_spark.queries_analytics import q_bm25_topk

    plan = _plan(q_bm25_topk(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan


def test_percentiles_match_bruteforce(spark):
    """Nearest-rank ground truth from the sorted raw values — catches
    both histogram math and rank arithmetic mistakes."""
    from oa_spider_spark.queries_analytics import q_value_percentiles

    e = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("v")
    )
    by_type = {}
    for r in e.collect():
        by_type.setdefault(r["event_type"], []).append(r["v"])
    expect = {}
    for t, vs in by_type.items():
        vs.sort()
        n = len(vs)
        expect[t] = (
            n,
            vs[(n - 1) * 500 // 1000],
            vs[(n - 1) * 950 // 1000],
            vs[(n - 1) * 990 // 1000],
        )
    got = {
        r["event_type"]: (r["n"], r["p500"], r["p950"], r["p990"])
        for r in q_value_percentiles(spark, SF_DIR).collect()
    }
    assert got == expect and len(got) >= 3


def test_percentiles_window_is_over_histogram_not_stream(spark):
    """The Window must consume the aggregated histogram (guardrail: a
    window partitioned by a ~5-value key over the RAW stream would
    funnel entire types into single tasks at scale)."""
    from oa_spider_spark.queries_analytics import q_value_percentiles

    df = q_value_percentiles(spark, SF_DIR)
    plan = _plan(df)
    assert "Window" in plan
    # aggregate (histogram) must appear below the window in the tree
    win_idx = plan.index("Window")
    assert "HashAggregate" in plan[win_idx:], plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan


def test_salted_join_equals_plain_join_and_spreads_key(spark):
    from oa_spider_spark.operators.pipeline import salted_join
    from oa_spider_spark.queries_analytics import q_salted_lang_join

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dim = docs.groupBy("lang").agg(F.count("*").alias("lang_docs"))
    got = q_salted_lang_join(spark, SF_DIR)
    plain = docs.join(dim, "lang").select("doc_id", "lang", "lang_docs")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
    # plan: shuffle keyed by (lang, _salt) — the hot key is spread — and
    # NO broadcast of the dim (the hint must hold)
    plan = _plan(salted_join(docs, dim, key="lang", row_key="doc_id"))
    assert "_salt" in plan and "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    # the salt genuinely fans one lang over multiple salts
    n_salts = (
        docs.filter(F.col("lang") == docs.select("lang").first()["lang"])
        .select(F.pmod(F.xxhash64("doc_id"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert n_salts >= 6


def test_nation_revenue_broadcasts_dims_no_cartesian(spark):
    """Q5-twin plan: the tiny dim chain (region->nation, supplier) is
    broadcast, nothing degenerates to a cartesian/nested-loop, and no
    Python evals appear. Revenue is integer cent-percent units."""
    from oa_spider_spark.queries_analytics import q_nation_revenue

    df = q_nation_revenue(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    rows = df.collect()
    assert 0 < len(rows) <= 25  # at most one row per nation
    assert all(r["revenue_cent_pct"] > 0 for r in rows)
    # ordering contract: descending revenue, name-asc ties
    revs = [r["revenue_cent_pct"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_mad_outliers_match_hand_computation(spark):
    """X87: median/MAD fence vs a brute-force nearest-rank recompute,
    including the zero-MAD edge (a >50%-constant group flags every row
    that differs at all) and repartition invariance."""
    from oa_spider_spark.operators.pipeline import mad_outliers

    data = [
        # group a: median 10, MAD 2; 1000*|v-10| > 3000*2 <=> dev > 6
        ("a", 4), ("a", 8), ("a", 10), ("a", 12), ("a", 30),
        # group b: zero MAD (3 of 5 identical) -> the two 9s are outliers
        ("b", 7), ("b", 7), ("b", 7), ("b", 9), ("b", 9),
    ]
    df = spark.createDataFrame(data, ["k", "v"])

    def brute(vals):
        n = len(vals)
        sv = sorted(vals)
        med = sv[(n - 1) * 500 // 1000]
        devs = sorted(abs(v - med) for v in vals)
        mad = devs[(n - 1) * 500 // 1000]
        n_out = sum(1 for v in vals if 1000 * abs(v - med) > 3000 * mad)
        return (n, med, mad, n_out)

    expect = {
        k: brute([v for kk, v in data if kk == k]) for k in ("a", "b")
    }
    for parts in (1, 7):
        got = {
            r["k"]: (r["n"], r["med"], r["mad"], r["n_outliers"])
            for r in mad_outliers(df.repartition(parts), "k", "v").collect()
        }
        assert got == expect
    assert expect["b"][2] == 0 and expect["b"][3] == 2  # zero-MAD edge hit


def test_temperature_targets_exact_allocation(spark):
    """X89: alpha=1/2 temperature resampling — isqrt weights are exact
    integers, targets sum to the budget EXACTLY (largest-remainder),
    and the allocation flattens the distribution (low-resource share
    rises, high-resource share falls) without inverting the order."""
    import math

    from oa_spider_spark.operators.pipeline import temperature_targets

    counts = {"en": 900, "zh": 400, "de": 100, "yo": 9, "kl": 1}
    data = [(f"{lang}{i}", lang) for lang, n in counts.items() for i in range(n)]
    df = spark.createDataFrame(data, ["doc_id", "lang"])
    total = 1409
    rows = {
        r["lang"]: r
        for r in temperature_targets(df, "lang", total=total).collect()
    }

    assert {k: r["n_docs"] for k, r in rows.items()} == counts
    # exact integer sqrt of n*1e6 (perfect squares here: isqrt is exact)
    for lang, n in counts.items():
        assert rows[lang]["weight"] == math.isqrt(n * 1_000_000)
    # budget met exactly, every group funded
    assert sum(r["target_docs"] for r in rows.values()) == total
    assert all(r["target_docs"] >= 1 for r in rows.values())
    # flattening: sampled share vs corpus share rises for small langs
    n_tot = sum(counts.values())
    share = lambda k: rows[k]["target_docs"] / total  # noqa: E731
    corp = lambda k: counts[k] / n_tot  # noqa: E731
    assert share("kl") > corp("kl") and share("yo") > corp("yo")
    assert share("en") < corp("en")
    # order preserved: more docs never means a smaller target
    ordered = sorted(counts, key=counts.get)
    tg = [rows[k]["target_docs"] for k in ordered]
    assert tg == sorted(tg)


def test_stats_ledger_merge_equals_recompute(spark):
    """Folding per-partial moments equals one-pass moments exactly —
    any grouping into partials gives identical (n, sum, sumsq, min,
    max)."""
    from oa_spider_spark.operators.sketch import stats_ledger

    vals = [(i % 3, i % 7, (i * 37) % 101 - 50) for i in range(500)]
    df = spark.createDataFrame(vals, "g int, part int, cents long")
    out = {
        r["g"]: r
        for r in stats_ledger(
            df, group_cols=["g"], partial_cols=["part"], value_col="cents"
        ).collect()
    }
    for g in range(3):
        xs = [c for gg, _p, c in vals if gg == g]
        r = out[g]
        assert r["n"] == len(xs)
        assert r["sum_units"] == sum(xs)
        assert r["sumsq_units"] == sum(x * x for x in xs)
        assert r["min_units"] == min(xs) and r["max_units"] == max(xs)
