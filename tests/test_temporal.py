"""Sketch + temporal operators (operators/sketch.py, temporal.py): the
invariants beyond the DuckDB oracles — HLL accuracy and merge/partition
invariance, as-of strictly-prior tie semantics vs a brute-force theta
join, range-join candidate soundness at cell boundaries, and the plan
shapes (constant-size shuffle, no Python evals, no nested-loop joins)."""

from pyspark.sql import functions as F

from oa_spider_spark.operators.sketch import (
    HLL_M,
    hll_distinct,
    hll_estimate,
    hll_registers,
)
from oa_spider_spark.operators.temporal import asof_join, range_join_bucketed
from oa_spider_spark.queries_temporal import (
    q_asof_prior_click,
    q_error_window_activity,
    q_hll_distinct,
)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- HLL -------------------------------------------------------------------


def test_hll_estimate_accuracy_and_partition_invariance(spark):
    """Raw HLL at m=256 has ~6.5% standard error; assert within 20%.
    sf0.01 (2000 distinct parts) keeps the test in the raw-HLL regime
    (n >> 2.5m = 640) — below that the documented contract is "use
    exact COUNT(DISTINCT)". The sketch must be bit-identical under
    repartitioning (integer MAX/SUM only) — the property that lets
    per-day sketches merge."""
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    row = hll_distinct(li, "l_partkey").collect()[0]
    exact = li.select("l_partkey").distinct().count()
    est = row["est_milli"] / 1000.0
    assert abs(est - exact) / exact < 0.20, (est, exact)
    again = hll_distinct(li.repartition(17), "l_partkey").collect()[0]
    assert tuple(row) == tuple(again)


def test_hll_merge_equals_whole(spark):
    """Sketching two halves and MAX-merging the registers must equal
    sketching the whole — the incremental/daily-rollup contract."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    a = hll_registers(li.filter(F.col("l_orderkey") % 2 == 0), "l_partkey")
    b = hll_registers(li.filter(F.col("l_orderkey") % 2 == 1), "l_partkey")
    merged = (
        a.unionByName(b).groupBy("register").agg(F.max("rho").alias("rho"))
    )
    whole = hll_registers(li, "l_partkey")
    assert sorted(map(tuple, hll_estimate(merged).collect())) == sorted(
        map(tuple, hll_estimate(whole).collect())
    )


def test_hll_plan_constant_shuffle_no_python(spark):
    """The only data-sized stage is the scan; the shuffle is keyed on
    the 256-value register column and every expression is JVM-side."""
    df = q_hll_distinct(spark, SF_DIR)
    plan = _plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    assert "hashpartitioning(register" in plan, plan
    row = df.collect()[0]
    assert row["regs_seen"] + row["zeros"] == HLL_M


# --- as-of join ------------------------------------------------------------


def test_asof_matches_theta_join_brute_force(spark):
    """Equivalence against the O(n^2) formulation the operator avoids:
    per left row, the max-(ts, id) right row with ts strictly prior."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    errors = ev.filter(F.col("event_type") == "error")
    clicks = ev.filter(F.col("event_type") == "click")
    got = (
        q_asof_prior_click(spark, SF_DIR)
        .select("event_id", "prior_event_id")
        .collect()
    )
    l = errors.alias("l")
    r = clicks.alias("r")
    theta = (
        l.join(
            r,
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") < F.col("l.ts")),
            "left",
        )
        .groupBy(F.col("l.event_id").alias("event_id"))
        .agg(
            F.max(F.struct(F.col("r.ts"), F.col("r.event_id"))).alias("best")
        )
        .select("event_id", F.col("best.event_id").alias("prior_event_id"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, theta))


def test_asof_strictly_prior_at_equal_ts(spark):
    """A right row at the SAME timestamp must not match (strictly-prior
    contract); an earlier one must, picking max id on right-side ties."""
    left = spark.createDataFrame(
        [(1, 100, 10), (2, 200, 11)], "k int, t long, lid int"
    )
    right = spark.createDataFrame(
        [(1, 100, 90, 9.0), (2, 150, 91, 7.0), (2, 150, 92, 8.0)],
        "k int, t long, rid int, v double",
    )
    out = {
        r["lid"]: (r["prior_rid"], r["prior_v"])
        for r in asof_join(
            left, right, key="k", ts_col="t", tiebreak_col="rid",
            carry_cols=["rid", "v"],
        ).collect()
    }
    assert out[10] == (None, None)  # same-ts right excluded
    assert out[11] == (92, 8.0)  # max rid among equal-ts rights


# --- range join ------------------------------------------------------------


def test_range_join_matches_theta_and_boundaries(spark):
    """Grid-bucketed equi-join == inequality join, including intervals
    that straddle a cell boundary and events exactly at start (in) and
    end (out); no double counting from interval replication."""
    events = spark.createDataFrame(
        [(1, 0, 1), (1, 950, 2), (1, 1000, 3), (1, 1949, 4), (1, 1950, 5),
         (2, 975, 6)],
        "k int, t long, eid int",
    )
    intervals = spark.createDataFrame(
        [(1, 950, 1950, 100), (2, 0, 1000, 200)],
        "k int, s long, e long, iid int",
    )
    got = sorted(
        (r["iid"], r["eid"])
        for r in range_join_bucketed(
            events, intervals, key="k", ts_col="t",
            start_col="s", end_col="e", grid_us=1000,
        ).collect()
    )
    # iid 100 covers [950, 1950): eids 2,3,4 (5 is at end, excluded)
    # iid 200 covers [0, 1000) on k=2: eid 6 only
    assert got == [(100, 2), (100, 3), (100, 4), (200, 6)]


def test_range_join_plan_is_hash_join_no_nested_loop(spark):
    df = q_error_window_activity(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    # every interval must have at least its own error event in-window
    n_intervals = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type") == "error")
        .count()
    )
    rows = df.collect()
    assert len(rows) == n_intervals
    assert all(r["n_events"] >= 1 for r in rows)


# --- integer PageRank ------------------------------------------------------


def test_pagerank_hand_computed_and_partition_invariant(spark):
    """Two-node cycle + dangling node, one iteration checked by hand;
    full run must be bit-identical under repartitioning (the integer-
    units property that makes the oracle possible)."""
    from oa_spider_spark.operators.graph import pagerank_integer

    edges = spark.createDataFrame(
        [(0, 1), (1, 0)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    one = {
        r["node"]: r["rank_micro"]
        for r in pagerank_integer(edges, nodes, iterations=1).collect()
    }
    # node 0 and 1 each receive the other's full damped rank:
    # 150000 + (1000000 * 850) div (1000 * 1) = 1000000
    # node 2 is dangling AND unlinked: base only
    assert one == {0: 1000000, 1: 1000000, 2: 150000}

    from oa_spider_spark.queries_temporal import _doc_link_edges

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    e = _doc_link_edges(docs)
    n = docs.select(F.col("doc_id").alias("node"))
    a = sorted(map(tuple, pagerank_integer(e, n, 3).collect()))
    b = sorted(
        map(
            tuple,
            pagerank_integer(e.repartition(13), n.repartition(7), 3).collect(),
        )
    )
    assert a == b


def test_pagerank_mass_and_plan(spark):
    """Total rank stays <= initial mass (floors only shave), every node
    keeps >= the base, and the plan is pure JVM joins/aggregates."""
    from oa_spider_spark.queries_temporal import q_pagerank

    df = q_pagerank(spark, SF_DIR)
    plan = _plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    assert "CartesianProduct" not in plan, plan
    rows = df.collect()
    n = len(rows)
    total = sum(r["rank_micro"] for r in rows)
    assert n == 500
    assert total <= n * 1_000_000
    assert all(r["rank_micro"] >= 150_000 for r in rows)


# --- Count-Min sketch ------------------------------------------------------


def test_cms_upper_bound_and_merge(spark):
    """est >= exact for every probed key; cell-wise SUM of two halves'
    counters equals the whole corpus's counters (mergeability)."""
    from oa_spider_spark.operators.sketch import cms_counters
    from oa_spider_spark.queries_temporal import q_cms_token_freq

    rows = q_cms_token_freq(spark, SF_DIR).collect()
    assert len(rows) == 20
    assert all(r["est"] >= r["exact_cnt"] for r in rows)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    a = cms_counters(toks.filter(F.length("token") % 2 == 0), "token")
    b = cms_counters(toks.filter(F.length("token") % 2 == 1), "token")
    merged = (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    whole = cms_counters(toks, "token")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_plan_constant_shuffle_broadcast_probe(spark):
    from oa_spider_spark.queries_temporal import q_cms_token_freq

    plan = _plan(q_cms_token_freq(spark, SF_DIR))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    assert "BroadcastHashJoin" in plan, plan  # counter cells are broadcast
    assert "CartesianProduct" not in plan, plan


# --- tumbling windows ------------------------------------------------------


def test_tumbling_rates_boundary_and_totals(spark):
    """An event exactly on the hour belongs to the NEXT window (F.window
    is [start, end)); window totals must re-sum to the whole stream."""
    from oa_spider_spark.queries_temporal import q_tumbling_rates

    df = q_tumbling_rates(spark, SF_DIR)
    plan = _plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    rows = df.collect()
    assert all(r["window_start_us"] % 3_600_000_000 == 0 for r in rows)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert sum(r["n"] for r in rows) == ev.count()
    exact = ev.select(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("s")
    ).collect()[0]["s"]
    assert sum(r["sum_value_cents"] for r in rows) == exact


def test_hll_grouped_matches_per_group_runs(spark):
    """Grouped registers must equal running the ungrouped sketch on
    each group's slice — groups never contaminate each other."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_returnflag", "l_orderkey"
    )
    grouped = {
        (r["l_returnflag"], r["register"]): r["rho"]
        for r in hll_registers(
            li, "l_orderkey", group_cols=["l_returnflag"]
        ).collect()
    }
    for flag in [r["l_returnflag"] for r in li.select("l_returnflag").distinct().collect()]:
        solo = {
            (flag, r["register"]): r["rho"]
            for r in hll_registers(
                li.filter(F.col("l_returnflag") == flag), "l_orderkey"
            ).collect()
        }
        assert solo == {k: v for k, v in grouped.items() if k[0] == flag}


# --- int8 embedding quantization -------------------------------------------


def test_quantize_embeddings_bounds_and_plan(spark):
    """|q_i| <= 127 always; dequantization error <= scale/2 + eps per
    element; the plan is pure per-row JVM arithmetic (no shuffle, no
    Python)."""
    from oa_spider_spark.operators.similarity import quantize_embeddings

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = quantize_embeddings(emb)
    plan = _plan(out)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "Exchange"):
        assert marker not in plan, plan
    rows = out.join(emb, "vec_id").collect()
    assert len(rows) > 0
    for r in rows:
        scale = max(abs(x) for x in r["embedding"]) / 127 or 1.0
        assert all(abs(qi) <= 127 for qi in r["q"])
        assert r["q_sum"] == sum(r["q"])
        assert r["q_norm"] == sum(qi * qi for qi in r["q"])
        for x, qi in zip(r["embedding"], r["q"]):
            assert abs(x - qi * scale) <= scale / 2 + 1e-9


def test_scd2_history_intervals(spark):
    """Hand-checked islands: versions number runs of equal state,
    valid_to chains to the next run's valid_from, the open run ends at
    the sentinel, and intervals answer point-in-time lookups."""
    import datetime

    from oa_spider_spark.operators.temporal import scd2_history

    t0 = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    ev = spark.createDataFrame(
        [
            (1, ts(0), 10, "view"),
            (2, ts(5), 10, "view"),
            (3, ts(9), 10, "error"),
            (4, ts(15), 10, "view"),   # back to view: NEW version
            (5, ts(0), 20, "click"),
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    )
    out = {
        (r["user_id"], r["version"]): r
        for r in scd2_history(
            ev, key="user_id", ts_col="ts", tiebreak_col="event_id",
            state_col="event_type",
        ).collect()
    }
    assert len(out) == 4
    assert out[(10, 1)]["event_type"] == "view" and out[(10, 1)]["n_events"] == 2
    assert out[(10, 1)]["valid_to"] == ts(9)
    assert out[(10, 2)]["event_type"] == "error"
    assert out[(10, 2)]["valid_from"] == ts(9) and out[(10, 2)]["valid_to"] == ts(15)
    assert out[(10, 3)]["event_type"] == "view"
    assert out[(10, 3)]["valid_to"].year == 2100  # open-end sentinel
    assert out[(20, 1)]["n_events"] == 1
    # point-in-time: state at minute 10 is 'error'
    probe = ts(10)
    hit = [
        r for r in out.values()
        if r["user_id"] == 10 and r["valid_from"] <= probe < r["valid_to"]
    ]
    assert len(hit) == 1 and hit[0]["event_type"] == "error"


def test_ewma_alarm_jump_and_flat(spark):
    """Flat history -> no alarm; 10x jump -> alarm with the exact
    closed-form deviation; history outside the window is ignored;
    single-round groups report NULL dev and never alarm."""
    from oa_spider_spark.operators.temporal import ewma_alarm

    rows = (
        [("flat", r, 100) for r in range(5)]
        + [("jump", r, 100) for r in range(4)] + [("jump", 4, 1000)]
        # rounds 0-1 carry a huge value but sit outside window=3
        + [("win", 0, 10**6), ("win", 1, 10**6)]
        + [("win", 2, 50), ("win", 3, 50), ("win", 4, 50)]
        + [("solo", 7, 42)]
    )
    df = spark.createDataFrame(rows, "host string, round long, x long")
    out = {
        r["host"]: r
        for r in ewma_alarm(
            df, group_col="host", time_col="round", value_col="x",
            window=3, threshold_milli=500,
        ).collect()
    }
    assert not out["flat"]["alarm"] and out["flat"]["dev_milli"] == 0
    # jump: priors rounds 2,3 (window 3): num=100*1+100*2=300, den=3
    assert out["jump"]["ewma_den"] == 3 and out["jump"]["ewma_num"] == 300
    assert out["jump"]["dev_milli"] == (1000 * abs(1000 * 3 - 300)) // 300
    assert out["jump"]["alarm"]
    # win: the 10^6 rounds fall outside (R-3, R) -> flat at 50
    assert out["win"]["dev_milli"] == 0 and not out["win"]["alarm"]
    assert out["solo"]["dev_milli"] is None and not out["solo"]["alarm"]
