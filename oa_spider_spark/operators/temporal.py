"""Temporal joins Spark lacks as primitives: as-of join and range join,
both expressed in the shapes that survive 100 TB.

* As-of join ("most recent prior fact") is NOT implemented as an
  inequality join — a theta join over a billion-row event log is a
  broadcast-nested-loop disaster. It is a union + one partitioned
  window: tag both streams, sort each key's timeline once, and carry
  the last right-side value forward with last(ignorenulls). One shuffle
  on the join key, per-key timelines bounded (billions of keys spread
  across tasks), zero Python.

* Range join (events falling inside intervals) is bucketized: intervals
  are exploded onto a coarse time grid sized to the maximum interval
  length, events map to exactly one grid cell, and the join is an
  EQUI-join on (key, cell) followed by the exact containment filter.
  Candidate blow-up is bounded by ceil(len/grid) + 1 cells per interval
  — never a cross product, and Catalyst plans it as a plain hash join.

Reference tie-in: the reference crawler correlates "this fetch happened
while that host was throttled" by driver-side timestamps; these are the
engine-grade versions of that correlation over telemetry tables
(SURVEY §2.12 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    tiebreak_col: str,
    carry_cols: list[str],
) -> DataFrame:
    """Each `left` row + the STRICTLY-prior `right` row's carry columns.

    Semantics: for a left row at time t, match the right row with the
    greatest (ts, tiebreak) such that right.ts < left.ts (ties at the
    exact same timestamp do NOT match — "strictly prior" is the only
    ordering that is deterministic without cross-stream tiebreaks).
    Unmatched left rows keep NULL carries.

    Mechanics: union the streams with a tag that sorts left rows BEFORE
    right rows at equal timestamps (so a left row's window never sees a
    same-ts right), then one `last(ignorenulls)` per carry column over
    rows up to the current one. The window is partitioned by `key` —
    per-key timelines are the bounded unit of work.
    """
    lt = left.withColumn("_tag", F.lit(0))
    rt = right.withColumn("_tag", F.lit(1))
    cols = list(dict.fromkeys([key, ts_col, tiebreak_col, *carry_cols]))
    lefts = lt.select(*left.columns, "_tag")
    rights = rt.select(*[c for c in cols if c in right.columns], "_tag")
    # align schemas: left-only columns null on right rows and vice versa
    for c in lefts.columns:
        if c not in rights.columns:
            rights = rights.withColumn(c, F.lit(None))
    for c in rights.columns:
        if c not in lefts.columns:
            lefts = lefts.withColumn(c, F.lit(None))
    rights = rights.select(*lefts.columns)
    both = lefts.unionByName(rights)

    # right-sourced shadow of each carry column, null on left rows
    shadows = {c: f"_r_{c}" for c in carry_cols}
    for c, s in shadows.items():
        both = both.withColumn(
            s, F.when(F.col("_tag") == 1, F.col(c)).otherwise(F.lit(None))
        )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("_tag").asc(), F.col(tiebreak_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        "*",
        *[
            F.last(F.col(s), ignorenulls=True).over(w).alias(f"prior_{c}")
            for c, s in shadows.items()
        ],
    )
    return carried.filter(F.col("_tag") == 0).drop(
        "_tag", *shadows.values(), *[c for c in carry_cols if c not in left.columns]
    )


def range_join_bucketed(
    events: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    grid_us: int,
) -> DataFrame:
    """Equi-join realization of `events JOIN intervals ON same key AND
    start <= ts < end` — timestamps and bounds as epoch-microsecond
    longs (the repo's integer-time discipline).

    `grid_us` must be >= the longest interval: each interval then spans
    at most 2 grid cells, so the candidate set is at most 2x the true
    match set regardless of data volume. The exact half-open containment
    filter runs after the hash join; no row is double-counted because an
    event's single cell matches each interval replica at most once
    (replicas of one interval sit in DIFFERENT cells).
    """
    g = int(grid_us)
    ev = events.withColumn("_cell", F.expr(f"`{ts_col}` div {g}"))
    iv = intervals.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                F.expr(f"`{start_col}` div {g}"),
                # end is exclusive: the last covered cell is (end-1)'s
                F.expr(f"(`{end_col}` - 1) div {g}"),
            )
        ),
    )
    joined = ev.join(iv, [key, "_cell"]).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_cell")


def scd2_history(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak_col: str,
    state_col: str,
    end_sentinel: str = "2100-01-01 00:00:00",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history: collapse an event
    stream into per-key STATE INTERVALS — one row per run of equal
    `state_col`, with version number, [valid_from, valid_to) bounds and
    the run's event count. The warehouse-standard way to ask "what was
    this entity's state at time T" with a plain BETWEEN instead of a
    per-lookup as-of scan.

    Gaps-and-islands over one per-key window (island id = running count
    of state CHANGES), then a groupBy — two shuffles on the same
    high-cardinality key, no Python. The open interval's end is a fixed
    sentinel (not NULL) so results are hashable and BETWEEN-friendly.
    Deterministic for any tie layout via the (ts, tiebreak) total order.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak_col)
    chg = (
        F.lag(state_col).over(w).isNull()
        | (F.lag(state_col).over(w) != F.col(state_col))
    ).cast("int")
    isl = df.withColumn(
        "_version",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        isl.groupBy(key, "_version")
        .agg(
            # state is constant within an island by construction, so a
            # plain min is exact (and DuckDB-mirrorable — its min_by has
            # no struct-key overload)
            F.min(state_col).alias(state_col),
            F.min(ts_col).alias("valid_from"),
            F.count("*").alias("n_events"),
        )
        .withColumn(
            "valid_to",
            F.coalesce(
                F.lead("valid_from").over(Window.partitionBy(key).orderBy("_version")),
                F.lit(end_sentinel).cast("timestamp"),
            ),
        )
        .select(
            key,
            F.col("_version").cast("long").alias("version"),
            state_col,
            "valid_from",
            "valid_to",
            "n_events",
        )
    )


def merge_upsert(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    version_col: str,
) -> DataFrame:
    """SCD1 MERGE: newest version per key wins; a version TIE goes to
    the delta (the incoming batch is authoritative — the same rule
    `MERGE INTO ... WHEN MATCHED THEN UPDATE` implements). Keys only in
    one side pass through. base and delta must share a schema.

    Formulated as union → keyed dedup window (rank over
    (version DESC, src DESC), keep rank 1) rather than a full-outer
    join: ONE shuffle on the key either way, but the union form also
    dedups multi-row deltas (several updates for one key in a batch)
    in the same pass, which the join form silently multiplies. The
    window is keyed — per-key groups are update-history-sized, never a
    partition-less sort. (key, version, side) must be unique: two delta
    rows for one key at the SAME version have no defined winner. At 10^10 rows this is the standard lakehouse
    upsert shape: shuffle both sides by key once, write back bucketed
    (tables.py SCALE_LAYOUT keeps the bucketing so the NEXT merge's
    shuffle is exchange-free on the base side).
    """
    cols = base.columns
    if delta.columns != cols:
        raise ValueError(f"schema mismatch: {delta.columns} vs {cols}")
    tagged = base.select(*cols, F.lit(0).alias("_src")).unionByName(
        delta.select(*cols, F.lit(1).alias("_src"))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("_src").desc()
    )
    return (
        tagged.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(*cols, (F.col("_src") == 1).alias("from_delta"))
    )


def ewma_alarm(
    series: DataFrame,
    group_col: str = "host",
    time_col: str = "round",
    value_col: str = "latency_ms",
    window: int = 8,
    threshold_milli: int = 500,
) -> DataFrame:
    """Per-group EWMA residual alarm over a (group, time, value)
    series — "did this host's latency/error-rate/fetch-time jump
    relative to ITS OWN recent history?" — the per-entity control
    chart that complements X106's distribution drift (L1 between
    consecutive rounds) with a longer exponentially-weighted memory.

    Exactness: per-step floored EWMA recursion is order-dependent and
    never reproduces across engines, so this uses the CLOSED FORM with
    power-of-two decay — prior rounds r in (R-window, R) weigh
    2^(r-lo): ewma = Σ x_r·2^(r-lo) / Σ 2^(r-lo), both sums exact
    BIGINTs (exponents are window-bounded ≤ 62 by construction, not by
    data), and the deviation is one floor division:
    dev_milli = 1000·|x_R·D − N| div N. No float enters anywhere.

    Scale shape: the caller hands a per-(group, time) series (already
    aggregated — entities × rounds, metadata-scale next to the event
    log); this adds one (group) max-aggregate broadcast back onto the
    series and one conditional sum — no window function, no self-join
    at event scale. Groups with no prior history inside the window
    report dev_milli NULL and never alarm.

    Output: (group, time=R, value=x_R, ewma_num, ewma_den, dev_milli,
    alarm)."""
    g, t, v = group_col, time_col, value_col
    latest = series.groupBy(g).agg(F.max(t).alias("_R"))
    # SQL shiftleft takes column args (the F.shiftleft wrapper wants a
    # Python int for numBits); exponent 0..window-2 for prior rounds
    j = series.join(F.broadcast(latest), g).withColumn(
        "_w",
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST({t} - (_R - {window}) - 1 AS INT))"
        ),
    )
    is_prior = (F.col(t) < F.col("_R")) & (F.col(t) > F.col("_R") - window)
    w = F.col("_w")
    agg = j.groupBy(g).agg(
        F.max("_R").alias(t),
        F.sum(F.when(F.col(t) == F.col("_R"), F.col(v)).otherwise(0)).alias(
            "_xR"
        ),
        F.sum(F.when(is_prior, F.col(v) * w).otherwise(0)).alias("ewma_num"),
        F.sum(F.when(is_prior, w).otherwise(0)).alias("ewma_den"),
    )
    # num = 0 (flat-zero history) would divide by zero under ANSI:
    # a zero current value is a perfect match (dev 0), a nonzero one
    # is an infinite relative jump — saturate at 10^6 milli.
    dev = F.expr(
        "CASE WHEN ewma_den = 0 THEN NULL "
        "WHEN ewma_num = 0 AND _xR = 0 THEN 0 "
        "WHEN ewma_num = 0 THEN 1000000 "
        "ELSE 1000 * abs(_xR * ewma_den - ewma_num) div ewma_num END"
    )
    return agg.select(
        g,
        t,
        F.col("_xR").alias("value"),
        "ewma_num",
        "ewma_den",
        dev.alias("dev_milli"),
        F.coalesce(dev > threshold_milli, F.lit(False)).alias("alarm"),
    )
