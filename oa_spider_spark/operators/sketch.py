"""Distinct-count sketching (HyperLogLog) as pure column expressions.

Counting distinct keys over a 100-TB table with `COUNT(DISTINCT x)` is a
full shuffle of every distinct key; the reference-scale alternative is a
sketch whose shuffle payload is CONSTANT (here: at most `m` register
rows, m = 256). This module implements HyperLogLog with the repo's exact
numeric discipline so the full pipeline — hash, register split, rank,
merge, estimate — carries a value-level DuckDB oracle:

* Hash is the portable md5h60 (first 15 md5 hex chars as a 60-bit long,
  `operators/dedup.py:26`) — bit-identical cross-engine. xxhash64 would
  be the scale default but is not reproducible in DuckDB.
* Register index = top 8 bits of the hash; rank rho = position of the
  highest set bit in the remaining 52 bits, computed as
  `53 - length(bin(low))` — `bin()` exists with identical no-leading-
  zeros semantics in both engines, and stays in JVM codegen on Spark.
* The harmonic sum is kept in EXACT integer form: each register
  contributes `1 << (53 - rho)` (a bigint left-shift, never a float
  power), so `z_scaled = sum(...)` is bit-identical under any
  partitioning/AQE re-plan. Max value: 256 * 2^53 < 2^62 — no overflow.
* The estimate alpha_m * m^2 / Z is produced in integer milli-units as
  floor(NUM / double(z_scaled)) where NUM is ONE pre-computed double
  literal (alpha_256 * m^2 pre-quantized to the integer 47073 =
  floor(0.7213 / (1 + 1.079/256) * 65536), times 1000 * 2^53, embedded
  via repr(float) — the same generated-literal trick the IVF/LSH
  oracles use). A single fixed-shape IEEE divide of two identically-
  rounded doubles is bit-deterministic cross-engine; what is NOT is
  decimal division (Spark rounds HALF_UP at result scale, DuckDB
  floors) and distributed float SUMS (order-dependent) — both avoided.
  The 47073 quantization costs < 3e-6 relative error, far below HLL's
  own ~6.5% (1.04/sqrt(256)) standard error. No small-range (linear
  counting) correction: that needs ln(), which is not cross-engine
  bit-stable — callers in the small regime should use exact
  COUNT(DISTINCT), which is cheap exactly when the regime is small.

Scale notes (100 TB): the per-row work is hash + two bit ops + a string
length, all whole-stage-codegen; the only shuffle is the 256-key
register groupBy with map-side combine (each scan task emits <= 256
rows no matter how many billions it scanned); the estimate is a single
second-stage aggregate over <= 256 rows. Sketches for different
partitions/days merge by the same MAX — the operator is re-runnable
incrementally.

Reference tie-in: the reference crawler has no sketching (it counts
small sets exactly); this is part of the §2.12 training-pipeline
family — corpus cardinality (distinct URLs, tokens, shingles) at scales
where exact distinct is a multi-TB shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5h60

HLL_P = 8  # 2^8 = 256 registers
HLL_M = 1 << HLL_P
_LOW_BITS = 60 - HLL_P  # md5h60 is 60 bits wide
# round(0.7213 / (1 + 1.079 / 256) * 256^2): alpha_m * m^2 in integer form
# (the exact value is 47072.57…; floor would be 47072 — both sides of the
# oracle share HLL_EST_NUM so the choice only shifts estimates by ~2e-5,
# far below HLL's 6.5% error at m=256)
_ALPHA_M2 = 47073
# nearest double to alpha_m * m^2 * 1000 * 2^53 — the est_milli numerator
HLL_EST_NUM = float(_ALPHA_M2 * 1000 * (1 << (60 - HLL_P + 1)))


def hll_registers(
    df: DataFrame, key: F.Column | str, group_cols: list[str] | None = None
) -> DataFrame:
    """(*group_cols, register, rho) rows — the merged sketch, at most
    HLL_M rows per group (the `GROUP BY approx_count_distinct` shape:
    shuffle volume is groups × 256 no matter how many rows scanned).

    `rho` is the classic HLL rank: 1 + leading zeros of the low 52 hash
    bits, i.e. `53 - bit_length(low)`, and 53 when the low bits are all
    zero. Unseen registers are absent (rho 0 by convention) — the
    estimator accounts for them.
    """
    g = list(group_cols or [])
    h = md5h60(F.col(key).cast("string") if isinstance(key, str) else key)
    low = h.bitwiseAND(F.lit((1 << _LOW_BITS) - 1))
    rho = F.when(low == 0, F.lit(_LOW_BITS + 1)).otherwise(
        F.lit(_LOW_BITS + 1) - F.length(F.bin(low))
    )
    return (
        df.select(
            *g,
            F.shiftrightunsigned(h, _LOW_BITS).cast("int").alias("register"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*g, "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Distinct-count estimate from a register sketch — one row total,
    or one per group when `group_cols` is given.

    Returns (*group_cols, regs_seen, zeros, z_scaled, est_milli):
    `z_scaled` is the harmonic denominator scaled by 2^53 in exact
    bigint (absent registers contribute a full 2^53 each), `est_milli`
    the raw HLL estimate in milli-units:
    floor(HLL_EST_NUM / double(z_scaled)) — one fixed-shape IEEE
    divide, reproducible anywhere.
    """
    g = list(group_cols or [])
    k = _LOW_BITS + 1
    aggs = [
        F.count("*").cast("long").alias("regs_seen"),
        (F.lit(HLL_M) - F.count("*")).cast("long").alias("zeros"),
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {k} - rho)"))
            + (F.lit(HLL_M).cast("long") - F.count("*"))
            * F.lit(1 << k).cast("long")
        )
        .cast("long")
        .alias("z_scaled"),
    ]
    agged = registers.groupBy(*g).agg(*aggs) if g else registers.agg(*aggs)
    return agged.select(
        *g,
        "regs_seen",
        "zeros",
        "z_scaled",
        F.floor(F.lit(HLL_EST_NUM) / F.col("z_scaled").cast("double"))
        .cast("long")
        .alias("est_milli"),
    )


def hll_distinct(df: DataFrame, key: F.Column | str) -> DataFrame:
    """End-to-end: sketch + estimate in one plan (two tiny aggregates)."""
    return hll_estimate(hll_registers(df, key))


# --- Count-Min frequency sketch -------------------------------------------
#
# Same design rules as HLL: the counter matrix is d rows × w buckets of
# plain integer SUMS — order-free, so the sketch is bit-deterministic
# under any partitioning and two sketches merge by cell-wise addition.
# Shuffle volume is bounded by d*w cells per scan task (map-side
# combine), never by the number of distinct items. The classic
# "conservative update" variant is deliberately NOT used: it is
# stream-order-dependent and cannot carry a value oracle or merge.
# Estimates are upper bounds: est(x) = min over rows of cell(row, h_row(x))
# >= true count, with the standard (e/w, 1-e^-d) overcount guarantee.

CMS_D = 4
CMS_W = 1024


def cms_counters(df: DataFrame, key: F.Column | str) -> DataFrame:
    """(row, bucket, cnt) — the d×w counter matrix, at most CMS_D*CMS_W
    rows. Hashes are portable md5h60(key || '#cms' || row)."""
    k = (F.col(key) if isinstance(key, str) else key).cast("string")
    return (
        df.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(r).alias("row"),
                        (md5h60(F.concat(k, F.lit(f"#cms{r}"))) % CMS_W)
                        .cast("int")
                        .alias("bucket"),
                    )
                    for r in range(CMS_D)
                ])
            ).alias("rb")
        )
        .groupBy("rb.row", "rb.bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_lookup(counters: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point-query the sketch for each row of `keys`: adds `est` =
    min over the d rows of the key's cell (missing cell ⇒ 0 — only
    possible for keys never counted). The counter matrix is at most
    d*w rows, so it is the broadcast side of the probe join."""
    probes = keys.select(
        *keys.columns,
        *[
            (
                md5h60(
                    F.concat(F.col(key_col).cast("string"), F.lit(f"#cms{r}"))
                )
                % CMS_W
            )
            .cast("int")
            .alias(f"_b{r}")
            for r in range(CMS_D)
        ],
    )
    out = probes
    for r in range(CMS_D):
        c = counters.filter(F.col("row") == r).select(
            F.col("bucket").alias(f"_b{r}"), F.col("cnt").alias(f"_c{r}")
        )
        out = out.join(F.broadcast(c), f"_b{r}", "left")
    est = F.least(*[F.coalesce(F.col(f"_c{r}"), F.lit(0)) for r in range(CMS_D)])
    return out.select(
        *keys.columns, est.cast("long").alias("est")
    )


# --- KMV (k-minimum-values) distinct sketch + set algebra ------------------
#
# HLL above answers "how many distinct?"; it cannot answer "how many
# distinct IN COMMON?" — HLL intersections via inclusion-exclusion blow
# up the relative error when the overlap is small. KMV (Beyer et al.,
# "On Synopses for Distinct-Value Estimation Under Multiset Operations",
# SIGMOD 2007) keeps the k smallest distinct hash values; two sketches
# union by merging min-sets, and the Jaccard of the merged sketch
# estimates the true overlap — the standard primitive for audience/
# corpus-overlap questions (how many training docs does corpus B add
# over corpus A?).
#
# Numeric discipline mirrors HLL's: portable md5h60 hashes (exact
# cross-engine), all set logic on exact BIGINTs, the one unavoidable
# float step ((K-1)·2^60 / kth_min) expressed with identical literal
# shape on both sides, floored to integer milli-units; the intersection
# estimate is then PURE integer arithmetic (rho · union_milli div K).
#
# Scale notes: the sketch is ≤ k rows. Building it as written costs one
# distinct-shuffle of the keyspace (map-side partial dedup) feeding a
# TakeOrderedAndProject (per-partition heaps of k, no global sort); a
# production deployment builds each corpus's sketch ONCE, persists those
# k rows, and answers every later set question from the stored sketches
# — the same persist-the-index pattern as build_corpus_index and the
# Bloom seen-index.

KMV_K = 256
# 2^60 as a Python float → DoubleType literal. NB: a fractional literal
# inside F.expr / SQL text is DECIMAL in both Spark and DuckDB — the SQL
# oracle must write 1152921504606846976.0::DOUBLE to match this shape.
_KMV_SCALE = float(1 << 60)


def kmv_sketch(df: DataFrame, key, k: int = KMV_K, salt: str = "kmv") -> DataFrame:
    """k smallest DISTINCT 60-bit hashes of `key`: DataFrame[h long],
    ≤ k rows. Deterministic, mergeable (union = min-k of concatenation)."""
    key = F.col(key) if isinstance(key, str) else key
    h = md5h60(F.concat(F.lit(f"{salt}:"), key.cast("string")))
    return df.select(h.alias("h")).distinct().orderBy("h").limit(k)


def _kmv_est_milli(n_col, max_col, k: int):
    """floor(1000 × estimate): (K-1)·1000·2^60 / kth_min when the sketch
    is full, else exactly 1000·n (a partial sketch saw every value).
    The multiply/divide is one fixed-shape IEEE double expression —
    bit-identical cross-engine given identical inputs."""
    full = F.floor(
        (n_col.cast("double") - F.lit(1.0))
        * F.lit(1000.0)
        * F.lit(_KMV_SCALE)
        / max_col.cast("double")
    )
    return F.when(n_col >= k, full).otherwise(n_col * 1000).cast("long")


def kmv_set_overlap(
    a: DataFrame, key_a, b: DataFrame, key_b, k: int = KMV_K, salt: str = "kmv"
) -> DataFrame:
    """One-row DataFrame of distinct-cardinality estimates (in integer
    milli-units) for A, B, A∪B and A∩B from their KMV sketches:

      (n_a, n_b, kk, rho, a_est_milli, b_est_milli,
       union_est_milli, inter_est_milli)

    union: min-k of the merged sketches; intersection: Jaccard of the
    merged sketch (rho = merged values present in BOTH sketches) times
    the union estimate — integer arithmetic end-to-end.
    """
    sa, sb = kmv_sketch(a, key_a, k, salt), kmv_sketch(b, key_b, k, salt)
    merged = sa.union(sb).distinct().orderBy("h").limit(k)
    stats_a = sa.agg(
        F.count("*").alias("n_a"), F.max("h").alias("max_a")
    )
    stats_b = sb.agg(F.count("*").alias("n_b"), F.max("h").alias("max_b"))
    stats_u = merged.agg(F.count("*").alias("kk"), F.max("h").alias("max_u"))
    rho_df = (
        merged.join(sa, "h", "left_semi")
        .join(sb, "h", "left_semi")
        .agg(F.count("*").alias("rho"))
    )
    row = stats_a.crossJoin(stats_b).crossJoin(stats_u).crossJoin(rho_df)
    row = row.select(
        "n_a", "n_b", "kk", "rho",
        _kmv_est_milli(F.col("n_a"), F.col("max_a"), k).alias("a_est_milli"),
        _kmv_est_milli(F.col("n_b"), F.col("max_b"), k).alias("b_est_milli"),
        _kmv_est_milli(F.col("kk"), F.col("max_u"), k).alias("union_est_milli"),
    )
    # Jaccard(merged) × union estimate, all-integer: rho·union_milli is
    # ≤ 256 × ~10^10 « 2^63; `div` truncates like DuckDB's `//` for the
    # non-negative values here. greatest(kk,1) only guards the
    # both-inputs-empty corner (ANSI mode turns /0 into an error).
    return row.withColumn(
        "inter_est_milli",
        F.expr("(rho * union_est_milli) div greatest(kk, 1)").cast("long"),
    )


# --- X75: mergeable fixed-width histogram quantiles -----------------------

def histogram_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, width: int = 64
) -> DataFrame:
    """Fixed-width histogram sketch of a non-negative integer column:
    one row per (group, bucket) with bucket = value div width. The
    sketch MERGES by plain count-sum — across partitions, across
    files, across crawl rounds (union two sketches and re-aggregate;
    pinned in tests) — which is what makes it the scale path for
    percentiles: exact per-group percentiles sort every row of every
    group (operators/pipeline.py::exact_percentiles, the small-group
    tool), while this shuffles at most value_range/width rows per
    group no matter how many billions were scanned, with map-side
    combine doing the heavy lifting scan-side. Bucket math is integer
    `div` — bit-identical in DuckDB (`//`) — so the whole sketch +
    quantile pipeline carries a value oracle."""
    b = df.select(
        *group_cols,
        F.expr(f"cast({value_col} as bigint) div {int(width)}").alias("bucket"),
    )
    return b.groupBy(*group_cols, "bucket").agg(F.count("*").alias("cnt"))


def histogram_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    permilles: tuple[int, ...] = (500, 950, 990),
    width: int = 64,
) -> DataFrame:
    """Per-group quantiles from a histogram sketch: for each permille p,
    the estimate is the INCLUSIVE UPPER BOUND of the first bucket whose
    cumulative count reaches ceil(p·n/1000) — i.e. the true quantile is
    guaranteed <= estimate < true + width. ceil is the pure-integer
    (p·n + 999) div 1000; the cumulative sum is a keyed window over the
    per-group bucket list (sketch-sized, never the raw data). Output:
    one row per (group, permille) with n and estimate."""
    gw = Window.partitionBy(*group_cols)
    cw = gw.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        *group_cols,
        "bucket",
        F.sum("cnt").over(cw).alias("cum"),
        F.sum("cnt").over(gw).alias("n"),
    )
    perm = cum.select(
        *group_cols,
        "bucket",
        "cum",
        "n",
        F.explode(F.array(*[F.lit(p) for p in permilles])).alias("permille"),
    ).withColumn("target", F.expr("(permille * n + 999) div 1000"))
    hit = perm.groupBy(*group_cols, "permille").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cum") >= F.col("target"), F.col("bucket"))).alias(
            "_b"
        ),
    )
    return hit.select(
        *group_cols,
        "permille",
        "n",
        (F.col("_b") * F.lit(int(width)) + F.lit(int(width) - 1)).alias(
            "estimate"
        ),
    )


# --- X76: exact heavy hitters via CMS candidate pruning --------------------

def heavy_hitters(df: DataFrame, key_col: str, k: int = 50) -> DataFrame:
    """EXACT phi-heavy hitters — every key with count·k > n — in two
    passes, never a full distinct-key shuffle:

    1. Build the CMS counter matrix (≤ d·w rows, map-side combined) and
       broadcast-probe it onto the rows; CMS only OVERestimates, so
       `est·k > n` keeps a SUPERSET of the true heavy keys (the same
       superset-then-exact-confirm invariant as the Bloom seen-index —
       false positives cost an exact count, never a wrong answer).
    2. Exact groupBy-count of the surviving rows only. At 10^10 rows
       with a zipfian keyspace the shuffle moves just the heavy-
       candidate rows; the tail (the cardinality that makes exact
       heavy-hitters expensive) is filtered scan-side by the broadcast
       probe.

    Returns (key, cnt, share_milli) for the exact hitters; n is the
    total row count (one map-side agg, crossJoined as a 1-row frame —
    the repo's stat-frame pattern)."""
    tot = df.agg(F.count("*").alias("_n"))
    counters = cms_counters(df, key_col)
    probed = cms_lookup(counters, df.select(key_col), key_col)
    cand = probed.crossJoin(F.broadcast(tot)).filter(
        F.col("est") * k > F.col("_n")
    )
    exact = cand.groupBy(key_col).agg(
        F.count("*").alias("cnt"), F.max("_n").alias("_n")
    )
    return exact.filter(F.col("cnt") * k > F.col("_n")).select(
        key_col,
        "cnt",
        F.expr("(1000 * cnt) div _n").alias("share_milli"),
    )


def hll_sliding_distinct(
    df: DataFrame, key: F.Column | str, ts_col: str = "ts", hops: int = 3
) -> DataFrame:
    """Distinct keys per h-hour SLIDING window via register max-merge —
    the workload HLL's mergeability exists for: a windowed exact
    count_distinct re-shuffles the raw keys once per overlapping
    window, while here the stream is sketched ONCE per hourly tumble
    and each sliding window (labeled by its last hour, covering hours
    [end-h+1, end]) merges its member sketches with the same MAX that
    built them. Register rows fan out ×hops (256·hops per tumble — a
    metadata-sized explosion); the data itself is scanned once.
    Windows whose end falls after the last data hour carry the trailing
    partial merges and are emitted as-is (deterministic; a deployment
    filters to closed windows at read time)."""
    regs = hll_registers(
        df.withColumn("_tb", F.date_trunc("hour", F.col(ts_col))), key, ["_tb"]
    )
    wins = regs.select(
        F.explode(
            F.array(*[F.expr(f"_tb + INTERVAL {k} HOUR") for k in range(hops)])
        ).alias("win_end"),
        "register",
        "rho",
    )
    merged = wins.groupBy("win_end", "register").agg(F.max("rho").alias("rho"))
    return hll_estimate(merged, group_cols=["win_end"])


def stats_ledger(
    df: DataFrame,
    group_cols: list,
    partial_cols: list,
    value_col: str = "cents",
) -> DataFrame:
    """Mergeable exact-moments ledger: (n, sum, sumsq, min, max) over
    an integer measure, computed as PARTIALS per (group ∪ partial)
    key and then MERGED down to the group — the commutative-monoid
    bookkeeping that lets a 100-TB pipeline keep per-round statistics
    and answer corpus-lifetime questions by folding the ledger instead
    of rescanning history (the same incremental discipline as the
    Bloom seen-index and the HLL register tables). All five moments
    are exact-integer mergeable (counts/sums add, min/max fold);
    variance and mean derive exactly from (n, sum, sumsq) downstream.

    Exactness: float M2/Welford accumulation is order-dependent and
    never reproduces across engines or partitionings — sumsq over
    pre-quantized integer units (cents/milli) is associative and
    exact; sums ride BIGINT with the caller responsible for unit
    scaling (ANSI overflow discipline: cents² × rows must fit 63
    bits, or quantize coarser).

    The oracle twin computes the SAME moments in one whole-table pass
    — value equality across the partial→merge path and the one-pass
    path is precisely the mergeability proof, engine-independent."""
    sq = (
        F.col(value_col).cast("decimal(38,0)")
        * F.col(value_col).cast("decimal(38,0)")
    )
    partials = df.groupBy(*group_cols, *partial_cols).agg(
        F.count("*").alias("_n"),
        F.sum(value_col).alias("_s"),
        # decimal BEFORE summing: ANSI makes a 64-bit sum overflow throw
        F.sum(sq).alias("_ss"),
        F.min(value_col).alias("_mn"),
        F.max(value_col).alias("_mx"),
    )
    return partials.groupBy(*group_cols).agg(
        F.sum("_n").cast("long").alias("n"),
        F.sum("_s").cast("long").alias("sum_units"),
        F.sum("_ss").cast("long").alias("sumsq_units"),
        F.min("_mn").cast("long").alias("min_units"),
        F.max("_mx").cast("long").alias("max_units"),
    )
