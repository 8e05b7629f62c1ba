"""Politeness budgets, robots gating, crawl ordering, skew salting.

Reference semantics being generalized:
  * crawl cadence 3 rounds/hour (cron, README_OLD.md:36-42) → per-round
    per-host fetch budgets (O4/O6);
  * listing order `sort=CreatedTime desc` (oa.py:553-569) + docs-then-mails
    concatenation (oa.py:455) + `[:limit]` slice (oa.py:456-459) → one
    deterministic total order;
  * `/word/view` link skip (oa.py:771-773) → robots disallow prefixes.

The total crawl order (FIXTURES.md §2, SURVEY.md §7 hard-part 1):
    (priority DESC, created_ms DESC, kind_rank ASC, url_hash ASC)
url_hash breaks every tie, so the order is total and the Spark job —
which executes unordered — reproduces the reference's sequential order
exactly when sorted. The budget window runs BEFORE the fetch stage:
Catalyst cannot push a limit below an opaque Python stage (SURVEY.md §4),
so the pipeline is authored filter-first — unlike the reference, which
fetches everything and slices afterwards (its documented anti-pattern,
oa.py:444 vs :456-459).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import DEFAULT_HOST_BUDGET


def kind_rank(col: Column | str = "kind") -> Column:
    """docs before mails (reference documents.extend(mail_files), oa.py:455)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == "doc", 0).otherwise(1)


def order_cols(df_or_prefix: str = "") -> list[Column]:
    p = df_or_prefix
    return [
        F.col(p + "priority").desc(),
        F.col(p + "created_ms").desc(),
        kind_rank(p + "kind").asc(),
        F.col(p + "url_hash").asc(),
    ]


def robots_allowed(df: DataFrame, hosts: DataFrame | None) -> DataFrame:
    """Broadcast-join the hosts/politeness table (J3) and drop rows whose
    URL path matches a disallow prefix. hosts columns:
    (host, budget_per_round, crawl_delay_ms, robots_disallow array<string>).
    """
    if hosts is None:
        return df.withColumn("budget_per_round", F.lit(None).cast("int"))
    joined = df.join(F.broadcast(hosts), "host", "left")
    # path of url_canon: strip scheme + host[:port], keep the leading slash
    path = F.regexp_replace(
        F.substring_index(F.col("url_canon"), "://", -1), r"^[^/]*", ""
    )
    disallowed = F.exists(
        F.coalesce(F.col("robots_disallow"), F.array().cast("array<string>")),
        lambda p: F.startswith(path, p),
    )
    return joined.filter(~disallowed)


def apply_budget(
    df: DataFrame, default_budget: int = DEFAULT_HOST_BUDGET
) -> DataFrame:
    """Per-host top-k under the deterministic crawl order — the engine's
    politeness primitive (replaces the reference's wall-clock cadence)."""
    w = Window.partitionBy("host").orderBy(*order_cols())
    budget = F.coalesce(F.col("budget_per_round"), F.lit(default_budget))
    return (
        df.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= budget)
        .drop("host_rank")
    )


def global_order_and_limit(
    df: DataFrame, limit: int | None = None, partitions: int | None = None
) -> DataFrame:
    """Global deterministic order + optional round limit, with the fetch
    sequence number materialized as `fetch_order` (basis of the
    crawl-order equivalence tests).

    A bare `Window.orderBy(...)` row_number would funnel every row through
    ONE task — a non-starter at 10^10 frontier rows. Instead, a
    **bucketed global rank**: rows bucket by clamped priority (the leading
    sort key), so every row of bucket b precedes every row of bucket b+1
    in the total order regardless of the other keys — clamped outliers
    still order correctly because the in-bucket window re-sorts by the
    full key. Global rank = (broadcast) bucket offset + in-bucket
    row_number. One tiny count job (≤100 rows to the driver), one
    shuffle, all JVM — no range-boundary sampling, no dependence on
    physical partition contents. The selection is persisted so the count
    job and the rank job don't re-run the upstream window DAG twice.
    """
    from pyspark import StorageLevel

    inp = df.persist(StorageLevel.MEMORY_AND_DISK)
    bucket = F.least(F.greatest(F.lit(99) - F.col("priority"), F.lit(0)), F.lit(99))
    counts = {
        r["_b"]: r["n"]
        for r in inp.groupBy(bucket.alias("_b")).agg(F.count("*").alias("n")).collect()
    }
    rows, acc = [], 0
    for b in sorted(counts):
        rows.append((b, acc))
        acc += counts[b]
    offsets_df = df.sparkSession.createDataFrame(rows or [(0, 0)], "_b int, _off long")

    w = Window.partitionBy("_b").orderBy(*order_cols())
    out = (
        inp.withColumn("_b", bucket)
        .withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(offsets_df), "_b")
        .withColumn("fetch_order", (F.col("_off") + F.col("_rn")).cast("int"))
        .drop("_b", "_rn", "_off")
    )
    if limit is not None:
        out = out.filter(F.col("fetch_order") <= limit)
    # let the caller release the cached selection once the round is staged
    out._ordered_cache = inp  # type: ignore[attr-defined]
    return out


def salted_repartition(
    df: DataFrame, partitions: int, salt: int | None = None
) -> DataFrame:
    """Repartition for the fetch stage on (host, salt) so one hot host
    spreads over `salt` tasks instead of one (SURVEY.md §4 item 1 — UDF
    stage skew is invisible to AQE's skew-join handling, so it is defused
    at the partitioner).

    `salt` defaults to the partition count: a host with ≥`partitions`
    rows spreads across EVERY fetch task, so the stage's wall time is
    bounded by total/partitions, not by the hot host's share. A fixed
    small salt (e.g. 8) makes any task that hashes 2+ hot-host buckets a
    straggler — measured 0.62 scaling efficiency at 4→16 cores before
    this change. Per-host locality inside a task is irrelevant to
    correctness (budgets were applied upstream) and a real fetch worker
    keys its connection pool by host, not by task."""
    s = salt or max(partitions, 1)
    return df.repartition(
        partitions,
        F.concat_ws("#", F.col("host"), F.pmod(F.col("url_hash"), F.lit(s)).cast("string")),
    )
