"""One crawl round as one DataFrame job (SURVEY.md §3.4), plus the
multi-round driver with exact resume.

Round pipeline::

    frontier (committed) ─ dedup by url_hash (latest attempt wins)
      → anti-join seen  (Bloom prefilter + exact left_anti)      J2
      → broadcast hosts join + robots gate                        J3/T5
      → per-host budget window                                    O4
      → global order + limit → fetch_order                        O1-O3
      → salted repartition → mapInArrow fetch                     S6-S8
      → stage ONCE to parquet, then column-pruned re-reads derive:
          · new frontier rows (explode links, canon, priority)    exploded
          · retry rows (attempt+1, re-enter frontier)             T2
          · seen appends (ok + fatal url_hashes)                  §1.3
          · per-partition lineage + round metrics                 T4
      → atomic commit of all appends                              tables.py

The single staging write is deliberate: the expensive Arrow fetch output
materializes exactly once; every derived append re-reads the staged
parquet with column pruning (the `links`/`url_hash` reads never touch the
`bytes` column). At 100 TB that is the difference between one pass and
four.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_HOST_BUDGET, MAX_ATTEMPTS
from ..tables import Catalog
from .canon import with_url_columns
from .fetch import fetch_stage
from .politeness import (
    budget_and_order,
    robots_allowed,
    salted_repartition,
)
from .seen import (
    SEEN_INDEX_MIN,
    anti_join_seen,
    read_bloom_index,
    update_bloom_index,
)

FRONTIER_COLS = [
    "url", "url_canon", "url_hash", "host", "kind",
    "priority", "created_ms", "depth", "attempt", "round_added",
]


def normalize_frontier(spark: SparkSession, rows: list[dict], round_added: int = 0) -> DataFrame:
    """Seed rows (datagen.seed_frontier_rows dicts) → frontier DataFrame
    with canonical URL columns attached JVM-side."""
    base = spark.createDataFrame(
        [
            (r["url"], r["kind"], int(r["priority"]), int(r["created_ms"]),
             int(r["depth"]), int(r["attempt"]), round_added)
            for r in rows
        ],
        "url string, kind string, priority int, created_ms long, depth int, "
        "attempt int, round_added int",
    )
    return with_url_columns(base).select(*FRONTIER_COLS)


def dedup_frontier(frontier: DataFrame) -> DataFrame:
    """One row per url_hash; the highest-(attempt, round_added, priority)
    row wins so a URL re-queued for retry carries its attempt count (T2).

    groupBy + max_by, not a row_number window: the hash aggregate gets
    map-side partial aggregation (duplicates collapse before the shuffle)
    and skips the per-group sort — at 10^10 frontier rows this is the
    round's biggest shuffle. Remaining ties are exact duplicates (equal
    url_hash ⇒ equal url ⇒ every derived column equal), so max_by's
    arbitrary pick is still deterministic row-content-wise."""
    cols = frontier.columns
    key = F.struct(F.col("attempt"), F.col("round_added"), F.col("priority"))
    rest = [c for c in cols if c != "url_hash"]
    return (
        frontier.groupBy("url_hash")
        .agg(F.max_by(F.struct(*rest), key).alias("_r"))
        .select("url_hash", *[F.col(f"_r.{c}").alias(c) for c in rest])
        .select(*cols)
    )


@dataclass
class RoundResult:
    round_id: int
    selected: int
    fetched_ok: int
    retried: int
    failed: int
    new_links: int
    bytes_fetched: int


def links_to_frontier(staged: DataFrame, round_id: int) -> DataFrame:
    """Explode ok-rows' outlinks into new frontier rows. Link priority /
    created_ms are pure crc32 expressions matching datagen.link_priority
    (both sides JVM-computable AND Python-computable for the simulator)."""
    links = (
        staged.filter(F.col("status") == "ok")
        .select(F.explode("links").alias("url"), F.col("depth").alias("parent_depth"))
    )
    links = with_url_columns(links)
    seed = F.crc32(F.encode(F.col("url_canon"), "utf-8")).bitwiseXOR(F.lit(42)).bitwiseAND(F.lit(0x7FFFFFFF))
    return (
        links.withColumn("kind", F.element_at(F.split(F.col("url_canon"), "/"), 4))
        .withColumn("priority", F.pmod(seed, F.lit(100)).cast("int"))
        .withColumn("created_ms", (F.lit(1_600_000_000_000) + F.pmod(seed, F.lit(10_000_000))).cast("long"))
        .withColumn("depth", (F.col("parent_depth") + 1).cast("int"))
        .withColumn("attempt", F.lit(0))
        .withColumn("round_added", F.lit(round_id))
        .select(*FRONTIER_COLS)
    )


def run_round(
    spark: SparkSession,
    catalog: Catalog,
    round_id: int,
    *,
    n_hosts: int = 20,
    default_budget: int = DEFAULT_HOST_BUDGET,
    round_limit: int | None = None,
    max_depth: int = 2,
    use_bloom: bool | str = "auto",
    maintain_bloom: bool | str = "auto",
    seen_index_min: int | None = None,
    hosts_table: DataFrame | None = None,
    partitions: int | None = None,
    salt: int | None = None,
    timings: dict | None = None,
) -> RoundResult:
    """`timings`, when a dict is passed, is filled with per-phase wall
    seconds (select/fetch_stage/derived_stage/commit_totals) so bench
    regressions are attributable without a separate profiling session
    (VERDICT r02 item 6). Phases are split at the EAGER points — plan
    building is lazy, so each phase's number is the materialization it
    triggers, which is also how a cluster would account it.

    `maintain_bloom="auto"` (default) mirrors the probe's adaptive policy
    (VERDICT r04 item 2): per-round index maintenance starts only once
    the cumulative seen count crosses `seen_index_min` (default
    seen.SEEN_INDEX_MIN = the measured ~2×10⁷ probe breakeven) — below
    that the auto probe takes the plain left_anti anyway, so shard upkeep
    is pure overhead. Once an index EXISTS it is always kept fresh (a
    skipped update would strand it stale — read_bloom_index discards
    anything older than the last seen commit). True/False force the old
    unconditional behaviors; staleness semantics are unchanged."""
    import time as _time

    _t0 = _time.perf_counter()

    def _mark(key: str) -> None:
        nonlocal _t0
        if timings is not None:
            now = _time.perf_counter()
            timings[key] = round(now - _t0, 3)
            _t0 = now

    frontier = catalog.read(spark, "frontier")
    if frontier is None:
        raise ValueError("frontier is empty — seed it before round 0")
    seen = catalog.read(spark, "seen")

    # --- selection (all JVM-side, ahead of the opaque fetch stage) -------
    # The persisted Bloom index (maintained below, per-round OR of the
    # seen delta) gates the anti-join so the seen table is never re-hashed
    # per round; its meta carries n_items so no count job runs either.
    bloom_index = read_bloom_index(spark, catalog) if maintain_bloom else None
    # running seen count from commit-log metadata (index meta when one
    # exists): feeds both the probe's auto policy and the maintenance
    # decision below with ZERO count jobs. None = legacy log, fall back.
    n_seen_before = (
        bloom_index[1].n_items
        if bloom_index is not None
        else catalog.cumulative_count("seen")
    )
    active = dedup_frontier(frontier).filter(F.col("depth") <= max_depth)
    active = anti_join_seen(
        active, seen, use_bloom=use_bloom, index=bloom_index,
        est_seen=n_seen_before,
    )
    active = robots_allowed(active, hosts_table)
    selected_full = budget_and_order(active, default_budget, round_limit)
    selected = selected_full.drop(
        "budget_per_round", "crawl_delay_ms", "robots_disallow", "proxy"
    )
    _mark("select")  # eager part: budget_and_order's persist-fill + bounds

    # --- fetch (single materialization) ----------------------------------
    nparts = partitions or spark.sparkContext.defaultParallelism
    fetch_in = salted_repartition(selected, nparts, salt)
    fetched = fetch_stage(fetch_in, n_hosts=n_hosts).withColumn(
        "partition_id", F.spark_partition_id()
    ).withColumn("round", F.lit(round_id))
    staged_fetch_path = catalog.stage(fetched, "fetched", round_id)
    cache = getattr(selected_full, "_ordered_cache", None)
    if cache is not None:
        cache.unpersist()
    staged = spark.read.parquet(staged_fetch_path)
    _mark("fetch_stage")

    # --- derived appends (column-pruned reads of the staged output) ------
    new_frontier = links_to_frontier(
        staged.select("status", "links", "depth"), round_id
    ).filter(F.col("depth") <= max_depth)

    retries = (
        staged.filter((F.col("status") == "retry") & (F.col("attempt") + 1 < MAX_ATTEMPTS))
        .select(*[c for c in FRONTIER_COLS if c not in ("attempt", "round_added")],
                (F.col("attempt") + 1).alias("attempt"))
        .withColumn("round_added", F.lit(round_id + 1))
        .select(*FRONTIER_COLS)
    )

    # seen = processed-and-done: ok + fatal + retry-exhausted (the
    # reference marks read only after successful processing, oa.py:384;
    # fatal rows are done-by-failure and go to the dead-letter view)
    seen_append = (
        staged.filter(
            (F.col("status") == "ok")
            | (F.col("status") == "failed")
            | ((F.col("status") == "retry") & (F.col("attempt") + 1 >= MAX_ATTEMPTS))
        )
        .select("url_hash", "url_canon", F.col("status"), F.lit(round_id).alias("round_seen"))
    )

    # nbytes (computed in the fetch stage) keeps these aggregations off
    # the binary column — no full payload re-scan per round. Per-partition
    # lineage carries the full status taxonomy so round totals are a
    # driver-side sum over ≤nparts rows — no separate stats scan.
    lineage = (
        staged.groupBy("partition_id")
        .agg(
            F.count("*").alias("rows_in"),
            F.sum((F.col("status") == "ok").cast("long")).alias("rows_out"),
            F.sum((F.col("status") == "retry").cast("long")).alias("rows_retry"),
            F.sum((F.col("reason") == "timeout").cast("long")).alias("rows_timeout"),
            F.sum((F.col("status") == "failed").cast("long")).alias("rows_failed"),
            F.coalesce(F.sum("nbytes"), F.lit(0)).alias("bytes_fetched"),
        )
        .withColumn("round", F.lit(round_id))
    )

    # the link count rides the staging write as an Observation — no
    # second scan of the new-frontier snapshot just to count it (and the
    # seen-delta count rides its write the same way, for the Bloom meta)
    from pyspark.sql import Observation

    links_obs = Observation(f"links_r{round_id}")
    new_frontier = new_frontier.observe(links_obs, F.count(F.lit(1)).alias("n"))
    seen_obs = Observation(f"seen_r{round_id}")
    seen_append = seen_append.observe(seen_obs, F.count(F.lit(1)).alias("n"))

    staged_paths = {
        "fetched": [staged_fetch_path],
        "frontier": [
            catalog.stage(new_frontier, "frontier", round_id),
            catalog.stage(retries, "frontier", round_id),
        ],
        "seen": [catalog.stage(seen_append, "seen", round_id)],
        "lineage": [catalog.stage(lineage, "lineage", round_id)],
    }
    delta_seen = seen_obs.get["n"]
    if maintain_bloom == "auto":
        threshold = seen_index_min if seen_index_min is not None else SEEN_INDEX_MIN
        if n_seen_before is None and seen is not None:
            n_seen_before = seen.count()  # legacy log without counts: one job
        do_maintain = bloom_index is not None or (
            (n_seen_before or 0) + delta_seen >= threshold
        )
    else:
        do_maintain = bool(maintain_bloom)
    if do_maintain:
        # OR this round's delta into the persisted shards; committed in
        # the SAME round entry so index and rows stay atomic together
        staged_paths.update(
            update_bloom_index(
                spark, catalog, round_id, staged_paths["seen"],
                delta_count=delta_seen,
            )
        )
    _mark("derived_stage")
    # the seen count rides the commit entry so the NEXT round's adaptive
    # decisions (probe mode + maintenance) read the log, not the table
    catalog.commit_round(round_id, staged_paths, counts={"seen": delta_seen})

    totals = (
        spark.read.parquet(*staged_paths["lineage"])
        .agg(
            F.sum("rows_in").alias("selected"),
            F.sum("rows_out").alias("ok"),
            F.sum("rows_retry").alias("retry"),
            F.sum("rows_failed").alias("failed"),
            F.sum("bytes_fetched").alias("bytes"),
        )
        .collect()[0]
    )
    _mark("commit_totals")
    return RoundResult(
        round_id,
        totals["selected"] or 0,
        totals["ok"] or 0,
        totals["retry"] or 0,
        totals["failed"] or 0,
        links_obs.get["n"],
        totals["bytes"] or 0,
    )


def seed_catalog(
    spark: SparkSession, catalog: Catalog, rows: list[dict] | DataFrame
) -> None:
    """Round -1 'genesis' commit: the seed list (reference's configured
    sites/listing endpoints, run.py:79-86). Accepts either Python seed
    rows (small/simulator-paired runs) or an already-distributed frontier
    DataFrame (datagen.seed_frontier_df — the scale path)."""
    df = rows if isinstance(rows, DataFrame) else normalize_frontier(spark, rows, round_added=0)
    catalog.commit_round(-1, {"frontier": [catalog.stage(df, "frontier", 0)]})


# compaction commits use their own round-id space so they never collide
# with crawl rounds (streaming already reserves 10_000+)
COMPACT_ROUND_BASE = 20_000


def compact_frontier(spark: SparkSession, catalog: Catalog, round_id: int) -> None:
    """Rewrite the frontier table to exactly its live selection input:
    one row per url_hash (highest attempt/round/priority wins — the same
    max_by as dedup_frontier, so later dedups are unchanged by max_by
    associativity) minus URLs already seen (monotone, so dropping them
    is safe forever).

    Without this the frontier accumulates every link ever discovered and
    each round's dedup re-reads the full history — the same
    corpus-lifetime cost the Bloom index removes from the seen side. A
    compacted frontier is proportional to the CRAWL HORIZON (pending
    URLs), not to crawl history. Old snapshots stay on disk for
    time-travel (Iceberg rewrite-files semantics; expire separately).

    On the bucketed layout the rewrite is also the re-cluster: the
    compacted snapshot lands sorted into url_hash buckets, keeping the
    zero-exchange selection plan."""
    frontier = catalog.read(spark, "frontier")
    if frontier is None:
        return
    compacted = dedup_frontier(frontier)
    seen = catalog.read(spark, "seen")
    if seen is not None:
        compacted = compacted.join(seen.select("url_hash"), "url_hash", "left_anti")
    path = catalog.stage(compacted, "frontier", round_id)
    catalog.commit_round(round_id, {"frontier": [path]}, replaces=["frontier"])


def run_crawl(
    spark: SparkSession,
    catalog: Catalog,
    n_rounds: int,
    compact_every: int | None = None,
    **round_kwargs,
) -> list[RoundResult]:
    """Multi-round driver with exact resume: rounds already in the commit
    log are never re-run (idempotent restart, north_rule T4; the
    reference's analog is the pid-pickle guard, oa-spider.py:14-27).

    `compact_every=k` rewrites the frontier after every k-th round
    (skipped on resume if that compaction already committed)."""
    done = set(catalog.committed_rounds())
    results = []
    for r in range(n_rounds):
        if r not in done:
            results.append(run_round(spark, catalog, r, **round_kwargs))
        if (
            compact_every
            and (r + 1) % compact_every == 0
            and COMPACT_ROUND_BASE + r not in done
        ):
            compact_frontier(spark, catalog, COMPACT_ROUND_BASE + r)
    return results
