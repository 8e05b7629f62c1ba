"""Z-order (Morton) clustering for multi-column data skipping.

A 100-TB table can be SORTED on only one column: predicates on any
other column skip nothing. Interleaving the bits of several quantized
columns into one Morton key and clustering files by that key gives
every participating column locality, so per-file min/max stats prune a
multi-dimensional box predicate to a handful of files — the layout
technique behind Delta Lake's OPTIMIZE ZORDER and Iceberg's
rewrite-with-zorder (public docs; the algorithm is Morton 1966).

Numeric discipline: quantization and interleave are pure BIGINT
arithmetic — `q = ((x - lo) * (2^bits - 1)) div (hi - lo)` then bit
shifts — so the key is deterministic cross-engine and the DuckDB oracle
reproduces it exactly (`div`, never float `/`: the product reaches
2^63 and double division would round above 2^53). The only driver
interaction is the per-column 2-value min/max bounds row
(metadata-sized, same as weighted sampling).

Scale shape: zero shuffle to COMPUTE the key (row-local expression);
one exchange to CLUSTER by it — which is the point of the operation (a
one-time rewrite amortized over every later scan, exactly like
compaction). File-skipping effectiveness is pinned by
tests/test_layout.py against real parquet footer stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(qcols: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of column j lands at position i·d + j."""
    d = len(qcols)
    z = F.lit(0).cast("long")
    for j, q in enumerate(qcols):
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftrightunsigned(q, i).bitwiseAND(F.lit(1)), i * d + j
            )
    return z


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 16, bounds: dict | None = None
) -> DataFrame:
    """Adds `zval`: the Morton key over integer columns `cols` (simple
    column names — each is quantized to `bits` bits over its [lo, hi]
    range). `bounds` maps col -> (lo, hi); when omitted, computed with
    one metadata-sized min/max aggregate (exact integers — safe to
    embed in a generated oracle). Requires span · 2^bits < 2^63
    (span < ~1.4e14 at the default 16 bits)."""
    if bounds is None:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
        row = df.agg(*aggs).collect()[0]
        bounds = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}
    top = (1 << bits) - 1
    tmp, qnames = df, []
    for idx, c in enumerate(cols):
        lo, hi = bounds[c]
        span = max(hi - lo, 1)
        qn = f"_q{idx}"
        tmp = tmp.withColumn(
            qn,
            F.expr(
                f"greatest(0L, least({top}L, (({c} - {lo}) * {top}) div {span}))"
            ),
        )
        qnames.append(qn)
    z = _interleave([F.col(q) for q in qnames], bits)
    return tmp.withColumn("zval", z).drop(*qnames)


def zorder_files(
    df: DataFrame, cols: list[str], path: str, n_buckets: int = 32, bits: int = 16
) -> None:
    """Cluster `df` into `n_buckets` z-range files at `path`: bucket =
    top bits of zval (deterministic — no sampling-based range
    partitioner), one partition directory per bucket, rows z-sorted
    within. Each bucket is a contiguous z-range = a compact multi-dim
    region, so every participating column's per-file min/max stays
    narrow."""
    z = zorder_value(df, cols, bits=bits)
    shift = max(0, bits * len(cols) - (n_buckets - 1).bit_length())
    out = z.withColumn("zbucket", F.shiftrightunsigned("zval", shift))
    (
        out.repartition(n_buckets, "zbucket")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .partitionBy("zbucket")
        .parquet(path)
    )


def zvalue_sql(table: str, cols: list[str], bits: int = 16) -> str:
    """DuckDB oracle generator: the identical quantize+interleave
    expression over `table`, bounds computed in-SQL (exact integers ⇒
    identical q values)."""
    d = len(cols)
    top = (1 << bits) - 1
    qs = []
    for c in cols:
        lo = f"(SELECT min({c}) FROM {table})"
        hi = f"(SELECT max({c}) FROM {table})"
        span = f"greatest({hi} - {lo}, 1)"
        qs.append(f"greatest(0, least({top}, (({c} - {lo}) * {top}) // {span}))")
    terms = []
    for j, q in enumerate(qs):
        for i in range(bits):
            terms.append(f"((({q} >> {i}) & 1) << {i * d + j})")
    return " + ".join(terms)


def gc_plan(
    commits: DataFrame,
    keep_rounds: int = 8,
) -> DataFrame:
    """Snapshot garbage-collection planner for the commit-log catalog
    (tables.py semantics: compaction commits supersede the appends
    before them, but superseded files stay on disk for time travel) —
    the expire-snapshots decision, computed as data so the deletion job
    is auditable BEFORE it runs. commits: (table, snap, round, kind in
    'append'|'compact', bytes).

    Per table: a compact commit is a live base forever; an append at or
    before the last compaction is superseded — deletable once it also
    falls behind the time-travel horizon (max_round − keep_rounds),
    retained for travel until then; appends after the last compaction
    are live. Two conditional per-table aggregates broadcast back; one
    CASE lattice per snapshot row."""
    per = commits.groupBy("table").agg(
        F.max("round").alias("_maxr"),
        F.max(F.when(F.col("kind") == "compact", F.col("round"))).alias("_lastc"),
    )
    j = commits.join(F.broadcast(per), "table")
    horizon = F.col("_maxr") - keep_rounds
    superseded = (F.col("kind") == "append") & (
        F.col("round") <= F.coalesce(F.col("_lastc"), F.lit(-1))
    )
    reason = (
        F.when(F.col("kind") == "compact", "live-base")
        .when(superseded & (F.col("round") < horizon), "deletable")
        .when(superseded, "time-travel-retained")
        .otherwise("live")
    )
    return j.select(
        "table",
        "snap",
        "round",
        "kind",
        "bytes",
        reason.alias("reason"),
        (reason == "deletable").alias("deletable"),
    )
