"""Z-order layout: Morton-key correctness and the file-skipping payoff,
measured against REAL parquet footer min/max stats (the stats a
lakehouse reader prunes with) — not against plan text, which cannot see
row-group skipping for non-partition columns.
"""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from oa_spider_spark.operators.layout import zorder_files, zorder_value


def test_zvalue_hand_checked(spark):
    """2-bit, 2-column interleave against hand-computed Morton codes:
    z(x,y) places x's bit i at 2i, y's at 2i+1."""
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (2, 1)], "x long, y long"
    )
    out = {
        (r["x"], r["y"]): r["zval"]
        for r in zorder_value(df, ["x", "y"], bits=2, bounds={"x": (0, 3), "y": (0, 3)}).collect()
    }
    assert out == {(0, 0): 0, (3, 0): 5, (0, 3): 10, (3, 3): 15, (2, 1): 6}


def test_zvalue_bounds_clamp_and_determinism(spark):
    """Out-of-bounds values clamp to the quantization edges; the key is
    identical under any partitioning (pure integer arithmetic)."""
    df = spark.createDataFrame([(i, i * 37 % 1000) for i in range(500)], "x long, y long")
    a = sorted(zorder_value(df, ["x", "y"]).select("x", "zval").collect())
    b = sorted(zorder_value(df.repartition(13), ["x", "y"]).select("x", "zval").collect())
    assert a == b
    clamped = zorder_value(
        df, ["x", "y"], bits=4, bounds={"x": (100, 200), "y": (0, 999)}
    )
    qmax = 15
    assert clamped.filter(F.col("x") > 200).count() > 0  # clamp case exists
    assert clamped.agg(F.max("zval")).collect()[0][0] <= (1 << 8) - 1
    assert qmax == 15


def _files_touched(root: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(files whose [min,max] for `col` intersects [lo, hi], total files)
    from parquet footer statistics — what a stats-pruning reader does."""
    paths = sorted(glob.glob(f"{root}/**/*.parquet", recursive=True))
    touched = 0
    for p in paths:
        md = pq.ParquetFile(p).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        fmin = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        fmax = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        if fmax >= lo and fmin <= hi:
            touched += 1
    return touched, len(paths)


def test_zorder_file_skipping_beats_single_column_sort(spark, tmp_path):
    """The reason z-order exists: a predicate on the SECOND clustering
    column prunes most z-ordered files, while a layout sorted on the
    first column alone prunes (almost) none. Measured on real footer
    stats over 32 files of 20k deterministic rows."""
    n, dom = 20_000, 1 << 20
    df = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(dom)).alias("x"),
        F.pmod(F.xxhash64((F.col("id") * 7 + 1).cast("string")), F.lit(dom)).alias("y"),
    )
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    zorder_files(df, ["x", "y"], zpath, n_buckets=32, bits=16)
    # linear control: clustered on x only (top-5-bit buckets)
    (
        df.withColumn("xbucket", F.shiftrightunsigned("x", 15))
        .repartition(32, "xbucket")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .partitionBy("xbucket")
        .parquet(lpath)
    )
    lo = dom // 2
    hi = lo + dom // 16 - 1  # narrow band on y: 1/16 of its range
    z_touched, z_total = _files_touched(zpath, "y", lo, hi)
    l_touched, l_total = _files_touched(lpath, "y", lo, hi)
    assert z_total >= 16 and l_total >= 16
    assert l_touched >= l_total * 3 // 4  # x-sorted layout: y prunes ~nothing
    assert z_touched * 2 <= l_touched  # z-layout: most files skipped
    # and the z layout still prunes on x too (box predicate)
    zx, _ = _files_touched(zpath, "x", lo, hi)
    assert zx < z_total
