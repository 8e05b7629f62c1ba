#!/usr/bin/env python
"""Standalone mirror of the driver's sf0.01 correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` twin on
DuckDB at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01); prints a
per-query PASS/FAIL line and exits nonzero on any mismatch. Same
compare semantics as the driver: sort columns by name, order-insensitive
value comparison.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> str | None:
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"columns {sorted(sdf.columns)} != {sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return f"rows {len(sdf)} != {len(odf)}"
    cols = sorted(sdf.columns)
    # plain sort_values like the driver — unhashable cells must fail here
    a = sdf[cols].sort_values(cols, ignore_index=True)
    b = odf[cols].sort_values(cols, ignore_index=True)
    for c in cols:
        av, bv = a[c], b[c]
        if (av.dtype.kind == "f") != (bv.dtype.kind == "f"):
            # the driver hashes STRINGIFIED values: int64 123 vs float64
            # 123.0 is a hash mismatch even when values agree (this is
            # exactly how q_running_bytes shipped red in r02 — DuckDB
            # HUGEINT materializes as float64). Fail loud on kind skew.
            return f"col {c}: dtype kind mismatch spark={av.dtype} oracle={bv.dtype}"
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            try:
                pd.testing.assert_series_equal(
                    av.astype(float), bv.astype(float), check_names=False,
                    rtol=1e-6, atol=1e-9, check_index=False,
                )
            except AssertionError as exc:
                return f"float col {c}: {exc}".split("\n")[0]
        elif av.astype(str).tolist() != bv.astype(str).tolist():
            for i, (x, y) in enumerate(zip(av.astype(str), bv.astype(str))):
                if x != y:
                    return f"col {c} row {i}: spark={x!r} oracle={y!r}"
    return None


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from oa_spider_spark.session import get_spark

    spark = get_spark(cores=32, app_name="oracle_check", shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = sys.argv[1:]  # optional substring filters, e.g. `oracle_check.py pii dedup`
    failures = 0
    for name in sorted(queries):
        if only and not any(s in name for s in only):
            continue
        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark raised {exc!r}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if len(sdf) == 0:
            print(f"FAIL {name}: empty Spark result")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS {name}: {len(sdf)} rows (rows-only) [{dt:.1f}s]")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: oracle raised {exc!r}")
            failures += 1
            continue
        err = compare(sdf, odf)
        if err:
            print(f"FAIL {name}: {err}")
            failures += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows [{dt:.1f}s]")
    print(f"{'OK' if not failures else 'FAILURES'}: {failures} failed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
