"""Local mirror of the driver's correctness gate: run every `queries()`
entry on Spark and its `oracle_sql()` twin on DuckDB over the same
parquet, compare row count, column names, and (order-insensitively)
values. sf0.001 keeps the suite fast; the driver re-runs at sf0.01.
"""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    oracle = entry_mod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR).toPandas()
    assert len(sdf) > 0, f"{name}: Spark result empty"
    if oracle is None:
        pytest.skip(f"{name}: rows-only check (no SQL oracle)")
    odf = ddb.execute(oracle).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), f"{name}: column mismatch"
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} != {len(odf)}"
    cols = sorted(sdf.columns)
    # plain sort_values, exactly like the driver's canonicalization — no
    # astype(str) escape hatch: a query returning unhashable cells (lists)
    # must fail HERE, not only in the driver (VERDICT r01 §wrong-1).
    a = sdf[cols].sort_values(cols, ignore_index=True)
    b = odf[cols].sort_values(cols, ignore_index=True)
    for c in cols:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            pd.testing.assert_series_equal(
                av.astype(float), bv.astype(float), check_names=False,
                rtol=1e-6, atol=1e-9, check_index=False,
            )
        else:
            assert av.astype(str).tolist() == bv.astype(str).tolist(), f"{name}.{c} differs"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"round", "host", "status", "fmt", "n"}.issubset(set(df.columns))
