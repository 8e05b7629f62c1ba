"""Iceberg-backed Catalog adapter (SURVEY.md §1.2 target binding).

The engine is written against the `Catalog` contract in `tables.py`
(append-only snapshots, atomic multi-table round commits, time-travel by
round, exact resume). This module binds that contract to a REAL Apache
Iceberg runtime when the jar is on the Spark classpath; the sandbox has
no Iceberg jar, so everything here is gated behind `iceberg_available`
and exercised by a skip-if-absent test (`tests/test_iceberg.py`).

Design notes (why this shape):

* Iceberg transactions are per-table, so multi-table round atomicity
  cannot ride a single Iceberg commit. The adapter anchors atomicity the
  same way the parquet catalog anchors it on one `os.replace`: staged
  data lands in per-snapshot Iceberg tables that no reader ever lists,
  and the ONE atomic publish point is a single-row append to a
  `commit_log` Iceberg table (one table ⇒ one Iceberg transaction).
  A crash before that append leaves orphan staged tables that readers
  never see — identical exact-resume semantics (north_rule T4).
* `read` unions the committed staged tables via
  `spark.read.format("iceberg")`. A maintenance job may fold staged
  tables into one live table per logical table and rewrite the log —
  the engine above this layer does not change (same doctrine as
  `tables.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class IcebergCatalog:
    """`tables.Catalog` contract over Iceberg tables.

    `catalog` must name a configured Spark catalog backed by
    `org.apache.iceberg.spark.SparkCatalog` (e.g. via
    ``spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog``,
    ``spark.sql.catalog.local.type=hadoop``,
    ``spark.sql.catalog.local.warehouse=/path``).
    """

    _LOG_DDL = "round INT, tbl STRING, snap STRING, seq INT"

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "crawl"):
        if not iceberg_available(spark):
            raise RuntimeError(
                "no Iceberg runtime jar on the Spark classpath — use "
                "tables.Catalog (parquet + JSON commit log), which provides "
                "the same contract"
            )
        self.spark = spark
        self.ns = f"{catalog}.{namespace}"
        self._counter = 0
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.ns}")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.ns}.commit_log ({self._LOG_DDL}) "
            "USING iceberg"
        )

    # -- commit log ---------------------------------------------------------

    def _log(self) -> DataFrame:
        return self.spark.read.format("iceberg").load(f"{self.ns}.commit_log")

    def committed_rounds(self) -> list[int]:
        return sorted(
            r["round"] for r in self._log().select("round").distinct().collect()
        )

    def last_round(self) -> int | None:
        rounds = self.committed_rounds()
        return rounds[-1] if rounds else None

    # -- staging + commit ---------------------------------------------------

    def stage(self, df: DataFrame, table: str, round_id: int) -> str:
        """Write one snapshot as a staged Iceberg table no reader lists;
        returns its fully-qualified name (the `staged` handle)."""
        self._counter += 1
        sign = "m" if round_id < 0 else "r"
        name = f"{self.ns}.{table}__snap_{sign}{abs(round_id):05d}_{self._counter:04d}"
        df.writeTo(name).using("iceberg").createOrReplace()
        return name

    def commit_round(self, round_id: int, staged: dict[str, list[str]]) -> None:
        """Atomically publish all staged snapshots of one round: ONE
        append transaction on the commit_log table."""
        if round_id in set(self.committed_rounds()):
            raise ValueError(f"round {round_id} already committed")
        rows = [
            (round_id, tbl, snap, i)
            for tbl, snaps in staged.items()
            for i, snap in enumerate(snaps)
        ]
        self.spark.createDataFrame(rows, self._LOG_DDL).writeTo(
            f"{self.ns}.commit_log"
        ).append()

    # -- reads ----------------------------------------------------------------

    def snapshot_paths(self, table: str, as_of_round: int | None = None) -> list[str]:
        log = self._log().filter(F.col("tbl") == table)
        if as_of_round is not None:
            log = log.filter(F.col("round") <= as_of_round)
        return [
            r["snap"] for r in log.orderBy("round", "seq").select("snap", "round", "seq").collect()
        ]

    def read(
        self, spark: SparkSession, table: str, as_of_round: int | None = None
    ) -> DataFrame | None:
        names = self.snapshot_paths(table, as_of_round)
        if not names:
            return None
        dfs = [spark.read.format("iceberg").load(n) for n in names]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out
