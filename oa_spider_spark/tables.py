"""Snapshot table layer: Iceberg-shaped semantics on plain parquet.

The design targets Iceberg (`spark.read.format("iceberg")`, SURVEY.md §1.2);
the sandbox has no Iceberg runtime jar, so this thin catalog provides the
same contract — append-only snapshots, atomic multi-table round commits,
time-travel by round, exact resume — over parquet directories plus a
single JSON commit log. On a real cluster, swap `Catalog` for Iceberg
tables and map `commit_round` onto one Iceberg transaction; the engine
code above this layer does not change.

Atomicity: data files are staged first; the commit log is rewritten to a
temp file and `os.replace`d (atomic on POSIX). A crash mid-round leaves
staged-but-uncommitted snapshots that readers never see — that is the
exact-resume guarantee (north_rule T4; the reference's analog is the pid
pickle guard, oa-spider.py:14-27).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._log_path = self.root / "commit_log.json"
        self._counter = 0

    # -- commit log -------------------------------------------------------

    def _read_log(self) -> list[dict]:
        if not self._log_path.exists():
            return []
        return json.loads(self._log_path.read_text())

    def _write_log(self, entries: list[dict]) -> None:
        tmp = self.root / "commit_log.json.tmp"
        tmp.write_text(json.dumps(entries, indent=1))
        os.replace(tmp, self._log_path)

    def committed_rounds(self) -> list[int]:
        return sorted(e["round"] for e in self._read_log())

    def last_round(self) -> int | None:
        rounds = self.committed_rounds()
        return rounds[-1] if rounds else None

    # -- staging + commit -------------------------------------------------

    def stage(self, df: DataFrame, table: str, round_id: int) -> str:
        """Write a snapshot directory for `table`; invisible until
        `commit_round` lists it. Returns the staged path."""
        self._counter += 1
        path = self.root / table / f"snap-r{round_id:05d}-{self._counter:04d}"
        df.write.mode("overwrite").parquet(str(path))
        return str(path)

    def commit_round(self, round_id: int, staged: dict[str, list[str]]) -> None:
        """Atomically publish all staged snapshots of one crawl round.
        `staged` maps table name -> list of staged snapshot paths."""
        entries = self._read_log()
        if any(e["round"] == round_id for e in entries):
            raise ValueError(f"round {round_id} already committed")
        entries.append({"round": round_id, "tables": staged})
        self._write_log(entries)

    # -- reads ------------------------------------------------------------

    def snapshot_paths(self, table: str, as_of_round: int | None = None) -> list[str]:
        paths: list[str] = []
        for e in self._read_log():
            if as_of_round is not None and e["round"] > as_of_round:
                continue
            paths.extend(e["tables"].get(table, []))
        return paths

    def read(
        self, spark: SparkSession, table: str, as_of_round: int | None = None
    ) -> DataFrame | None:
        """Committed rows of `table` (optionally time-traveled). None if
        the table has no committed snapshots yet."""
        paths = self.snapshot_paths(table, as_of_round)
        if not paths:
            return None
        return spark.read.parquet(*paths)
