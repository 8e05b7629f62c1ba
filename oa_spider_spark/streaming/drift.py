"""Streaming status-mix drift alarm — the stateful streaming twin of
frontier/recrawl.py::status_drift (X111): per-host state carries the
most recent round's 4-way milli distribution across micro-batches, so
consecutive-round drift rows stream out as rounds commit instead of
re-scanning the whole status log every time.

Contract: a round's (host, round, status, n) tallies arrive within ONE
micro-batch (true in the engine — rounds commit atomically; epochs are
write-once, streaming/rounds.py). Rounds may straddle batches freely:
the pairing (r, r+1) works off the checkpointed state. Non-consecutive
rounds (gaps) emit nothing, exactly like the batch twin's
`b.round = a.round + 1` equi-join.

Chunk-safety: applyInPandasWithState splits one group's rows across
Arrow chunks with no cross-chunk ordering — the whole group is
concatenated before aggregation (the circuit.py r4 lesson); per-host
per-batch volume is round-tally-sized (#rounds × #statuses), trivially
bounded.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..frontier.recrawl import DRIFT_STATUSES

DRIFT_OUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("round_from", LongType()),
        StructField("round_to", LongType()),
        StructField("drift_milli", LongType()),
        StructField("flagged", BooleanType()),
    ]
)

DRIFT_STATE_SCHEMA = StructType(
    [StructField("round", LongType())]
    + [StructField(f"m_{s}", LongType()) for s in DRIFT_STATUSES]
)


def _drift_fn(threshold: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        prev = tuple(state.get) if state.exists else None
        pdf = pd.concat(list(pdfs), ignore_index=True)
        out = []
        if len(pdf):
            g = pdf.groupby(["round", "status"], as_index=False)["n"].sum()
            for r in sorted(g["round"].unique()):
                sub = g[g["round"] == r]
                tot = int(sub["n"].sum())
                ms = tuple(
                    (1000 * int(sub.loc[sub["status"] == s, "n"].sum())) // tot
                    for s in DRIFT_STATUSES
                )
                cur = (int(r),) + ms
                if prev is not None and cur[0] == prev[0] + 1:
                    drift = sum(
                        abs(cur[i] - prev[i]) for i in range(1, len(cur))
                    )
                    out.append(
                        (host, prev[0], cur[0], drift, drift > threshold)
                    )
                prev = cur
        if prev is not None:
            state.update(tuple(int(x) for x in prev))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "host", "round_from", "round_to", "drift_milli", "flagged",
                ],
            )

    return fn


def streaming_status_drift(
    log: DataFrame, drift_threshold_milli: int = 400
) -> DataFrame:
    """Stateful streaming drift over rows (host string, round long,
    status string, n long). Streaming-only (applyInPandasWithState
    raises on batch frames on this Spark); the batch twin is
    frontier/recrawl.py::status_drift, and the two are pinned
    row-identical across checkpointed drains in
    tests/test_streaming.py."""
    return log.groupBy("host").applyInPandasWithState(
        _drift_fn(drift_threshold_milli),
        outputStructType=DRIFT_OUT_SCHEMA,
        stateStructType=DRIFT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
