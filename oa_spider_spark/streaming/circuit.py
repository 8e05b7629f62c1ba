"""Custom stateful streaming operator: per-host circuit breaker over
the fetch-result stream, built on `applyInPandasWithState` — the API
for state machines that windowed aggregation cannot express (the
trigger condition is CONSECUTIVE failures, which depends on event
order, not on any time window).

Semantics: per host, a run of `threshold` consecutive failures (no
intervening success) emits ONE circuit-open record carrying the
timestamp of the threshold-th failure and resets nothing — the run
keeps counting so a 2×threshold run still emits exactly once (state
arms again only after a success closes the run). A success resets the
counter. This is the engine-grade version of the reference's
retry/dead-letter discipline (oa.py retry loop; SURVEY T2): instead of
per-URL attempts, it watches host health and can gate the politeness
budget of the NEXT round.

Determinism: rows are sorted by (ts_us, url_hash) inside each
micro-batch before the state update, and the batch twin
(`circuit_events_batch`) applies the identical ordering — the streaming
drain and the batch computation are row-identical on the same input
(pinned in tests/test_streaming.py), including state carried ACROSS
micro-batches.

Scale notes: state is one (count, emitted) pair per host — millions of
hosts is megabytes, partitioned by the groupBy key; each micro-batch
shuffles only that batch's rows once. No Python touches anything but
the grouped Arrow batches.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CIRCUIT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("opened_at_us", LongType()),
        StructField("run_len", IntegerType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("run", IntegerType()), StructField("open", IntegerType())]
)


def _breaker_fn(threshold: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        run, is_open = state.get if state.exists else (0, 0)
        out = []
        # Materialize and sort the WHOLE group once: applyInPandasWithState
        # splits one group's rows across multiple Arrow chunks (default
        # 10k rows, spark.sql.execution.arrow.maxRecordsPerBatch) with no
        # ordering guarantee ACROSS chunks — sorting each chunk
        # independently would count failure runs out of (ts_us, url_hash)
        # order on hosts with >10k rows per micro-batch and silently break
        # the streaming↔batch row-identity contract. Per-host micro-batch
        # volume is bounded (politeness budget), so the concat is safe.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(["ts_us", "url_hash"])
            for ts_us, ok in zip(pdf["ts_us"], pdf["ok"]):
                if ok:
                    run, is_open = 0, 0
                    continue
                run += 1
                if run >= threshold and not is_open:
                    is_open = 1
                    out.append((host, int(ts_us), int(run)))
        state.update((int(run), int(is_open)))
        if out:
            yield pd.DataFrame(out, columns=["host", "opened_at_us", "run_len"])

    return fn


def host_circuit_breaker(
    fetches: DataFrame, threshold: int = 3
) -> DataFrame:
    """Streaming (or batch) grouped state machine over rows
    (host string, ts_us long, url_hash long, ok boolean). Emits one
    (host, opened_at_us, run_len) row per failure run reaching
    `threshold`. Works on a streaming DataFrame (state persists across
    micro-batches via the checkpoint) and on a batch DataFrame (single
    pass)."""
    return fetches.groupBy("host").applyInPandasWithState(
        _breaker_fn(threshold),
        outputStructType=CIRCUIT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def circuit_events_batch(fetches: DataFrame, threshold: int = 3) -> DataFrame:
    """Batch twin in pure column expressions (gaps-and-islands): the
    expected output of `host_circuit_breaker` on the same rows. Failure
    islands are identified by the running success count; the
    threshold-th failure of each island (in (ts_us, url_hash) order) is
    the open event."""
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy("ts_us", "url_hash")
    island = F.sum(F.when(F.col("ok"), 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = fetches.withColumn("_island", island).filter(~F.col("ok"))
    wi = Window.partitionBy("host", "_island").orderBy("ts_us", "url_hash")
    runs = tagged.withColumn("_pos", F.row_number().over(wi))
    return runs.filter(F.col("_pos") == threshold).select(
        "host",
        F.col("ts_us").alias("opened_at_us"),
        F.col("_pos").cast("int").alias("run_len"),
    )
