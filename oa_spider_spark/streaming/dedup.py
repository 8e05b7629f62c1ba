"""Streaming dedup with BOUNDED state: dropDuplicatesWithinWatermark.

The naive streaming dedup (`dropDuplicates("url_hash")`) keeps every
key ever seen in the state store — at crawl scale that is the seen-set
(10^10 keys) duplicated into executor state, growing forever. The
watermark variant keeps a key only until the event-time watermark
passes it: state is bounded by (dup-arrival window × ingest rate), not
by stream lifetime. That is the correct semantics for LINK dedup inside
an ingest window — duplicates of a URL arrive in bursts (many pages
link the same target around the same time); long-horizon dedup is the
seen-table anti-join's job at selection time (frontier/seen.py), which
reads a TABLE, not executor state.

Division of labor, 100-TB terms:
* in-window burst dedup → THIS operator (state ~ minutes of traffic);
* lifetime dedup        → Bloom-prefiltered seen anti-join (storage).

Semantics (Spark ≥ 3.5 `dropDuplicatesWithinWatermark`): first arrival
of a key is emitted; later arrivals are dropped while the key's event
time is within the watermark; once the watermark passes, the key leaves
state and a NEW arrival is emitted again (pinned in
tests/test_streaming.py — including state expiry across drains of one
checkpoint). The batch twin for any input whose duplicates all fall
inside the window is plain first-arrival dedup (`streaming ≡ batch`
pinned on the key set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermark_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Bounded-state streaming dedup on `keys` within an event-time
    window of `delay` (watermark on `ts_col`)."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def first_arrival_batch(
    df: DataFrame, keys: list[str], ts_col: str = "ts", order_col: str | None = None
) -> DataFrame:
    """Batch twin: the first row per key by (ts, order_col) — what the
    streaming dedup emits when every duplicate arrives within the
    window and arrival order follows event time. max_by/min_by single
    aggregate, no window."""
    others = [c for c in df.columns if c not in keys]
    order = F.struct(
        F.col(ts_col), *([F.col(order_col)] if order_col else [])
    )
    return df.groupBy(*keys).agg(
        *[F.min_by(c, order).alias(c) for c in others]
    )
