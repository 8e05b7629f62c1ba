"""Streaming space-saving heavy hitters — bounded-state frequent-item
tracking over an unbounded stream (hot hosts, hot URLs, hot query
terms), the streaming complement of X76's exact two-pass heavy hitters
(which needs the whole log) and X39's Count-Min (which sketches counts
for ANY key but cannot enumerate the frequent set).

Formulation: the MERGEABLE space-saving variant (Agarwal et al.,
"Mergeable Summaries", PODS'12; Metwally et al.'s original is
per-item-sequential). Each micro-batch is pre-aggregated to exact
per-item counts in vectorized pandas — no per-row Python — then merged
into the checkpointed m-counter summary:

  * tracked item: counter += batch count;
  * untracked item: enters at (min counter before the merge) + batch
    count, error = that min (the standard overestimate bookkeeping);
  * keep the top m by (count desc, item asc) — the deterministic
    tie-break that makes drains reproducible.

Guarantees (per shard group, any batch split): every item with true
frequency > n_processed/m is in the summary, and each counter
overestimates its item's true count by at most its `err` <=
n_processed/m. State is EXACTLY m rows per shard — bounded forever.

Sharding: callers group by a hash shard of the item space
(`pmod(xxhash64(item), S)`) so the summary work distributes; per-shard
guarantees hold independently because the shard function partitions
items (an item's whole stream lands in one shard). Global top-k =
union of shard summaries.

Chunk-safety: one group's batch rows may arrive in several Arrow
chunks with no ordering — concatenated before the value_counts
(circuit.py discipline). Output: each batch appends the post-merge
snapshot tagged with the monotone `n_processed`, so readers take the
rows at max(n_processed) per shard; a single availableNow drain emits
exactly one snapshot per shard.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

TOPK_OUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("item", StringType()),
        StructField("count", LongType()),
        StructField("err", LongType()),
        StructField("n_processed", LongType()),
    ]
)

TOPK_STATE_SCHEMA = StructType(
    [
        StructField("items", StringType()),  # \x1f-joined, parallel arrays
        StructField("counts", StringType()),
        StructField("errs", StringType()),
        StructField("n_processed", LongType()),
    ]
)

_SEP = "\x1f"


def merge_summary(
    summary: dict, batch_counts: "pd.Series", m: int
) -> dict:
    """Merge exact batch counts into an m-counter space-saving summary
    (dict item -> (count, err)). Pure function shared by the streaming
    state handler and the batch twin below."""
    floor = min((c for c, _e in summary.values()), default=0)
    floor = floor if len(summary) >= m else 0
    merged = dict(summary)
    for item, c in batch_counts.items():
        c = int(c)
        if item in merged:
            cnt, err = merged[item]
            merged[item] = (cnt + c, err)
        else:
            merged[item] = (floor + c, floor)
    top = sorted(merged.items(), key=lambda kv: (-kv[1][0], kv[0]))[:m]
    return dict(top)


def _topk_fn(m: int, item_col: str):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            items, counts, errs, n_proc = state.get
            summary = {
                i: (int(c), int(e))
                for i, c, e in zip(
                    items.split(_SEP) if items else [],
                    counts.split(_SEP) if counts else [],
                    errs.split(_SEP) if errs else [],
                )
            }
            n_proc = int(n_proc)
        else:
            summary, n_proc = {}, 0
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            bc = pdf[item_col].value_counts().sort_index()
            summary = merge_summary(summary, bc, m)
            n_proc += int(len(pdf))
        keys = sorted(summary)
        state.update(
            (
                _SEP.join(keys),
                _SEP.join(str(summary[k][0]) for k in keys),
                _SEP.join(str(summary[k][1]) for k in keys),
                n_proc,
            )
        )
        yield pd.DataFrame(
            {
                "shard": [int(shard)] * len(summary),
                "item": list(summary.keys()),
                "count": [c for c, _e in summary.values()],
                "err": [e for _c, e in summary.values()],
                "n_processed": [n_proc] * len(summary),
            }
        )

    return fn


def streaming_topk(
    stream: DataFrame,
    item_col: str = "item",
    shard_col: str = "shard",
    m: int = 8,
) -> DataFrame:
    """Stateful streaming space-saving over rows carrying (shard_col,
    item_col). Streaming-only (applyInPandasWithState raises on batch
    frames); the batch twin is `batch_topk` below, built on the same
    merge_summary fold, and the two are pinned equal across
    checkpointed drains in tests/test_streaming.py."""
    return stream.groupBy(shard_col).applyInPandasWithState(
        _topk_fn(m, item_col),
        outputStructType=TOPK_OUT_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_topk(pdf: "pd.DataFrame", item_col: str, m: int) -> dict:
    """Batch twin: one merge of the whole frame's exact counts (a
    single-batch drain is exactly this)."""
    bc = pdf[item_col].value_counts().sort_index()
    return merge_summary({}, bc, m)
