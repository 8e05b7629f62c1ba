"""Graph centrality over link graphs, in the repo's exact-integer
numeric discipline.

PageRank is the canonical "which crawled page matters" signal (the
reference crawler ranks by site-assigned priority only; a 100-TB crawl
wants link-structure authority for recrawl scheduling and training-mix
weighting). The textbook formulation is float power iteration — which a
value oracle cannot pin, because distributed float sums are
accumulation-order-dependent. Here ranks live in integer MICRO-units
and every per-edge contribution is an integer floor-divide
`(rank * damping) div (1000 * out_deg)` — sums of integers are exact
under any partitioning/AQE re-plan, so a fixed iteration count yields
bit-identical ranks anywhere, and the DuckDB oracle is the same
recurrence unrolled as a CTE chain.

Semantics (standard simplifications, documented):
* damping in permille (850 = 0.85); every node gets the
  `(1000 - damping)` base in micro-units each iteration.
* dangling nodes (no out-edges) leak their mass — no redistribution
  (redistribution needs a global sum per iteration; the leak variant is
  the common large-scale choice).
* parallel edges count multiply; floors shave at most out_deg
  micro-units per node per iteration — deterministic on both engines.

Scale notes (100 TB / 10^10-node graphs):
* Per iteration: one join of edges⋈ranks on src + one groupBy dst with
  map-side combine — two shuffles, both on graph-sized keys. Edges are
  the big, LOOP-INVARIANT side: pre-partition them ONCE on src
  (`edges.repartition(P, "src")` + persist) and every iteration's join
  reuses that layout instead of re-shuffling the edge list.
* Lineage grows linearly with iterations; past ~10 iterations pass
  `checkpoint_every` to truncate (same discipline as
  dedup.connected_components, which must checkpoint because its EDGE
  SET mutates per round — here only the node-sized rank vector does,
  so the default is off for typical 5-10 iteration runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_integer(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 5,
    damping_permille: int = 850,
    base_micro: int = 1_000_000,
    checkpoint_every: int = 0,
) -> DataFrame:
    """(node, rank_micro) after `iterations` exact-integer power steps.

    `edges` has (src, dst); `nodes` one row per node id in column
    `node` (nodes absent from edges still rank — they keep the base).
    Initial rank is `base_micro` per node.
    """
    d = int(damping_permille)
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    ed = edges.join(deg, "src")
    ranks = nodes.select("node", F.lit(base_micro).cast("long").alias("rank"))
    base = (base_micro * (1000 - d)) // 1000
    for i in range(iterations):
        contribs = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(rank * {d}) div (1000 * out_deg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base).cast("long") + F.coalesce("c", F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.withColumnRenamed("rank", "rank_micro")
