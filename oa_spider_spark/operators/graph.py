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


# --- X55: triangle counting (degree-oriented) -------------------------------


def cooccurrence_edges(
    events: DataFrame,
    node_col: str = "user_id",
    group_cols: tuple = ("event_type",),
    cap: int | None = 64,
) -> DataFrame:
    """Undirected distinct edges (u < v) between nodes co-occurring in
    the same blocking group — the standard entity-graph constructor
    (users sharing a session key, docs sharing a shingle bucket).

    The within-group self-join is the one quadratic hazard (g members ⇒
    g² pairs in one task), so it reuses dedup's `_cap_groups` hot-bucket
    guard: groups over `cap` members are dropped entirely (a group that
    big is a hub artifact — boilerplate key, bot session — that would
    dominate the graph and the runtime; same policy as LSH max_bucket)."""
    from .dedup import _cap_groups

    keys = list(group_cols)
    g = events.select(*keys, F.col(node_col).alias("n")).distinct()
    g = _cap_groups(g, keys, cap)
    a, b = g.alias("a"), g.alias("b")
    return (
        a.join(b, keys)
        .filter(F.col("a.n") < F.col("b.n"))
        .select(F.col("a.n").alias("u"), F.col("b.n").alias("v"))
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """One row (n_nodes, n_edges, n_triangles) for an undirected simple
    graph given as distinct (u < v) edges.

    Degree-oriented counting (the MapReduce-era standard — Suri &
    Vassilvitskii, WWW'11 "Counting Triangles and the Curse of the Last
    Reducer"): orient every edge from the π-smaller endpoint, π =
    (degree, id) lexicographic. Every triangle is counted exactly once
    as a wedge b←a→c (π(b) < π(c)) closed by oriented edge b→c, and —
    the scale point — every out-neighborhood is O(√m), so the wedge
    self-join's per-key fan-out is bounded even on power-law graphs
    where the naive a<b<c join puts a hub's entire neighborhood² in one
    task. Three equi-joins, no Python, exact integers — the DuckDB
    oracle runs the identical orientation."""
    both = edges.select(F.col("u").alias("n")).union(
        edges.select(F.col("v").alias("n"))
    )
    deg = both.groupBy("n").agg(F.count("*").alias("d"))
    e = (
        edges.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    )
    w1 = oriented.select("src", F.col("dst").alias("b"), F.col("ddst").alias("db"))
    w2 = oriented.select("src", F.col("dst").alias("c"), F.col("ddst").alias("dc"))
    wedges = (
        w1.join(w2, "src")
        .filter(
            (F.col("db") < F.col("dc"))
            | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
        )
        .select("b", "c")
    )
    closed = wedges.join(
        oriented.select(F.col("src").alias("b"), F.col("dst").alias("c")),
        ["b", "c"],
        "left_semi",
    )
    # scalar aggregates assembled via crossJoin of one-row frames (the
    # repo's KMV/BM25 pattern — no driver collect)
    tri = closed.agg(F.count("*").alias("n_triangles"))
    ne = edges.agg(F.count("*").alias("n_edges"))
    nn = deg.agg(F.count("*").alias("n_nodes"))
    return nn.crossJoin(ne).crossJoin(tri)


def resolve_pointer_chains(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """Multi-hop redirect-chain resolution by pointer doubling: every
    node's final destination within `max_hops` redirects, with the exact
    hop count and a resolved/cycle-or-truncated flag.

    The reference resolves ONE redirect hop with a regex on the fetched
    page (/root/reference/oa_spider/utils.py `redirect_url`, consumed at
    oa.py download time); a real crawl sees 301→302→meta-refresh chains
    and redirect LOOPS, and the frontier must know each URL's terminal
    identity before the seen-set/dedup pass. The textbook loop is "follow
    one hop per iteration" — O(max_hops) joins. Pointer doubling (the
    PRAM/parallel-BFS trick: compose the partial mapping with itself,
    f ← f∘f) needs only ceil(log2(max_hops)) self-joins, each a key
    equi-join on node id — at 10^10 URLs that's 3 shuffles instead of 8,
    and every shuffle moves only (node, reach, steps) triples, never
    payloads.

    Semantics (`edges` is a FUNCTION: at most one `dst` per `src`):
    * terminal nodes (no outgoing edge) are fixed points with step
      contribution 0, so hop counts saturate exactly at chain length;
    * `max_hops` must be a power of two: after K=log2(max_hops)
      doublings the mapping is exactly g^max_hops, so a node still on a
      non-terminal (cycle, or a chain longer than the budget) reports
      hops == max_hops and resolved = 0 — bit-identical to a bounded
      recursive walk, which is what the DuckDB oracle runs.
    * Lineage doubles per iteration (2^K base scans); K=3 is fine
      inline — for deep budgets stage rounds to parquet like
      dedup.connected_components does.

    Output: (node, final_node, hops, resolved) for every node appearing
    as a src or dst.
    """
    if max_hops < 1 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError("max_hops must be a power of two >= 1")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    base = nodes.join(
        edges.select(F.col("src").alias("node"), "dst"), "node", "left"
    ).select(
        "node",
        F.coalesce("dst", F.col("node")).alias("reach"),
        F.when(F.col("dst").isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("steps"),
    )
    g = base
    hop = 1
    while hop < max_hops:
        m = g.select(
            F.col("node").alias("reach"),
            F.col("reach").alias("reach2"),
            F.col("steps").alias("steps2"),
        )
        g = g.join(m, "reach").select(
            "node",
            F.col("reach2").alias("reach"),
            (F.col("steps") + F.col("steps2")).alias("steps"),
        )
        hop *= 2
    term = base.select(F.col("node").alias("reach"), F.col("steps").alias("_tsteps"))
    return g.join(term, "reach").select(
        "node",
        F.col("reach").alias("final_node"),
        F.col("steps").alias("hops"),
        F.when(F.col("_tsteps") == 0, 1).otherwise(0).cast("int").alias("resolved"),
    )


def bfs_depths(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 6,
) -> DataFrame:
    """Crawl-depth labeling: minimum link distance from the seed set
    for every reachable page, bounded by `max_hops` — the classic
    frontier prioritization signal (breadth tiers: depth-0 seeds,
    their direct links, two hops out, …) and the input to any
    "crawl no deeper than k" policy. `edges` is a general multigraph
    (src, dst — duplicates and cycles welcome), `seeds` a (node)
    table; X85's pointer doubling does NOT apply here because these
    edges are not a function (a page links many pages), and doubling
    a relation squares its size.

    Delta BFS, the scalable formulation: the per-hop join runs on the
    NEWLY-discovered frontier only, never the full reached set —
    hop h is frontier⋈edges (equi-join on src) → distinct dst →
    anti-join against everything already labeled. Each shuffle moves
    (node) keys only; the distinct collapses hub fan-out before the
    anti-join; total work is O(edges-within-horizon), the same bound
    sequential BFS gets. Each layer is persisted the moment the
    early-exit probe (`isEmpty`) materializes it — it is reused three
    times (next hop's join, the anti-join's known set, the final
    union), and without the cache layer h's plan re-runs every layer
    below it. Hops are bounded and small (a crawl cares about
    single-digit depths), so the bounded cache footprint — node ids
    only, never payloads — and the growing lineage both stay
    harmless; for deep budgets stage rounds to parquet the way
    dedup.connected_components does.

    Output: (node, depth) for every node reachable within max_hops;
    seeds report depth 0 whether or not they appear in the edge set.
    Bit-identical to a bounded recursive walk taking min(depth) —
    which is exactly what the DuckDB oracle runs."""
    seed_nodes = seeds.select("node").distinct()
    frontier = seed_nodes
    known = seed_nodes
    layers = [seed_nodes.withColumn("depth", F.lit(0).cast("long"))]
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(known, "node", "left_anti")
        ).persist()  # materialized by the isEmpty probe; reused 3x
        if nxt.isEmpty():
            break
        layers.append(nxt.withColumn("depth", F.lit(hop).cast("long")))
        known = known.union(nxt)
        frontier = nxt
    result = layers[0]
    for layer in layers[1:]:
        result = result.union(layer)
    return result


def host_reciprocity(
    links: DataFrame,
    min_links: int = 10,
    min_reciprocity_milli: int = 600,
) -> DataFrame:
    """Nepotistic-linking detector over host-level link edges — heavily
    RECIPROCAL high-volume host pairs are the classic link-farm /
    link-exchange signature (one-directional volume is just popularity;
    balance is the tell). links: (src_host, dst_host) rows with
    multiplicity, self-pairs ignored. Per unordered pair:
    reciprocity_milli = 2000·min(a→b, b→a) div (a→b + b→a) — 0 for
    one-sided, 1000 for perfectly balanced — flagged when volume and
    balance both clear their floors.

    Scale shape: one (src,dst) groupBy collapses the edge list to pair
    counts, then the unordered fold is a conditional re-aggregation on
    the sorted key — no self-join, no window."""
    c = (
        links.filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n"))
    )
    ha = F.least("src_host", "dst_host")
    hb = F.greatest("src_host", "dst_host")
    folded = c.select(
        ha.alias("host_a"),
        hb.alias("host_b"),
        F.when(F.col("src_host") == ha, F.col("n")).otherwise(0).alias("_ab"),
        F.when(F.col("src_host") == hb, F.col("n")).otherwise(0).alias("_ba"),
    ).groupBy("host_a", "host_b").agg(
        F.sum("_ab").alias("a_to_b"), F.sum("_ba").alias("b_to_a")
    )
    total = F.col("a_to_b") + F.col("b_to_a")
    rec = F.expr("2000 * least(a_to_b, b_to_a) div (a_to_b + b_to_a)")
    return folded.select(
        "host_a",
        "host_b",
        "a_to_b",
        "b_to_a",
        total.alias("total_links"),
        rec.alias("reciprocity_milli"),
        (
            (total >= min_links) & (rec >= min_reciprocity_milli)
        ).alias("flagged"),
    )
