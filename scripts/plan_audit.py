#!/usr/bin/env python
"""Physical-plan audit → BENCH/PLANS.md.

For every headline query (bench.py HEADLINE + the flagship selection
path) this captures `.explain("formatted")` and distills the evidence a
100-TB reviewer looks for:

* parquet **PushedFilters** / **ReadSchema** (predicate pushdown, column
  pruning — a scan reading all columns for a 2-column projection is
  wrong);
* **WholeStageCodegen** span count vs total nodes (how much of the plan
  stays JVM-side);
* **Exchange** count and kinds (every shuffle is a cluster-wide barrier
  at scale — fewer, keyed, AQE-coalesced is the goal) and
  **Broadcast** usage for dim-side joins;
* Python boundaries (ArrowEvalPython / MapInArrow / FlatMapGroupsInPandas
  nodes — each one is a deliberate, documented Arrow batch stage, never a
  row-at-a-time BatchEvalPython).

Run: python scripts/plan_audit.py [sf_dir] (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AUDITED = [
    "q_login_envelope",
    "q_session_window",
    "q_bucketed_join",
    "q_crawl_select",
    "q_budget_window",
    "q_topk_priority",
    "q_seen_antijoin",
    "q_digest_collect",
    "q_exact_dedup",
    "q_simhash",
    "q_cosine_topk",
    "q_token_count",
    "q_quality_score",
    "q_sessionize",
    "q_arrays_zip_join",
    "q_html_parse",
    "q_minhash_lsh",
    "q_attachments_join",
    "q_rsa_auth",
    "q_pricing_summary",
    "q_top_revenue",
    "q_event_outliers",
    "q_bm25_topk",
    "q_value_percentiles",
    "q_salted_lang_join",
    "q_hll_distinct",
    "q_asof_prior_click",
    "q_error_window_activity",
    "q_incremental_dedup",
    "q_pagerank",
    "q_cms_token_freq",
    "q_tumbling_rates",
    "q_hll_group_distinct",
    "q_circuit_open",
    "q_uniform_sample",
    "q_embedding_quantize",
    "q_nation_revenue",
    "q_kmv_set_overlap",
    "q_weighted_sample",
    "q_repetition_stats",
    "q_tfidf_top_terms",
    "q_triangle_count",
    "q_hash_split",
    "q_zorder_cluster",
    "q_grouped_sample",
    "q_edit1_titles",
    "q_rollup_orders",
    "q_scd2_history",
    "q_bloom_semi_join",
    "q_knn_classify",
    "q_hopping_rates",
    "q_bigram_fluency",
    "q_grouped_trend",
    "q_new_vs_returning",
    "q_funnel_steps",
    "q_recrawl_schedule",
    "q_merge_upsert",
    "q_crawl_traps",
    "q_hist_quantiles",
    "q_heavy_hitters",
    "q_snapshot_diff",
    "q_pack_bins",
    "q_paragraph_dedup",
    "q_anchor_text",
    "q_prefix_jaccard",
    "q_corpus_pipeline",
    "q_snm_pairs",
    "q_domain_caps",
    # X87-X97: robust outlier census, pointer-doubling redirect chains,
    # temperature allocation, content sniffing, the robots/sitemap text
    # parsers, mirror detection, collocation mining, containment pairs,
    # spurious-param inference, and the RFC 9111 revalidation planner
    "q_mad_outliers",
    "q_redirect_chains",
    "q_temperature_targets",
    "q_content_sniff",
    "q_robots_parse",
    "q_sitemap_parse",
    "q_mirror_hosts",
    "q_pmi_collocations",
    "q_containment_pairs",
    "q_spurious_params",
    "q_revalidation_plan",
    # X98-X103: positional phrase search, bitext URL pairing, HRW sharding,
    # Gopher bitmask rules, repeated-span detection, fetch timeline
    "q_phrase_search",
    "q_bitext_pairs",
    "q_rendezvous_shards",
    "q_gopher_rules",
    "q_repeated_spans",
    "q_fetch_timeline",
    # X104-X107: wildcard robots, dedup audit, saturation, discovery feed
    "q_robots_wildcard",
    "q_dedup_audit",
    "q_host_saturation",
    "q_discovery_feed",
    # X108-X109: cross-doc verbatim spans, cohort retention
    "q_cross_doc_spans",
    "q_retention_cohorts",
    # X110-X115: scheme merge, status drift, sliding HLL, adaptive delay,
    # render routing, charset cascade
    "q_scheme_merge",
    "q_status_drift",
    "q_hll_sliding",
    "q_adaptive_delay",
    "q_render_routing",
    "q_charset_detect",
    # X116-X120: byte budget, canonical chains, kappa, vocab ids, dashboard
    "q_byte_budget",
    "q_canonical_resolution",
    "q_annotator_kappa",
    "q_vocab_ids",
    "q_host_dashboard",
    # X121-X123: table extraction, truncation loss, embedding drift
    "q_table_extract",
    "q_truncation_loss",
    "q_embedding_drift",
    # X124-X129: join preflight, politeness audit, attribution, hreflang,
    # soft-404 (X125 is streaming-only; its batch twin q_status_drift is
    # audited above)
    "q_join_preflight",
    "q_politeness_audit",
    "q_attribution",
    "q_hreflang_audit",
    "q_soft404",
    # X130-X132: JSON-LD harvest, pagination chains, source-dup matrix
    "q_jsonld_harvest",
    "q_pagination_series",
    "q_source_dup_matrix",
    # X133-X137: link reciprocity, fairness, coverage, GC plan, bitext QA
    "q_link_reciprocity",
    "q_fairness",
    "q_coverage_diff",
    "q_gc_plan",
    "q_bitext_qa",
    # X138-X143: entity split, novelty, BFS depths, EWMA alarm, assets,
    # readability
    "q_entity_split",
    "q_ngram_novelty",
    "q_crawl_depths",
    "q_latency_alarm",
    "q_asset_extract",
    "q_readability",
    # X144/X145: IP co-hosting caps, quantization recall
    "q_ip_caps",
    "q_quant_recall",
    # X147/X148: HRW movement audit, mergeable moments ledger
    "q_hrw_movement",
    "q_stats_ledger",
    # X149: k-anonymity suppression
    "q_k_anonymity",
    # X151/X152: priority aging, cluster churn
    "q_priority_aging",
    "q_cluster_churn",
    # X153-X155: heading outline, path rollup, robots revocation feed
    "q_heading_outline",
    "q_path_rollup",
    "q_robots_drift",
    # X156/X157: main-content extraction, code routing
    "q_main_content",
    "q_code_detect",
    # X158-X160: quality classifier, threshold sweep, homograph screen
    "q_quality_classifier",
    "q_threshold_sweep",
    "q_homograph",
    # X161/X162: fluency buckets, corpus datasheet
    "q_perplexity_buckets",
    "q_corpus_datasheet",
    # X163: release diff
    "q_release_diff",
    # X164: grouped top-k
    "q_grouped_topk",
]


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


_PY_NODE_KINDS = (
    "ArrowEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "BatchEvalPython",
)


def summarize(plan: str) -> dict:
    # An executed AQE plan prints BOTH trees ("== Final Plan ==" then
    # "== Initial Plan ==") over one shared numbered-detail section —
    # audit only the node ids that appear in the final tree.
    mfin = re.search(r"== Final Plan ==(.*?)== Initial Plan ==", plan, re.S)
    final_ids = (
        set(map(int, re.findall(r"\((\d+)\)", mfin.group(1)))) if mfin else None
    )
    nodes: list[str] = []
    wsc: set[int] = set()
    ex_kinds: list[str] = []
    scans: list[str] = []
    schemas: list[str] = []
    # detail headers sit at column 0: "(4) HashAggregate [codegen id : 1]"
    for block in re.split(r"^(?=\(\d+\) )", plan, flags=re.M):
        head = re.match(r"\((\d+)\) (\S+)", block)
        if not head:
            continue
        nid, name = int(head.group(1)), head.group(2)
        if final_ids is not None and nid not in final_ids:
            continue
        nodes.append(name)
        cg = re.search(r"\[codegen id : (\d+)\]", block.splitlines()[0])
        if cg:
            wsc.add(int(cg.group(1)))
        if name.startswith("Exchange"):
            kind = re.search(r"Arguments: (\w+)", block)
            ex_kinds.append(kind.group(1) if kind else "?")
        if name.startswith("Scan"):
            pf = re.search(r"PushedFilters: \[([^\]]*)\]", block)
            if pf and pf.group(1).strip():
                scans.append(pf.group(1))
            rs = re.search(r"ReadSchema: struct<([^>]*)>", block)
            if rs:
                schemas.append(rs.group(1))
    return {
        "nodes": len(nodes),
        "codegen_spans": len(wsc),
        "exchanges": sum(n.startswith("Exchange") for n in nodes),
        "exchange_kinds": ex_kinds,
        "pushed_filters": scans,
        "read_schemas": schemas,
        "python_stages": [n for n in nodes if any(k in n for k in _PY_NODE_KINDS)],
        "broadcasts": sum("Broadcast" in n for n in nodes),
        "row_python": sum("BatchEvalPython" in n for n in nodes),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

    from oa_spider_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(cores=int(os.environ["SPARK_GRAFT_CPUS"]), app_name="plan_audit")
    queries = entry_mod.queries()

    row_python_hits: list[str] = []
    out = [
        "# Physical-plan audit (generated by scripts/plan_audit.py)",
        "",
        f"Input: `{sf_dir}`. Plans are identical in shape at any SF — Catalyst",
        "chooses the same operators; only AQE's runtime coalescing differs.",
        "",
        "| query | plan nodes | codegen spans | exchanges | broadcast | Arrow/Pandas stages | row-Python |",
        "|---|---|---|---|---|---|---|",
    ]
    details: list[str] = []
    for name in AUDITED:
        df = queries[name](spark, sf_dir)
        # execute THIS DataFrame's QueryExecution first (collect, not
        # count — count builds a different plan): under AQE the
        # pre-execution plan is isFinalPlan=false with no codegen
        # annotation; after execution the same handle explains the final
        # plan actually run
        df.collect()
        s = summarize(formatted_plan(df))
        if s["row_python"]:
            row_python_hits.append(f"{name}: {s['row_python']} BatchEvalPython node(s)")
        out.append(
            f"| {name} | {s['nodes']} | {s['codegen_spans']} | {s['exchanges']} "
            f"({', '.join(sorted(set(s['exchange_kinds']))) or '—'}) | {s['broadcasts']} "
            f"| {len(s['python_stages'])} | **{s['row_python']}** |"
        )
        details.append(f"### {name}\n")
        if s["pushed_filters"]:
            details.append(
                "PushedFilters: " + "; ".join(f"`[{f}]`" for f in s["pushed_filters"]) + "\n"
            )
        if s["read_schemas"]:
            details.append(
                "ReadSchema (pruned): "
                + "; ".join(f"`{c}`" for c in s["read_schemas"])
                + "\n"
            )
        if s["python_stages"]:
            details.append(
                "Arrow-batch stages: " + ", ".join(s["python_stages"]) + "\n"
            )
    # --- bucketed-layout selection plan (storage-level scale strategy) ---
    # seen + frontier CLUSTERED BY url_hash: the round's selection
    # (full-frontier dedup + exact seen anti-join) must plan with ZERO
    # Exchange nodes — the 100-TB difference between re-shuffling the
    # corpus every round and reading co-located buckets.
    import tempfile

    from pyspark.sql import functions as F

    from oa_spider_spark import datagen
    from oa_spider_spark.frontier.round import (
        dedup_frontier,
        run_crawl,
        seed_catalog,
    )
    from oa_spider_spark.frontier.seen import anti_join_seen
    from oa_spider_spark.tables import SCALE_LAYOUT, Catalog

    with tempfile.TemporaryDirectory(prefix="plan_audit_cat_") as root:
        cat = Catalog(root, bucketed=SCALE_LAYOUT)
        seed_catalog(spark, cat, datagen.seed_frontier_rows(2000, n_hosts=10))
        run_crawl(spark, cat, 2, n_hosts=10, default_budget=200)
        sel = anti_join_seen(
            dedup_frontier(cat.read(spark, "frontier")).filter(F.col("depth") <= 2),
            cat.read(spark, "seen"),
            use_bloom=False,
        )
        sel.collect()
        s = summarize(formatted_plan(sel))
        exec_plan = sel._jdf.queryExecution().executedPlan().toString()
        n_bucketed = exec_plan.count("Bucketed: true")
        bucketed_section = [
            "## Bucketed-layout selection (seen + frontier CLUSTERED BY url_hash)",
            "",
            "Round selection = full-frontier dedup (groupBy url_hash) + exact",
            "seen left_anti, over `Catalog(root, bucketed=SCALE_LAYOUT)`:",
            "",
            f"* Exchange nodes: **{s['exchanges']}** (target 0 — both sides read",
            "  co-located buckets; the only shuffle left in selection is the",
            "  host-keyed budget window, which is keyed on a different column)",
            f"* bucketed scans: **{n_bucketed}** (frontier + seen)",
            f"* plan nodes: {s['nodes']}, codegen spans: {s['codegen_spans']}",
            "",
            "Guardrail: tests/test_seen_index.py::"
            "test_bucketed_selection_plan_has_zero_url_hash_exchanges.",
            "",
        ]
        cat.cleanup_session(spark)
        if s["exchanges"] != 0:
            row_python_hits.append(
                f"bucketed selection plan has {s['exchanges']} exchanges (want 0)"
            )

    out += [
        "",
        "`row-Python` counts BatchEvalPython (row-at-a-time F.udf) nodes —",
        "**must be 0 everywhere** (guardrail: tests/test_plans.py).",
        "",
        *bucketed_section,
        "## Per-query scan/pushdown evidence",
        "",
        *details,
    ]
    dest = os.path.join(REPO, "BENCH", "PLANS.md")
    with open(dest, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote {dest}")
    if row_python_hits:
        print("PLAN AUDIT FAILURES:", row_python_hits)
        sys.exit(1)


if __name__ == "__main__":
    main()
