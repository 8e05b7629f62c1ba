"""Training-pipeline operators (operators/pipeline.py): semantic
invariants the DuckDB oracles can't express — partition-invariance of
the deterministic sampler and quantized centroid, chunk coverage of the
token stream, planted-contamination recall, PII scrub completeness,
session boundary placement — plus the plan guardrails (distributed
top-k, no Python evals in any pipeline plan)."""

import datetime

import numpy as np
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from oa_spider_spark.operators.pipeline import (
    chunk_documents,
    cluster_representatives,
    contamination_check,
    doc_frequency_topk,
    lang_centroid_quantized,
    redact_pii,
    sessionize,
    stratified_sample,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "en", 22),
            (2, "alpha beta gamma delta epsilon", "en", 30),
            (3, "totally different words here", "zh", 28),
            (4, "alpha beta gamma", "en", 16),
            (5, "lone document", "de", 13),
        ],
        "doc_id long, text string, lang string, n_chars long",
    )


def test_cluster_representatives_keep_policy(spark):
    docs = _docs(spark)
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (4, 1)], "doc_id long, component_id long"
    )
    out = {
        r["doc_id"]: r
        for r in cluster_representatives(docs, comp).collect()
    }
    # cluster {1,2,4}: rep = doc 2 (longest); singletons 3 and 5 kept
    assert set(out) == {2, 3, 5}
    assert out[2]["n_members"] == 3 and out[2]["rep_len"] == 30
    assert out[3]["n_members"] == 1 and out[3]["component_id"] == 3


def test_cluster_representatives_tie_breaks_min_doc_id(spark):
    docs = spark.createDataFrame(
        [(7, "x", "en", 10), (9, "y", "en", 10)],
        "doc_id long, text string, lang string, n_chars long",
    )
    comp = spark.createDataFrame(
        [(7, 7), (9, 7)], "doc_id long, component_id long"
    )
    kept = cluster_representatives(docs, comp).collect()
    assert [r["doc_id"] for r in kept] == [7]


def test_stratified_sample_is_partition_invariant(spark):
    """The keep set must be a pure function of the key — identical under
    any repartitioning (the property fraction-sampling lacks)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rates = {"en": 500, "zh": 300}
    a = {r["doc_id"] for r in stratified_sample(docs, rates).collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(docs.repartition(13), rates).collect()
    }
    assert a == b and len(a) > 0


def test_stratified_sample_rate_bounds(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    kept = stratified_sample(docs, {"en": 1000, "zh": 0}).collect()
    langs = {r["lang"] for r in kept}
    assert "zh" not in langs
    n_en_total = docs.filter(F.col("lang") == "en").count()
    n_en_kept = sum(1 for r in kept if r["lang"] == "en")
    assert n_en_kept == n_en_total  # permille 1000 keeps everything


def test_chunks_cover_token_stream_with_stride_overlap(spark):
    docs = _docs(spark)
    chunks = chunk_documents(docs, chunk_tokens=3, stride=2).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, rows in by_doc.items():
        toks = texts[doc_id].split(" ")
        rows.sort(key=lambda r: r["chunk_idx"])
        seen = set()
        for r in rows:
            s = r["start_tok"]
            expect = toks[s : s + 3]
            assert r["chunk_text"].split(" ") == expect
            assert r["n_chunk_tokens"] == len(expect)
            seen.update(range(s, min(s + 3, len(toks))))
        # every token lands in at least one chunk
        assert seen == set(range(len(toks)))


def test_contamination_flags_planted_copy(spark):
    bench = spark.createDataFrame(
        [(0, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight"),  # exact copy
            (2, "completely unrelated words appear in this row"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in contamination_check(probe, bench).collect()}
    assert out[1]["contaminated"] and out[1]["contam_ratio"] == 1.0
    assert not out[2]["contaminated"] and out[2]["n_overlap"] == 0


def test_redact_pii_leaves_no_matches(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b_c9@x.example.com or call 13912345678 now"),
            (2, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 1
    assert "<EMAIL>" in out[1]["redacted"] and "<PHONE>" in out[1]["redacted"]
    assert "@" not in out[1]["redacted"].replace("<EMAIL>", "")
    assert "13912345678" not in out[1]["redacted"]
    assert out[2]["redacted"] == "no pii here at all"


def test_lang_centroid_matches_numpy_and_is_partition_invariant(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = lang_centroid_quantized(docs, emb).collect()
    # numpy twin on the same quantization
    joined = (
        docs.select("doc_id", "lang")
        .join(emb, docs.doc_id == emb.vec_id)
        .select("lang", "embedding")
        .collect()
    )
    sums, counts = {}, {}
    for r in joined:
        q = np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1_000_000)
        key = r["lang"]
        sums[key] = sums.get(key, 0) + q
        counts[key] = counts.get(key, 0) + 1
    for row in out:
        expect = int(sums[row["lang"]][row["dim"]])
        assert row["sum_q"] == expect, (row, expect)
        assert row["n"] == counts[row["lang"]]
    # exact integer math ⇒ identical under repartitioning
    out2 = lang_centroid_quantized(docs.repartition(7), emb.repartition(5)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_sessionize_boundaries(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    events = spark.createDataFrame(
        [
            (1, ts(0), 10),
            (2, ts(30), 10),       # same session (gap 30m < 60m)
            (3, ts(120), 10),      # new session (gap 90m > 60m)
            (4, ts(125), 10),
            (5, ts(0), 20),        # other user: own session numbering
        ],
        "event_id long, ts timestamp_ntz, user_id long",
    )
    out = {
        (r["user_id"], r["session_seq"]): r
        for r in sessionize(events, gap_s=3600).collect()
    }
    assert out[(10, 1)]["n_events"] == 2
    assert out[(10, 2)]["n_events"] == 2
    assert out[(20, 1)]["n_events"] == 1
    assert out[(10, 1)]["duration_us"] == 30 * 60 * 1_000_000
    # sessions don't bleed across users
    assert len(out) == 3


def test_df_topk_is_distributed_topk_and_jvm_only(spark):
    """Top-k must compile to TakeOrderedAndProject (per-partition heaps),
    and no pipeline query may evaluate Python in its plan."""
    df = doc_frequency_topk(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    for name in (
        "q_dedup_keep",
        "q_stratified_sample",
        "q_df_stopwords",
        "q_doc_chunks",
        "q_contamination",
        "q_pii_redact",
        "q_lang_centroid",
        "q_sessionize",
    ):
        p = (
            entry_mod.queries()[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in p, f"{marker} in {name}"


def test_contamination_bench_side_is_broadcast(spark):
    """The benchmark shingle set must broadcast — corpus shingles are
    never shuffled for the join."""
    df = entry_mod.queries()["q_contamination"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_session_window_matches_sessionize(spark):
    """F.session_window (the Structured-Streaming-native sessionizer)
    must produce the same sessions as the window-based sessionize on
    the real event log: same (user, start, n_events) set. The exact-gap
    boundary is pinned below: BOTH split only when gap > g (Spark's
    session window closes at last_event + g inclusive of an event
    landing exactly there), so the two formulations agree everywhere —
    the streaming and batch sessionizers are interchangeable."""
    from pyspark.sql import functions as F

    from oa_spider_spark.operators.pipeline import sessionize

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    base = {
        (r["user_id"], r["start_us"], r["n_events"])
        for r in sessionize(ev, gap_s=21600).collect()
    }
    sw = (
        ev.groupBy(
            "user_id",
            F.session_window(
                F.col("ts").cast("timestamp"), "21600 seconds"
            ).alias("sw"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias(
                "start_us"
            ),
        )
    )
    got = {
        (r["user_id"], r["start_us"], r["n_events"]) for r in sw.collect()
    }
    assert got == base

    # exact-gap boundary: 2 events exactly 10s apart with gap 10s
    two = spark.createDataFrame(
        [(1, 0, "2024-01-01 00:00:00"), (2, 0, "2024-01-01 00:00:10")],
        "event_id long, user_id long, ts string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    assert sessionize(two, gap_s=10).count() == 1  # gap > g only
    assert (
        two.groupBy(
            "user_id", F.session_window("ts", "10 seconds")
        ).count().count()
        == 1
    )  # session_window merges the exact-gap event too


def test_weighted_sample_exactly_k_and_pps(spark):
    """Systematic PPS invariants: Σ n_picks == k exactly on any input;
    a row heavier than W/k is ALWAYS picked (≥1, and ≥2 when > 2W/k);
    zero-weight rows never are; and the result is identical under a
    different partitioning (pure integer arithmetic, no RNG)."""
    from oa_spider_spark.operators.pipeline import systematic_weighted_sample

    rows = [(i, (i * 37) % 900 + (10_000 if i == 421 else 0)) for i in range(800)]
    rows.append((900, 0))  # zero-weight row
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    k = 64
    out = systematic_weighted_sample(df, "n_chars", k=k).collect()
    assert sum(r["n_picks"] for r in out) == k
    by_id = {r["doc_id"]: r["n_picks"] for r in out}
    assert 900 not in by_id  # zero weight
    total = sum(w for _, w in rows)
    assert by_id.get(421, 0) >= (k * 10_000) // total  # heavy row over-picked
    out2 = systematic_weighted_sample(df.repartition(13), "n_chars", k=k).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_kmv_sketch_merge_and_exact_regime(spark):
    """KMV invariants: sketch(A∪B) == min-k of (sketch(A) ∪ sketch(B))
    (mergeability — sketches can be persisted per corpus and combined
    later), and a sketch smaller than k estimates EXACTLY (it saw every
    value)."""
    from oa_spider_spark.operators.sketch import kmv_set_overlap, kmv_sketch

    a = spark.range(0, 5000).selectExpr("id AS key")
    b = spark.range(3000, 9000).selectExpr("id AS key")
    k = 128
    direct = [r["h"] for r in kmv_sketch(a.union(b), "key", k).collect()]
    merged = (
        kmv_sketch(a, "key", k).union(kmv_sketch(b, "key", k))
        .distinct().orderBy("h").limit(k).collect()
    )
    assert direct == [r["h"] for r in merged]
    # exact regime: |A| < k ⇒ est == |A| exactly
    small = spark.range(0, 50).selectExpr("id AS key")
    row = kmv_set_overlap(small, "key", small, "key", k=k).head()
    assert row["a_est_milli"] == 50 * 1000
    assert row["inter_est_milli"] == row["union_est_milli"]  # identical sets


def test_hash_split_stable_under_growth(spark):
    """The property hash splits exist for: a document's split NEVER
    changes when the corpus grows or the partitioning differs — and the
    bucket rates land near 80/10/10."""
    from oa_spider_spark.operators.pipeline import hash_split

    small = spark.range(0, 300).selectExpr("id AS doc_id")
    big = spark.range(0, 3000).selectExpr("id AS doc_id")
    s_small = {r["doc_id"]: r["split"] for r in hash_split(small).collect()}
    s_big = {r["doc_id"]: r["split"] for r in hash_split(big.repartition(7)).collect()}
    assert all(s_big[d] == s for d, s in s_small.items())
    from collections import Counter

    c = Counter(s_big.values())
    assert abs(c["train"] - 2400) < 150 and abs(c["val"] - 300) < 80
    # portable twin assigns by md5h60 — same API, different (documented) hash
    p = hash_split(small, portable=True).collect()
    assert {r["split"] for r in p} == {"train", "val", "test"}


def test_repetition_stats_known_values(spark):
    """Hand-computed fractions: a maximally repetitive doc is dropped, a
    diverse one kept; one-word docs take the n_bigrams=0 branch."""
    from oa_spider_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),           # top word 4/4, bigram 3/3
            (2, "alpha beta gamma delta"),        # all distinct
            (3, "one"),                           # no bigrams
        ],
        "doc_id long, text string",
    )
    # thresholds suit long documents; relax the bigram cap here since a
    # 4-word doc's every bigram is 333 permille by construction
    out = {
        r["doc_id"]: r
        for r in repetition_stats(docs, max_top_bigram=400).collect()
    }
    assert out[1]["top_word_milli"] == 1000 and out[1]["top_bigram_milli"] == 1000
    assert out[1]["distinct_milli"] == 250 and not out[1]["keep"]
    assert out[2]["distinct_milli"] == 1000 and out[2]["keep"]
    assert out[3]["n_words"] == 1 and out[3]["top_bigram_milli"] == 0


def test_grouped_sample_exactly_k_per_group(spark):
    """Every group yields exactly min(k, |group|) rows; small groups
    bypass the cutoff (returned whole); the xxhash64 scale path and a
    different partitioning agree with themselves (determinism)."""
    from oa_spider_spark.operators.pipeline import grouped_sample_exact_k

    rows = [(i, "big") for i in range(2000)] + [(10_000 + i, "tiny") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = grouped_sample_exact_k(df, k=20).collect()
    from collections import Counter

    c = Counter(r["lang"] for r in out)
    assert c == {"big": 20, "tiny": 5}
    assert {r["doc_id"] for r in out if r["lang"] == "tiny"} == {
        10_000 + i for i in range(5)
    }
    again = grouped_sample_exact_k(df.repartition(11), k=20).collect()
    assert sorted((r["doc_id"], r["rank"]) for r in out) == sorted(
        (r["doc_id"], r["rank"]) for r in again
    )


def test_bloom_filter_join_identical_to_plain_join(spark):
    """Semi AND anti variants must be row-identical to the plain join —
    the Bloom only routes rows between the fast path (definite miss)
    and the confirm join (maybe-set). Sized small so false positives
    actually occur and must be caught by the confirm."""
    from oa_spider_spark.operators.pipeline import bloom_filter_join

    big = spark.range(0, 5000).selectExpr("id AS k", "id % 7 AS v")
    keys = spark.range(0, 5000, 3).selectExpr("id AS k")  # every 3rd
    for how in ("left_semi", "left_anti"):
        got = sorted(
            map(tuple, bloom_filter_join(big, keys, "k", how=how, fpp=0.2).collect())
        )
        want = sorted(map(tuple, big.join(keys, "k", how).collect()))
        assert got == want, how


def test_bigram_fluency_ranks_garbled_below_fluent(spark):
    """The filter's reason to exist: a document reusing the corpus's
    common transitions outscores one with the same words in an order
    the corpus never produces."""
    from oa_spider_spark.operators.text import bigram_fluency

    fluent = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [(i, fluent) for i in range(10)]
        + [(100, "dog the over fox lazy brown jumps quick the")],  # same words, shuffled
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["score_micro"] for r in bigram_fluency(docs).collect()}
    assert out[0] > out[100]
    assert out[0] == out[5]  # identical docs score identically


def test_grouped_trend_exact_slopes(spark):
    """Hand-checked slopes in micro-units, including a NEGATIVE slope
    (the floor-vs-truncate divergence case the exact-division trick
    exists for), a constant-x group (NULL), and partition invariance."""
    from oa_spider_spark.operators.pipeline import grouped_trend

    rows = (
        [("up", x, 10 + 3 * x) for x in range(50)]          # slope exactly 3
        + [("down", x, 1000 - 7 * x) for x in range(50)]    # slope exactly -7
        + [("third", x, x // 3) for x in range(30)]         # slope 1/3: floor(1e6/3)
        + [("flat_x", 5, y) for y in range(10)]             # den = 0 → NULL
    )
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r["g"]: r["slope_micro"] for r in grouped_trend(df, "g", "x", "y").collect()}
    assert out["up"] == 3_000_000
    assert out["down"] == -7_000_000
    assert 320_000 <= out["third"] <= 340_000  # ≈ 1/3, floored micro
    assert out["flat_x"] is None
    out2 = {
        r["g"]: r["slope_micro"]
        for r in grouped_trend(df.repartition(13), "g", "x", "y").collect()
    }
    assert out == out2


def test_collocations_exact_lift(spark):
    """Hand fixture with known counts: 'new york' always together,
    'big' spread over many completions. N=12 bigrams total."""
    from oa_spider_spark.operators.text import collocations

    rows = [
        ("new york is big",),       # (new,york) (york,is) (is,big)
        ("new york was big",),      # (new,york) (york,was) (was,big)
        ("new york new york",),     # (new,york) (new,york) (york,new)
        ("big is big",),            # (big,is) (is,big)
    ]
    df = spark.createDataFrame(rows, "text string")
    got = {
        (r.w1, r.w2): (r.c_ab, r.c_a, r.c_b, r.lift_milli)
        for r in collocations(df, min_count=2, min_lift_milli=0).collect()
    }
    # c(new,york)=4, c(new,.)=4, c(.,york)=4, N=11 -> 1000*4*11 div 16 = 2750
    assert got[("new", "york")] == (4, 4, 4, 2750)
    # c(is,big)=2, c(is,.)=2, c(.,big)=3, N=11 -> 22000 div 6 = 3666
    assert got[("is", "big")] == (2, 2, 3, 3666)
    # threshold drops sub-min_count pairs entirely
    assert ("york", "is") not in got
    high = collocations(df, min_count=2, min_lift_milli=3000)
    assert {(r.w1, r.w2) for r in high.collect()} == {("is", "big")}


def test_phrase_match_positions(spark):
    """Hand fixture: overlapping occurrences, decoy prefixes, repeated
    words inside the phrase, and a doc missing one term."""
    from oa_spider_spark.operators.text import phrase_match

    rows = [
        (1, "x alpha beta gamma y"),          # one match at pos 1
        (2, "alpha beta alpha beta gamma"),   # decoy prefix, match at 2
        (3, "alpha beta gamma alpha beta gamma"),  # two matches, first 0
        (4, "alpha gamma beta"),              # all terms, wrong order
        (5, "alpha beta"),                    # missing gamma
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_match(df, ["alpha", "beta", "gamma"]).collect()
    }
    assert got == {1: (1, 1), 2: (1, 2), 3: (2, 0)}

    # a phrase with a repeated word: "a b a" over "a b a b a"
    df2 = spark.createDataFrame([(9, "a b a b a")], "doc_id long, text string")
    got2 = phrase_match(df2, ["a", "b", "a"]).collect()
    assert (got2[0].n_matches, got2[0].first_pos) == (2, 0)


def test_retention_cohorts_matrix(spark):
    """X109: cohort = first-seen week; age-0 cells read 1000; later
    cells count distinct users exactly."""
    import datetime as dt

    from oa_spider_spark.operators.pipeline import retention_cohorts

    def w(k, d=0):  # Monday of week k (+d days)
        return dt.datetime(2024, 1, 1) + dt.timedelta(weeks=k, days=d)

    rows = [
        ("A", w(0)), ("A", w(0, 3)), ("A", w(1)), ("A", w(3)),
        ("B", w(0, 2)),
        ("C", w(1)), ("C", w(2, 4)),
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {
        (r.cohort_week.isocalendar()[:2], r.age_weeks): (
            r.n_active, r.cohort_size, r.retention_milli
        )
        for r in retention_cohorts(ev).collect()
    }
    wk0, wk1 = w(0).isocalendar()[:2], w(1).isocalendar()[:2]
    assert got == {
        (wk0, 0): (2, 2, 1000),
        (wk0, 1): (1, 2, 500),
        (wk0, 3): (1, 2, 500),
        (wk1, 0): (1, 1, 1000),
        (wk1, 1): (1, 1, 1000),
    }


def test_annotator_agreement_kappa(spark):
    """X118: hand-checkable kappa — po 750, pe 500, kappa 500 milli."""
    from oa_spider_spark.operators.pipeline import annotator_agreement

    rows = []
    for item, (la, lb) in enumerate([(0, 0), (0, 0), (1, 1), (1, 0)]):
        rows += [(item, "a", la), (item, "b", lb)]
    labels = spark.createDataFrame(rows, "item_id long, rater string, label long")
    r = annotator_agreement(labels).collect()[0]
    assert (r.n, r.agree) == (4, 3)
    assert (r.po_milli, r.pe_milli) == (750, 500)
    assert r.kappa_milli == 500 and not r.degenerate


def test_dense_vocab_ids_stability(spark):
    """X119: frequent terms get small ids; existing ids never move;
    new terms append after max(vid) in (df DESC, term) order."""
    from oa_spider_spark.operators.pipeline import dense_vocab_ids

    counts = spark.createDataFrame(
        [("x", 5), ("y", 5), ("a", 3), ("b", 1), ("c", 1)],
        "term string, df long",
    )
    first = dense_vocab_ids(counts.filter("df >= 5"))
    ids0 = {r.term: r.vid for r in first.collect()}
    assert ids0 == {"x": 0, "y": 1}
    full = {
        r.term: (r.vid, r.is_new)
        for r in dense_vocab_ids(counts, first.select("term", "vid")).collect()
    }
    assert full == {
        "x": (0, False), "y": (1, False),
        "a": (2, True), "b": (3, True), "c": (4, True),
    }


def test_embedding_drift_isolated_shift(spark):
    """X123: identical snapshots drift 0; a known dim-0 shift on one
    language reads exactly its quantized delta and flags only it."""
    from oa_spider_spark.operators.pipeline import embedding_drift

    docs = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de")], "doc_id long, lang string"
    )
    emb = spark.createDataFrame(
        [(1, [0.5, -0.25]), (2, [0.25, 0.125]), (3, [0.0625, 0.5])],
        "vec_id long, embedding array<double>",
    )
    same = {
        r.lang: (r.l1_micro, r.drifted)
        for r in embedding_drift(docs, emb, emb, threshold_micro=1).collect()
    }
    assert same == {"en": (0, False), "de": (0, False)}
    from pyspark.sql import functions as F2

    shifted = emb.select(
        "vec_id",
        F2.transform(
            "embedding",
            lambda x, i: F2.when(
                (i == 0) & (F2.col("vec_id") < 3), x + F2.lit(0.5)
            ).otherwise(x),
        ).alias("embedding"),
    )
    moved = {
        r.lang: (r.l1_micro, r.max_dim_micro, r.drifted)
        for r in embedding_drift(docs, emb, shifted, threshold_micro=100_000).collect()
    }
    assert moved == {"en": (500_000, 500_000, True), "de": (0, 0, False)}


def test_join_preflight_exact(spark):
    """X124: the preflight's est_out_rows equals the ACTUAL join size;
    the top offender and amplification are exact."""
    from oa_spider_spark.operators.pipeline import join_preflight

    left = spark.createDataFrame([("a",)] * 3 + [("b",), ("c",)], "k string")
    right = spark.createDataFrame([("a",)] * 2 + [("b",)] * 2 + [("d",)], "k string")
    r = join_preflight(left, right, ["k"]).collect()[0]
    actual = left.join(right, "k").count()
    assert r.est_out_rows == actual == 8
    assert (r.n_left, r.n_right, r.n_keys_both) == (5, 5, 2)
    assert (r.max_key_out, r.top_key) == (6, "a")
    assert r.amp_milli == 800


def test_session_attribution_touches(spark):
    """X127: first-touch = session opener; last-touch = prior event or
    'direct' when the purchase opens its session."""
    import datetime as dt

    from oa_spider_spark.operators.pipeline import session_attribution

    t0 = dt.datetime(2024, 1, 1, 12, 0)

    def at(mins):
        return t0 + dt.timedelta(minutes=mins)

    rows = [
        (1, at(0), "u", "view"), (2, at(5), "u", "click"),
        (3, at(10), "u", "purchase"),          # session 1: view -> click -> buy
        (4, at(200), "u", "purchase"),         # session 2 opens with a buy
        (5, at(205), "u", "purchase"),         # same session: prior = purchase
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, event_type string"
    )
    got = {
        r.conversion_id: (r.session_seq, r.first_touch, r.last_touch)
        for r in session_attribution(ev, gap_s=3600).collect()
    }
    assert got == {
        3: (1, "view", "click"),
        4: (2, "purchase", "direct"),
        5: (2, "purchase", "purchase"),
    }


def test_entity_disjoint_split_fence_and_leakage(spark):
    """Every entity lands in exactly one split; a fingerprint planted
    on two hosts that hash to different splits is counted as leaked in
    BOTH splits; an entity-local duplicate is not leakage."""
    from oa_spider_spark.operators.pipeline import entity_disjoint_split

    # find two hosts that land in different splits under the portable hash
    import hashlib

    def bucket(h):
        return int(hashlib.md5(f"esplit:{h}".encode()).hexdigest()[:15], 16) % 100

    hosts = [f"h{i}" for i in range(40)]
    train = [h for h in hosts if bucket(h) < 80]
    other = [h for h in hosts if bucket(h) >= 80]
    assert train and other
    ha, hb = train[0], other[0]
    rows = (
        [(ha, "LEAKED"), (hb, "LEAKED")]          # cross-split dup
        + [(ha, "local"), (ha, "local")]           # same-split dup: clean
        + [(h, f"uniq-{h}") for h in hosts]
    )
    df = spark.createDataFrame(rows, "host string, fp string")
    out = {
        r["split"]: r
        for r in entity_disjoint_split(df, portable=True).collect()
    }
    # fence: each host contributes to exactly one split
    assert sum(r["n_entities"] for r in out.values()) == len(hosts)
    assert sum(r["n_docs"] for r in out.values()) == len(rows)
    # the planted pair leaks into both its splits (counted once per
    # split it appears in); the same-split 'local' dup is NOT leakage
    assert sum(r["leaked_fps"] for r in out.values()) == 2
    assert out["train"]["leaked_fps"] == 1
    # 'local' collapsed to one fingerprint inside train
    train_fps = out["train"]["n_fingerprints"]
    train_docs = out["train"]["n_docs"]
    assert train_docs - train_fps == 1


def test_ngram_novelty_extremes(spark):
    """A candidate that is a verbatim copy of a corpus doc scores 0
    novelty; one sharing no bigram scores 1000; a half-overlap doc
    sits in between and the gram counts are exact."""
    from oa_spider_spark.operators.text import ngram_novelty

    corpus = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    cands = spark.createDataFrame(
        [
            (10, "a b c d e"),     # copy: novelty 0
            (11, "x y z w v"),     # disjoint: novelty 1000
            (12, "a b c x y"),     # grams: ab bc cx xy -> 2 novel of 4
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in ngram_novelty(cands, corpus, gram_words=2).collect()
    }
    assert out[10]["novelty_milli"] == 0 and out[10]["stale"]
    assert out[11]["novelty_milli"] == 1000 and not out[11]["stale"]
    assert out[12]["n_grams"] == 4 and out[12]["n_novel"] == 2
    assert out[12]["novelty_milli"] == 500


def test_k_anonymize_suppression_and_sum(spark):
    """Sub-k combos collapse into one '*' bucket; published counts sum
    to the input row count; a legit combo named '*' stays distinct
    from the suppressed bucket via the flag."""
    from oa_spider_spark.operators.pipeline import k_anonymize

    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 2      # y is sub-k
        + [("b", "x")] * 7 + [("c", "z")] * 1     # z is sub-k
        + [("*", "*")] * 6                        # legit literal combo
    )
    df = spark.createDataFrame(rows, "g string, h string")
    out = k_anonymize(df, quasi_cols=["g", "h"], k=5).collect()
    assert sum(r["n"] for r in out) == len(rows)
    supp = [r for r in out if r["suppressed"]]
    assert len(supp) == 1 and supp[0]["n"] == 3
    assert supp[0]["g"] == "*" and supp[0]["h"] == "*"
    legit = [r for r in out if not r["suppressed"] and r["g"] == "*"]
    assert len(legit) == 1 and legit[0]["n"] == 6


def test_release_diff_statuses_and_tokens(spark):
    """Hand releases: one added, one removed, one changed (counted
    under its NEW language), one unchanged; token deltas exact."""
    from oa_spider_spark.operators.pipeline import release_diff

    old = spark.createDataFrame(
        [
            (1, "en", "one two three"),
            (2, "en", "to be removed"),
            (3, "en", "will change soon"),
            (4, "de", "stays the same"),
        ],
        "doc_id long, lang string, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "en", "one two three"),
            (3, "fr", "changed now entirely different"),
            (4, "de", "stays the same"),
            (5, "de", "brand new doc"),
        ],
        "doc_id long, lang string, text string",
    )
    out = {r["lang"]: r for r in release_diff(old, new).collect()}
    assert out["en"]["n_unchanged"] == 1 and out["en"]["n_removed"] == 1
    assert out["fr"]["n_changed"] == 1          # migrated lang -> new side
    assert out["de"]["n_added"] == 1 and out["de"]["n_unchanged"] == 1
    # fr: old tokens 3 ("will change soon"), new 4
    assert out["fr"]["tokens_old"] == 3 and out["fr"]["tokens_new"] == 4
    assert out["fr"]["token_delta"] == 1
    assert out["en"]["token_delta"] == -3       # removed doc's tokens


def test_grouped_topk_skew_and_ties(spark):
    """Exact per-group top-k under heavy group-size skew and a
    degenerate all-ties group; ranks break ties by id ascending."""
    from oa_spider_spark.operators.pipeline import grouped_topk

    rows = (
        [("big", i, (i * 7919) % 100000) for i in range(2000)]
        + [("small", i, i * 10) for i in range(3)]
        + [("ties", i, 42) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "g string, id long, score long")
    out = grouped_topk(
        df, group_cols=["g"], score_col="score", id_col="id", k=4
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["g"], []).append((r["rank"], r["id"], r["score"]))
    for g in got:
        got[g].sort()
    # brute-force expectation
    import collections
    exp = collections.defaultdict(list)
    for g, i, s in rows:
        exp[g].append((-s, i))
    for g in exp:
        want = [
            (rk + 1, i, -ns)
            for rk, (ns, i) in enumerate(sorted(exp[g])[:4])
        ]
        assert got[g] == want, (g, got[g][:5], want)
    assert len(got["small"]) == 3  # groups smaller than k return all
