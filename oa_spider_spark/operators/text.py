"""Text-analysis operators over `documents(doc_id, text, lang, ...)` —
all native column expressions (regex/length/split arithmetic), no Python
in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny stopword list for quality scoring (deterministic, language-neutral
# enough for synthetic data)
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID by script share: cjk / latin / digits/mixed.
    (The reference handles GBK-vs-UTF8 content by site, oa.py:931,963 —
    here script detection is a column expression.)"""
    t = F.col(text_col)
    n = F.length(t)
    cjk = F.length(F.regexp_replace(t, r"[^一-龥]", ""))
    latin = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    pred = (
        F.when(n == 0, "empty")
        .when(cjk / n > 0.3, "cjk")
        .when(latin / n > 0.3, "latin")
        .otherwise("mixed")
    )
    return docs.select("doc_id", pred.alias("pred_lang"))


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (word chunks of ≤4
    chars — a deterministic proxy for BPE token counting)."""
    t = F.trim(F.col(text_col))
    tokens = F.split(t, r"\s+")
    n_tok = F.size(tokens)
    n_sub = F.aggregate(
        tokens, F.lit(0), lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("int")
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_sub.alias("n_subwords"),
        F.length(t).alias("n_chars_calc"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality heuristics: alpha/punct/stopword ratios, mean
    word length, and a 0-1 score."""
    t = F.col(text_col)
    n = F.length(t)
    tokens = F.split(F.lower(F.trim(t)), r"\s+")
    n_tok = F.size(tokens)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(tokens, lambda w: F.array_contains(stop_arr, w)))
    alpha_ratio = F.length(F.regexp_replace(t, "[^A-Za-z]", "")) / n
    punct_ratio = F.length(F.regexp_replace(t, r"[^.!?,;:]", "")) / n
    stop_ratio = n_stop / n_tok
    score = (
        F.least(alpha_ratio * 2, F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.3
    )
    return docs.select(
        "doc_id",
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("quality"),
    )


def fingerprint(
    docs: DataFrame, text_col: str = "text", window: int = 8, portable: bool = False
) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-style): min hash
    over all `window`-grams — one long per doc, shift-robust. Default
    xxhash64 (scale path); portable=True uses the md5-60bit hash so the
    value is reproducible in a DuckDB oracle."""
    from .dedup import md5h60

    t = F.col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - window + 1, F.lit(1)))
    hf = md5h60 if portable else F.xxhash64
    grams = F.transform(idx, lambda i: hf(t.substr(i, F.lit(window))))
    return docs.select("doc_id", F.array_min(grams).alias("fingerprint"))
