"""The URL frontier: canonicalization, seen-set dedup, politeness windows,
the vectorized fetch stage, and crawl-round composition (SURVEY.md §3.4).
"""
