"""Structured Streaming variant of the crawl loop (SURVEY.md §2.10 T1):
continuous frontier ingestion instead of cron-batch rounds.
"""
