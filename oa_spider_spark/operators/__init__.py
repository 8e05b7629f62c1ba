"""Large-scale training-data pipeline operators: deduplication families,
similarity search, text analysis, and multimodal (binary payload)
plumbing — first-class components alongside the crawl engine.
"""
