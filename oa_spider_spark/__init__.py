"""oa_spider_spark — a from-scratch, PySpark-native URL-frontier + fetch
scheduler with the crawl semantics of the reference ``xavierskip/oa-spider``
(study target at /root/reference, cited by file:line throughout), re-expressed
for a 10^10-URL frontier on a multi-executor Spark cluster.

Design (SURVEY.md §3.4): one crawl round is one DataFrame job::

    frontier scan (partition = salted host)
      -> broadcast-join hosts/politeness + robots gate
      -> Bloom probe (might_contain) -> left_anti vs seen (exact)
      -> priority window: row_number over host <= budget
      -> mapInArrow fetch/decode batch (images + captions)
      -> parse / link-extract -> explode new URLs
      -> appends: fetched, frontier, seen, lineage

Everything is DataFrame/SQL + Arrow-vectorized UDFs; no per-row Python UDFs
anywhere (BASELINE.json input_hint).
"""

__version__ = "0.1.0"
