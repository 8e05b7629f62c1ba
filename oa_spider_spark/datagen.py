"""Deterministic synthetic web universe.

The reference crawls live portals over HTTP (`oa.py` session calls); the
sandbox has no network, and BASELINE.json mandates deterministic tests, so
fetching is replaced by a *pure function of the canonical URL* — the same
function drives the Spark `mapInArrow` fetch stage AND the pure-Python
reference simulator (`sim.py`), which is what makes crawl-order /
seen-set / payload equivalence checkable bit-for-bit.

Everything is seeded from ``zlib.crc32`` of the URL — no wall clock, no
global RNG state (SURVEY.md F11 note: timestamps are data).

Universe shape:
  * ``n_hosts`` hosts, ``h000.example.org`` ...; one is deliberately hot
    (a large share of seed URLs) to exercise skew handling.
  * every URL is ``http://<host>/<kind>/<n>`` with kind in {doc, mail}
    (docs-then-mails ordering, reference oa.py:455).
  * fetch(url) returns an image payload (png = lossless / jpeg = lossy
    stand-in), a caption exercising `clean_filename` chars, outlinks, and
    a status drawn from the reference's retry taxonomy (run.py:14-41):
    ok / retry (transient, succeeds on a later attempt) / failed (fatal).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

import numpy as np

from .kernels.codec import average_hash, encode_image

GLOBAL_SEED = 42

# deterministic per-URL failure taxonomy (reference run.py:23-39:
# ReadTimeout -> retry; ConnectionError/LoginFail -> fatal)
RETRY_MOD = 17  # ~6% of URLs error transiently on their first attempt
FATAL_MOD = 97  # ~1% of URLs are permanently broken
# Timeout discipline (T3, reference oa.py:22 `timeout=` + run.py:23-27
# ReadTimeout handling): every fetch has a deterministic simulated service
# time; past config.FETCH_TIMEOUT_MS the fetch is abandoned — no payload,
# status 'retry', reason 'timeout' — and rides the same attempt+1 /
# dead-letter machinery as transient errors.
SLOW_MOD = 23    # ~4%: congested on the FIRST attempt only (recovers on retry)
STALL_MOD = 211  # ~0.5%: stalls on EVERY attempt -> dead-letter via MAX_ATTEMPTS
BASE_MS_MOD = 180  # fast-path service time spread: 20..199 ms

_CJK = "通知文件公告会议培训报告批复函"
_MESSY = ['<', '>', ':', '"', '/', '\\', '|', '?', '*', '\n', '.', '。']


def url_of(host: str, kind: str, n: int) -> str:
    return f"http://{host}/{kind}/{n}"


def canon_of(url: str) -> str:
    """Python twin of frontier/canon.py::canonicalize_url for the
    simulator — must agree with the Column expression (tested)."""
    no_frag = url.split("#", 1)[0]
    if "://" in no_frag:
        scheme, rest = no_frag.split("://", 1)
    else:
        scheme, rest = no_frag, no_frag
    scheme = scheme.lower()
    hostport = rest.split("/", 1)[0].split("?", 1)[0].lower()
    host = hostport
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    pathq = rest[len(hostport):]
    path = pathq.split("?", 1)[0]
    if "?" in pathq:
        q = pathq.split("?", 1)[1]
        sorted_q = "&".join(sorted(q.split("&")))
    else:
        sorted_q = ""
    out = f"{scheme}://{host}{path or '/'}"
    if "?" in pathq and sorted_q:
        out += "?" + sorted_q
    return out


def _seed_of(url_canon: str) -> int:
    return (zlib.crc32(url_canon.encode("utf-8")) ^ GLOBAL_SEED) & 0x7FFFFFFF


def host_index(host: str) -> int:
    return int(host.split(".", 1)[0][1:])


from functools import lru_cache


@lru_cache(maxsize=32)
def hosts(n_hosts: int) -> tuple[str, ...]:
    # tuple, not list: lru_cache returns the SAME object to every caller,
    # so a mutable list would let one caller's sort/append corrupt every
    # subsequent fetch_url host assignment process-wide.
    return tuple(f"h{i:03d}.example.org" for i in range(n_hosts))


def seed_frontier_rows(n_urls: int, n_hosts: int = 20, hot_share: float = 0.5):
    """Seed list: dicts shaped like FIXTURES.md §2 frontier rows.

    ``hot_share`` of the URLs land on host 0 (the hot host). priority and
    created_time (epoch ms, data not wall-clock) derive from the URL seed.
    Docs-then-mails: kind from n%3 (2 docs : 1 mail).
    """
    hs = hosts(n_hosts)
    rows = []
    for n in range(n_urls):
        s = _seed_of(f"seed:{n}")
        if (s % 1000) / 1000.0 < hot_share:
            host = hs[0]
        else:
            host = hs[1 + s % (n_hosts - 1)]
        kind = "doc" if n % 3 else "mail"
        url = url_of(host, kind, n)
        uc = canon_of(url)
        us = _seed_of(uc)
        rows.append(
            dict(
                url=url,
                kind=kind,
                priority=us % 100,
                created_ms=1_600_000_000_000 + (us % 10_000_000),
                depth=0,
                attempt=0,
            )
        )
    return rows


def seed_frontier_df(
    spark, n_urls: int, n_hosts: int = 20, hot_share: float = 0.5,
    round_added: int = 0, partitions: int | None = None,
):
    """Distributed twin of :func:`seed_frontier_rows`: the same seed list
    generated as Column expressions over ``spark.range`` — no driver-side
    row materialization (10^8 seeds never fit through createDataFrame).
    `F.crc32` is the same CRC-32 as ``zlib.crc32``; equality with the
    Python generator is pinned by tests/test_frontier.py."""
    from pyspark.sql import functions as F

    from .frontier.canon import with_url_columns

    nparts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_urls, 1, nparts).select(F.col("id").alias("n"))
    s = (
        F.crc32(F.encode(F.concat(F.lit("seed:"), F.col("n").cast("string")), "utf-8"))
        .bitwiseXOR(F.lit(GLOBAL_SEED))
        .bitwiseAND(F.lit(0x7FFFFFFF))
    )
    hidx = F.when(s % 1000 < int(hot_share * 1000), F.lit(0)).otherwise(
        (1 + s % (n_hosts - 1)).cast("int")
    )
    host = F.concat(F.lit("h"), F.lpad(hidx.cast("string"), 3, "0"), F.lit(".example.org"))
    kind = F.when(F.col("n") % 3 == 0, F.lit("mail")).otherwise(F.lit("doc"))
    url = F.concat(
        F.lit("http://"), host, F.lit("/"), kind, F.lit("/"), F.col("n").cast("string")
    )
    # canon_of(url) == url for seed URLs (already canonical), so the
    # priority seed is crc32 of the url itself.
    us = (
        F.crc32(F.encode(url, "utf-8"))
        .bitwiseXOR(F.lit(GLOBAL_SEED))
        .bitwiseAND(F.lit(0x7FFFFFFF))
    )
    df = base.select(
        url.alias("url"),
        kind.alias("kind"),
        (us % 100).cast("int").alias("priority"),
        (F.lit(1_600_000_000_000) + us % 10_000_000).cast("long").alias("created_ms"),
        F.lit(0).alias("depth"),
        F.lit(0).alias("attempt"),
        F.lit(round_added).alias("round_added"),
    )
    return with_url_columns(df).select(
        "url", "url_canon", "url_hash", "host", "kind",
        "priority", "created_ms", "depth", "attempt", "round_added",
    )


@dataclass
class FetchResult:
    status: str  # ok | retry | failed
    bytes: bytes | None
    w: int
    h: int
    fmt: str
    caption: str
    phash: int
    links: list[str]
    elapsed_ms: int = 0  # simulated service time, capped at FETCH_TIMEOUT_MS
    reason: str = ""     # '' (ok) | 'transient' | 'timeout' | 'connect_error'


def synth_caption(seed: int) -> str:
    """Caption with CJK + filename-hostile chars (FIXTURES.md §1).

    PCG64, not RandomState: MT19937's 624-word seeding (~90 µs) dominated
    the per-URL synthetic fetch — 3 RNG inits per URL were 27% of fetch
    cost. The char draw is one vectorized integers() call."""
    rng = np.random.Generator(np.random.PCG64(seed))
    # ONE raw draw covers every decision (each integers() call costs
    # ~10 µs of Generator overhead — they were ~15% of fetch cost):
    # [0]=len, [1]=messy count, [2:4]=messy picks, [4:6]=positions,
    # [6:]=caption chars
    raw = rng.integers(0, 1 << 32, size=6 + 13)
    n = 6 + int(raw[0] % 8)
    chars = [_CJK[int(j % len(_CJK))] for j in raw[6 : 6 + n]]
    # sprinkle 0-2 forbidden chars to exercise clean_filename
    for k in range(int(raw[1] % 3)):
        pos = int(raw[4 + k] % (len(chars) + 1))
        chars.insert(pos, _MESSY[int(raw[2 + k] % len(_MESSY))])
    return f"doc{seed % 100000} " + "".join(chars)


def synth_image(seed: int):
    """Deterministic greyscale test pattern: gradient + sinusoid + noise.
    Smooth enough to quantize within the PSNR gate, unique per seed."""
    # h/w from mixed seed bits directly (no Generator overhead), noise in
    # ONE vector draw. The multiplicative mix matters: raw low bits of
    # SMALL SEQUENTIAL seeds (test fixtures) are correlated — unmixed,
    # every fixture image collapsed to one width.
    m = (seed * 2654435761) & 0xFFFFFFFF
    h = 24 + m % 41
    w = 24 + (m >> 8) % 41
    rng = np.random.Generator(np.random.PCG64(seed))
    # the sinusoid varies along x only — compute it on one row and
    # broadcast (same doubles as the full-grid form, w sins not h*w)
    row = 100.0 + 80.0 * np.sin(np.arange(w, dtype=np.float64) / (3 + seed % 7) + seed % 11)
    col = 60.0 * (np.arange(h, dtype=np.float64) / h)
    img = row[None, :] + col[:, None] + rng.integers(-10, 11, (h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


def fetch_url(url_canon: str, attempt: int = 0, n_hosts: int = 20,
              max_depth: int = 2) -> FetchResult:
    """THE deterministic fetch function (stands in for reference
    oa.py:365-397 detail fetch + oa.py:178-213 download).

    * fatal: seed % FATAL_MOD == 0 always fails (ConnectionError class)
    * stall: seed % STALL_MOD == 0 exceeds FETCH_TIMEOUT_MS on EVERY
      attempt -> abandoned at the deadline, dead-letters after
      MAX_ATTEMPTS (reference server that never answers)
    * transient failure: seed % RETRY_MOD == 0 fails while attempt==0
      (reference ReadTimeout -> try2try retry, run.py:23-27)
    * slow: seed % SLOW_MOD == 0 times out on attempt 0 only (congested
      server; the retry goes through)
    * otherwise: an image + caption + 0-3 outlinks on mostly the same
      host (link extraction analog of the parser fan-out, oa.py:583-586).
    """
    from .config import FETCH_TIMEOUT_MS

    s = _seed_of(url_canon)
    base_ms = 20 + (s >> 7) % BASE_MS_MOD
    if s % FATAL_MOD == 0:
        return FetchResult("failed", None, 0, 0, "", "", 0, [], base_ms, "connect_error")
    if s % STALL_MOD == 0:
        return FetchResult("retry", None, 0, 0, "", "", 0, [], FETCH_TIMEOUT_MS, "timeout")
    if s % RETRY_MOD == 0 and attempt == 0:
        return FetchResult("retry", None, 0, 0, "", "", 0, [], base_ms, "transient")
    if s % SLOW_MOD == 0 and attempt == 0:
        return FetchResult("retry", None, 0, 0, "", "", 0, [], FETCH_TIMEOUT_MS, "timeout")
    img = synth_image(s)
    fmt = "png" if s % 2 == 0 else "jpeg"
    payload = encode_image(img, fmt)
    caption = synth_caption(s)
    ph = average_hash(img)
    # outlinks: pure function of the URL seed; depth capped by caller.
    # ONE raw draw covers the count and all per-link decisions.
    rng = np.random.Generator(np.random.PCG64(s ^ 0x5EED))
    raw = rng.integers(0, 1 << 32, size=1 + 3 * 3)
    n_links = int(raw[0] % 4)
    # parse original host/kind/n out of the canonical url
    try:
        rest = url_canon.split("://", 1)[1]
        host, kind, n = rest.split("/")[0], rest.split("/")[1], int(rest.split("/")[2])
    except (IndexError, ValueError):
        host, kind, n = "h000.example.org", "doc", 0
    hs = hosts(n_hosts)
    links = []
    for i in range(n_links):
        same_host = raw[1 + 3 * i] % 10 < 8  # 80% same-host links
        lhost = host if same_host else hs[int(raw[2 + 3 * i] % n_hosts)]
        lkind = "doc" if raw[3 + 3 * i] % 3 else "mail"
        links.append(url_of(lhost, lkind, 1_000_000 + (s % 100_000) * 10 + i))
    h_, w_ = img.shape
    return FetchResult("ok", payload, int(w_), int(h_), fmt, caption, ph, links, base_ms, "")


def link_priority(url_canon: str) -> int:
    return _seed_of(url_canon) % 100


def link_created_ms(url_canon: str) -> int:
    return 1_600_000_000_000 + (_seed_of(url_canon) % 10_000_000)
