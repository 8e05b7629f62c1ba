"""Production HTTP transport for the fetch stage — the runnable variant
of the connection-pool box in SURVEY §3.4 (reference: one
requests.Session per site + sequential GETs, oa.py:99-106,178-213).

`http_fetch_batch` has the exact contract of
`fetch.synthetic_fetch_batch`: one Arrow RecordBatch of frontier rows
in, the same batch + FETCH_FIELDS out — so
`fetch_stage(selected, fetch_fn=http_fetch_batch_fn(...))` swaps the
synthetic universe for real sockets with zero changes anywhere else
(plumbing, retries, seen-set, lineage, resume all operate on the same
columns).

Transport semantics mapped onto the engine's retry taxonomy (T2/T3):

  HTTP 2xx                          → status ok
  HTTP 5xx / timeout / conn error   → status retry  (transient)
  HTTP 4xx / non-HTTP scheme        → status failed (permanent)

Payload interpretation mirrors the synthetic universe: image bytes
(PNG/FJPG/JPEG magic) decode through kernels.codec for (w, h, fmt,
phash); HTML extracts anchors through the same DOM parser the HTML
operators use (`body a`, /word/view skipped — reference oa.py:775).

Concurrency: one thread pool PER PYTHON WORKER (module-level, lazily
built — the analog of the per-worker connection pool), sized by
`max_workers`; requests within an Arrow batch overlap, batches stream.
Politeness is ALREADY enforced upstream by the budget/ordering stage —
this layer never re-sorts or re-routes, it only honors per-request
timeouts. Everything is stdlib (urllib) — no dependency to install —
and tested against a local http.server fixture
(tests/test_transport.py), so the production path is runnable and
pinned in-sandbox without external network access.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import pyarrow as pa

_POOL: ThreadPoolExecutor | None = None


def _pool(max_workers: int) -> ThreadPoolExecutor:
    global _POOL
    if _POOL is None or _POOL._max_workers != max_workers:
        _POOL = ThreadPoolExecutor(max_workers=max_workers)
    return _POOL


def _classify(code: int) -> str:
    if 200 <= code < 300:
        return "ok"
    if code >= 500:
        return "retry"
    return "failed"


def _fetch_one(url: str, timeout_s: float, headers: dict | None = None) -> dict:
    t0 = time.perf_counter()
    out = {
        "status": "failed", "bytes": None, "w": None, "h": None,
        "fmt": None, "caption": None, "phash": None, "links": [],
        "reason": None,
    }
    try:
        req = urllib.request.Request(
            url, headers={"User-Agent": "oa-spider-spark", **(headers or {})}
        )
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            body = resp.read()
            ctype = resp.headers.get("Content-Type", "")
            out["status"] = _classify(resp.status)
            out["bytes"] = body
    except urllib.error.HTTPError as e:
        out["status"] = _classify(e.code)
        out["reason"] = f"http_{e.code}"
        out["elapsed_ms"] = int((time.perf_counter() - t0) * 1000)
        return out
    except (urllib.error.URLError, TimeoutError, OSError) as e:
        out["status"] = "retry"
        out["reason"] = "timeout" if "timed out" in str(e).lower() else "conn_error"
        out["elapsed_ms"] = int((time.perf_counter() - t0) * 1000)
        return out
    out["elapsed_ms"] = int((time.perf_counter() - t0) * 1000)

    # payload interpretation — same downstream contract as the synthetic
    # universe: images decode to dims + phash, HTML yields links
    from ..kernels.codec import average_hash, decode_image

    try:
        if body[:8] == b"\x89PNG\r\n\x1a\n" or body[:4] == b"FJPG" or body[:3] == b"\xff\xd8\xff":
            img = decode_image(body)
            out["w"], out["h"] = int(img.shape[1]), int(img.shape[0])
            out["fmt"] = "png" if body[:4] == b"\x89PNG"[:4] else "jpeg"
            out["phash"] = int(average_hash(img))
        elif ctype.startswith("text/html") or body[:1] == b"<":
            from ..operators.html import links as dom_links
            from ..operators.html import parse_html

            root = parse_html(body.decode("utf-8", errors="replace"))
            out["links"] = [href for href, _ in dom_links(root, "body a")]
    except Exception:
        # undecodable payload is still a successful FETCH; decode-verify
        # (PSNR kernel) happens downstream where it is observable
        out["reason"] = "decode_error"
    return out


def http_fetch_batch_fn(
    timeout_s: float = 10.0, max_workers: int = 16, headers: dict | None = None
):
    """Returns a batch function with synthetic_fetch_batch's contract,
    fetching over real HTTP. Use:
    `fetch_stage(selected, fetch_fn=http_fetch_batch_fn())`.

    `headers` ride every request — the authenticated-session path passes
    its cookie here (frontier/auth.py::AuthSession.fetch_fn), mirroring
    the reference's post-login `self.session` reuse (oa.py:345+)."""

    def http_fetch_batch(batch: pa.RecordBatch, n_hosts: int = 0) -> pa.RecordBatch:
        from .fetch import FETCH_FIELDS

        urls = batch.column("url_canon").to_pylist()
        results = list(
            _pool(max_workers).map(
                lambda u: _fetch_one(u, timeout_s, headers), urls
            )
        )
        cols = {
            "status": pa.array([r["status"] for r in results], pa.string()),
            "bytes": pa.array([r["bytes"] for r in results], pa.binary()),
            "nbytes": pa.array(
                [0 if r["bytes"] is None else len(r["bytes"]) for r in results],
                pa.int64(),
            ),
            "w": pa.array([r["w"] for r in results], pa.int32()),
            "h": pa.array([r["h"] for r in results], pa.int32()),
            "fmt": pa.array([r["fmt"] for r in results], pa.string()),
            "caption": pa.array([r["caption"] for r in results], pa.string()),
            "phash": pa.array([r["phash"] for r in results], pa.int64()),
            "links": pa.array([r["links"] for r in results], pa.list_(pa.string())),
            "elapsed_ms": pa.array([r["elapsed_ms"] for r in results], pa.int64()),
            "reason": pa.array([r["reason"] for r in results], pa.string()),
        }
        arrays = list(batch.columns) + [cols[f.name] for f in FETCH_FIELDS]
        names = batch.schema.names + [f.name for f in FETCH_FIELDS]
        return pa.RecordBatch.from_arrays(arrays, names=names)

    return http_fetch_batch
