"""Production HTTP transport, pinned against a LOCAL http.server —
real sockets, zero external network: status taxonomy (2xx/4xx/5xx/
timeout), image decode on the wire format, HTML link extraction via
the shared DOM parser, and the full Arrow fetch_stage swap."""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from oa_spider_spark.frontier.transport import http_fetch_batch_fn
from oa_spider_spark.kernels.codec import encode_image


@pytest.fixture(scope="module")
def http_server():
    img = np.arange(0, 32 * 48, dtype=np.int64).reshape(32, 48) % 256
    png = encode_image(img.astype(np.uint8), "png")
    html = (
        b"<html><body><a href='/docs/a.pdf'>a</a>"
        b"<a href='/word/view?id=9'>preview</a>"
        b"<a href='/doc/7'>seven</a></body></html>"
    )

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/img.png":
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.end_headers()
                self.wfile.write(png)
            elif self.path == "/page.html":
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(html)
            elif self.path == "/flaky":
                self.send_response(503)
                self.end_headers()
            elif self.path == "/gone":
                self.send_response(404)
                self.end_headers()
            else:
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"plain")

        def log_message(self, *a):  # silence
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _batch(urls):
    import pyarrow as pa

    return pa.RecordBatch.from_arrays(
        [pa.array(urls, pa.string()), pa.array([0] * len(urls), pa.int32())],
        names=["url_canon", "attempt"],
    )


def test_http_fetch_taxonomy_and_payloads(http_server):
    fn = http_fetch_batch_fn(timeout_s=5.0, max_workers=4)
    out = fn(
        _batch(
            [
                f"{http_server}/img.png",
                f"{http_server}/page.html",
                f"{http_server}/flaky",
                f"{http_server}/gone",
                "http://127.0.0.1:1/unreachable",  # nothing listens on :1
            ]
        )
    )
    rows = out.to_pylist()
    by = {r["url_canon"].rsplit("/", 1)[-1]: r for r in rows}
    img = by["img.png"]
    assert img["status"] == "ok" and (img["w"], img["h"]) == (48, 32)
    assert img["fmt"] == "png" and img["phash"] is not None
    page = by["page.html"]
    assert page["status"] == "ok"
    # /word/view previews skipped — same DOM rule as the HTML operators
    assert page["links"] == ["/docs/a.pdf", "/doc/7"]
    assert by["flaky"]["status"] == "retry" and by["flaky"]["reason"] == "http_503"
    assert by["gone"]["status"] == "failed" and by["gone"]["reason"] == "http_404"
    assert by["unreachable"]["status"] == "retry"
    assert all(r["elapsed_ms"] is not None for r in rows)


def test_fetch_stage_swaps_to_http_transport(spark, http_server):
    """The whole Arrow stage runs on the HTTP transport with zero
    changes elsewhere — same schema, same downstream columns."""
    from oa_spider_spark.frontier.fetch import fetch_stage

    urls = [f"{http_server}/img.png", f"{http_server}/gone"]
    df = spark.createDataFrame(
        [(u, 0) for u in urls], "url_canon string, attempt int"
    )
    out = fetch_stage(df, fetch_fn=http_fetch_batch_fn(timeout_s=5.0)).collect()
    got = {r["url_canon"].rsplit("/", 1)[-1]: r for r in out}
    assert got["img.png"]["status"] == "ok" and got["img.png"]["w"] == 48
    assert got["img.png"]["nbytes"] > 0
    assert got["gone"]["status"] == "failed"
