"""Selector-engine unit tests (no Spark): the DOM builder and CSS-subset
selectors in operators/html.py must reproduce the reference's PyQuery
shapes (id select oa.py:390, .class li cards oa.py:806-817, descendant
anchors + /word/view skip oa.py:771-776, nth-child chains oa.py:768,
922-941).
"""

from oa_spider_spark.operators.html import links, node_text, parse_html, select

PAGE = """
<html><body>
<div id="weaDocDetailHtmlContent"><p>hello  world</p><b>doc 7</b></div>
<center>
  <a href="/word/view?id=7">preview</a>
  <a href="/docs/file_7.pdf"></a>
  <a href="/docs/extra.doc">extra</a>
</center>
<ul class="ul1">
  <li><a href="/doc/7-0">card 0</a></li>
  <li><a href="/doc/7-1">card 1</a></li>
</ul>
<ul class="other"><li><a href="/nope">x</a></li></ul>
<table>
  <tr><td>h1</td><td>h2</td></tr>
  <tr><td>src</td><td>42</td></tr>
</table>
</body></html>
"""


def test_id_select_and_text_collapse():
    root = parse_html(PAGE)
    hits = select(root, "#weaDocDetailHtmlContent")
    assert len(hits) == 1
    # PyQuery .text() semantics: child text concatenated, ws-collapsed
    assert node_text(hits[0]) == "hello world doc 7"


def test_class_descendant_select():
    root = parse_html(PAGE)
    assert len(select(root, ".ul1 li a")) == 2
    assert len(select(root, "ul li a")) == 3  # both lists
    assert [n.attrs["href"] for n in select(root, ".ul1 li a")] == [
        "/doc/7-0", "/doc/7-1",
    ]


def test_nth_child_chain():
    root = parse_html(PAGE)
    cell = select(root, "table tr:nth-child(2) td:nth-child(2)")
    assert len(cell) == 1 and node_text(cell[0]) == "42"
    # child combinator
    assert len(select(root, "table > tr")) == 2
    assert select(root, "ul.ul1 > li:nth-child(1) a")[0].attrs["href"] == "/doc/7-0"


def test_links_skip_preview_and_name_fallback():
    root = parse_html(PAGE)
    ls = links(root, "center a")
    assert ls == [("/docs/file_7.pdf", ""), ("/docs/extra.doc", "extra")]


def test_malformed_html_is_lenient():
    # unclosed li / stray end tags must not blow up or lose anchors
    root = parse_html("<ul class='ul1'><li><a href='/a'>1<li><a href='/b'>2</ul></div>")
    hrefs = [n.attrs["href"] for n in select(root, ".ul1 a")]
    assert hrefs == ["/a", "/b"]


def test_attribute_without_value_and_void_tags():
    root = parse_html('<div id="d"><img src="x"><br><a href="/z" data-x>t</a></div>')
    assert select(root, "#d a")[0].attrs["href"] == "/z"
    assert node_text(select(root, "#d")[0]) == "t"


def test_render_routing_signals(spark):
    """X114: SPA-mount-with-no-text and script-dominated pages route to
    render; server-rendered pages with markers or scripts stay static."""
    from oa_spider_spark.operators.html import render_routing

    long_text = "w" * 500
    rows = [
        (1, f"<html><body><p>{long_text}</p></body></html>"),
        (2, '<html><body><div id="root"></div><p>tiny</p></body></html>'),
        (3, f'<html><body><div id="app"></div><p>{long_text}</p></body></html>'),
        (4, '<html><body><p>hi</p><script>"' + "x" * 900 + '"</script>'
            "<script src=\"a.js\"></script></body></html>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r.doc_id: (r.script_blocks, r.spa_marker, r.route)
        for r in render_routing(df).collect()
    }
    assert got[1] == (0, False, "static")
    assert got[2] == (0, True, "render")    # mount + no server text
    assert got[3] == (0, True, "static")    # mount but real content
    assert got[4] == (2, False, "render")   # script-dominated


def test_extract_tables_cells(spark):
    """X121: multi-table indexing, th+td cells, inner tags stripped,
    whitespace collapsed."""
    from oa_spider_spark.operators.html import extract_tables

    html = (
        "<table><tr><th>A</th><td> b <i>c</i> </td></tr>"
        "<tr><td>d</td></tr></table><p>x</p>"
        "<TABLE><tr><td>e</td></tr></TABLE>"
    )
    df = spark.createDataFrame([(7, html)], "doc_id long, html string")
    got = {
        (r.table_idx, r.row_idx, r.col_idx): r.cell_text
        for r in extract_tables(df).collect()
    }
    assert got == {
        (0, 0, 0): "A",
        (0, 0, 1): "b c",
        (0, 1, 0): "d",
        (1, 0, 0): "e",
    }


def test_soft404_detect_paths(spark):
    """X129: phrase path, dead-end path, hard-404 exclusion, healthy."""
    from oa_spider_spark.operators.html import soft404_detect

    long_p = "<p>" + " ".join(["w"] * 20) + "</p>"
    rows = [
        ("/ok", 200, f"{long_p}<a href='/x'>n</a>"),
        ("/phrase", 200, "<h1>Page Not Found</h1>"),
        ("/stub", 200, "<p>tiny stub</p>"),
        ("/hard", 404, "<p>404 not found</p>"),
        ("/short-linked", 200, "<p>tiny</p><a href='/y'>y</a>"),
    ]
    df = spark.createDataFrame(rows, "url string, status int, html string")
    got = {r.url: (r.phrase_hit, r.soft404) for r in soft404_detect(df, min_tokens=12).collect()}
    assert got == {
        "/ok": (False, False),
        "/phrase": (True, True),
        "/stub": (False, True),
        "/hard": (True, False),          # hard 404: taxonomy's job
        "/short-linked": (False, False), # short but links out
    }


def test_jsonld_harvest_blocks(spark):
    """X130: multi-block extraction, malformed blocks dropped with an
    index gap, absent fields NULL."""
    from oa_spider_spark.operators.html import jsonld_harvest

    html = (
        '<script type="application/ld+json">'
        '{"@type":"Article","name":"A","datePublished":"2024-02-03"}</script>'
        '<script type="application/ld+json">{nope</script>'
        "<script type='application/ld+json'>"
        '{"@type":"Product","name":"P"}</script>'
    )
    df = spark.createDataFrame([("/u/1", html)], "url string, html string")
    got = {
        r.block_idx: (r.jtype, r.name, r.date_published)
        for r in jsonld_harvest(df).collect()
    }
    assert got == {
        0: ("Article", "A", "2024-02-03"),
        2: ("Product", "P", None),   # idx 1 was the malformed block
    }


def test_extract_assets_budget_and_dedup(spark):
    """Dedup collapses the repeated img; images outrank css/script at
    the admission line; per-page budget admits exactly 4."""
    from oa_spider_spark.operators.html import extract_assets

    html = (
        '<html><head><link rel="stylesheet" href="/s/a.css">'
        '<script async src="/j/b.js"></script></head><body>'
        '<img src="/i/1.jpg"><img src="/i/2.jpg">'
        '<img src="/i/1.jpg">'          # duplicate
        '<img src="/i/3.jpg"><img src="/i/4.jpg">'
        "</body></html>"
    )
    pages = spark.createDataFrame([(1, html)], "doc_id long, html string")
    out = extract_assets(pages, html_col="html", per_page_budget=4).collect()
    by_url = {r["asset_url"]: r for r in out}
    assert len(by_url) == 6  # 4 distinct imgs + css + js
    assert by_url["/i/1.jpg"]["kind"] == "img"
    admitted = {r["asset_url"] for r in out if r["admitted"]}
    assert admitted == {"/i/1.jpg", "/i/2.jpg", "/i/3.jpg", "/i/4.jpg"}
    assert not by_url["/s/a.css"]["admitted"]
    assert by_url["/s/a.css"]["rank"] == 5  # css before script
    assert by_url["/j/b.js"]["rank"] == 6


def test_heading_outline_parent_and_span(spark):
    """Hand page: h1 > h2 > h3, then a second h2 — parents point at the
    nearest lower level, section_end at the next same-or-higher."""
    from oa_spider_spark.operators.html import heading_outline

    html = (
        "<h1>Top</h1>"
        '<h2 class="a">Alpha</h2>'
        "<h3>Deep <b>bold</b></h3>"
        "<h2>Beta</h2>"
    )
    pages = spark.createDataFrame([(1, html)], "doc_id long, html string")
    out = {r["pos"]: r for r in heading_outline(pages).collect()}
    assert [out[p]["level"] for p in range(4)] == [1, 2, 3, 2]
    assert out[0]["parent_pos"] is None
    assert out[1]["parent_pos"] == 0 and out[3]["parent_pos"] == 0
    assert out[2]["parent_pos"] == 1
    assert out[2]["title"] == "Deep bold"      # tags stripped, collapsed
    assert out[1]["section_end"] == 3          # Alpha ends at Beta
    assert out[3]["section_end"] is None       # Beta runs to page end
    assert out[2]["section_end"] == 3          # h3 ends at next h2


def test_main_content_extract_density(spark):
    """Nav/pager blocks (pure anchors) drop, prose keeps, short blocks
    drop, and the md5 matches the hand reassembly."""
    import hashlib

    from oa_spider_spark.operators.html import main_content_extract

    prose = "This is a long enough paragraph of plain prose text."
    html = (
        '<p><a href="/">Home</a> <a href="/x">Links</a></p>'
        f"<p>{prose}</p>"
        "<p>tiny</p>"
        f'<p>{prose} With <a href="/y">one link</a> inside.</p>'
    )
    pages = spark.createDataFrame([(1, html)], "doc_id long, html string")
    r = main_content_extract(pages).collect()[0]
    assert r["n_blocks"] == 4 and r["n_kept"] == 2
    kept1 = prose
    kept2 = f"{prose} With one link inside."
    want = hashlib.md5(f"{kept1}\n{kept2}".encode()).hexdigest()
    assert r["main_md5"] == want
    assert r["main_chars"] == len(kept1) + len(kept2)
