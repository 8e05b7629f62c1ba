"""Real HTML parse stage (SURVEY.md S5/F15) — the reference's most-used
extraction surface, re-expressed as an Arrow batch operator.

The reference drives PyQuery selectors over fetched pages:
  * id select            `#weaDocDetailHtmlContent`   (oa.py:390)
  * card `<li><a>` scrape `.ul1 li` → a.attr['href']  (oa.py:806-817)
  * descendant + filter   `center a`, skip /word/view (oa.py:771-776)
  * nth-child table chains `#oDetailTable_Body > tr:nth-child(3) > td ...`
                                                      (oa.py:768, 922-941)

This module implements the same selector semantics on a real parsed DOM
(stdlib html.parser — lxml is not in this container; swapping the tree
builder for lxml.html changes only `parse_html` internals, the selector
engine and the Spark plumbing stay identical). Parsing rides mapInArrow
batch-at-a-time — never a per-row Python UDF.

Supported selector subset (all the shapes the reference uses):
  tag   #id   .class   tag.class   :nth-child(k)   descendant   `>` child
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from functools import lru_cache
from html.parser import HTMLParser

import pyarrow as pa
from pyspark.sql import DataFrame

_VOID = {"br", "hr", "img", "meta", "input", "link", "area", "base", "col",
         "embed", "source", "track", "wbr"}


class Node:
    """One element; text is kept as plain str entries in `children`."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent

    def element_children(self) -> list["Node"]:
        return [c for c in self.children if isinstance(c, Node)]

    def iter(self) -> Iterator["Node"]:
        for c in self.children:
            if isinstance(c, Node):
                yield c
                yield from c.iter()


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag: str, attrs) -> None:
        node = Node(tag, {k: (v or "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.stack[-1].children.append(
            Node(tag, {k: (v or "") for k, v in attrs}, self.stack[-1])
        )

    def handle_endtag(self, tag: str) -> None:
        # lenient close: pop to the nearest matching open tag, ignore strays
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].children.append(data)


def parse_html(text: str) -> Node:
    b = _TreeBuilder()
    b.feed(text or "")
    return b.root


@lru_cache(maxsize=1024)
def _parse_simple(simple: str) -> tuple[str | None, str | None, str | None, int | None]:
    """'tag#id.class:nth-child(k)' → (tag, id, class, k), each optional.

    Cached: `_matches` calls this once PER DOM NODE per selector
    segment, so without the cache the regex parse dominated the whole
    stage (profiled at ~35% of parse_fields' Python time on sf0.1 —
    192k parses of the same handful of strings per 2k pages). A query
    uses a fixed, small selector set; 1024 entries is generous."""
    tag = id_ = cls = None
    nth = None
    rest = simple
    if ":nth-child(" in rest:
        rest, _, tail = rest.partition(":nth-child(")
        nth = int(tail.rstrip(")"))
    # leading tag, then any number of #id / .class tokens in either order
    # (single class supported — all the ref uses)
    m = re.match(r"([^#.]*)((?:[#.][^#.]+)*)$", rest)
    if m:
        tag = m.group(1) or None
        for tok in re.findall(r"[#.][^#.]+", m.group(2)):
            if tok[0] == "#":
                id_ = tok[1:]
            else:
                cls = tok[1:]
    return tag, id_, cls, nth


def _matches(node: Node, simple: str) -> bool:
    tag, id_, cls, nth = _parse_simple(simple)
    if tag and node.tag != tag:
        return False
    if id_ and node.attrs.get("id") != id_:
        return False
    if cls and cls not in (node.attrs.get("class") or "").split():
        return False
    if nth is not None:
        sibs = node.parent.element_children() if node.parent else [node]
        if sibs.index(node) + 1 != nth:
            return False
    return True


def select(root: Node, selector: str) -> list[Node]:
    """Evaluate the selector; nodes in document order, no duplicates."""
    parts = selector.replace(">", " > ").split()
    current: list[Node] = [root]
    child_only = False
    for part in parts:
        if part == ">":
            child_only = True
            continue
        nxt: list[Node] = []
        seen: set[int] = set()
        for base in current:
            pool = base.element_children() if child_only else list(base.iter())
            for n in pool:
                if id(n) not in seen and _matches(n, part):
                    seen.add(id(n))
                    nxt.append(n)
        current = nxt
        child_only = False
    return current


def node_text(node: Node) -> str:
    """All text under the node, whitespace-collapsed (PyQuery .text())."""
    chunks: list[str] = []

    def walk(n: Node) -> None:
        for c in n.children:
            if isinstance(c, str):
                chunks.append(c)
            else:
                walk(c)

    walk(node)
    return " ".join(" ".join(chunks).split())


def links(root: Node, selector: str, skip_prefix: str = "/word/view") -> list[tuple[str, str]]:
    """(href, anchor text) for anchors under `selector`, skipping the
    reference's preview links (oa.py:771-776)."""
    out = []
    for a in select(root, selector):
        href = a.attrs.get("href", "")
        if href and not href.startswith(skip_prefix):
            out.append((href, node_text(a)))
    return out


# --- Spark surface ---------------------------------------------------------

def parse_fields(
    df: DataFrame,
    html_col: str,
    fields: dict[str, tuple[str, str]],
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Parse each page once, project selector results to scalar columns.

    `fields` maps out_col → (selector, mode) with mode:
      text        — whitespace-collapsed text of the first match (or NULL)
      count       — number of matching nodes
      first_href  — href of the first matched <a> whose href does not
                    start with /word/view (or NULL)

    One DOM build per row per batch, all fields extracted from it; Arrow
    in / Arrow out, no per-row Python UDF.
    """
    in_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    key_ddl = ", ".join(f"{k} {in_schema[k]}" for k in key_cols)
    out_ddl = key_ddl + ", " + ", ".join(
        f"{name} {'int' if mode == 'count' else 'string'}"
        for name, (_, mode) in fields.items()
    )
    items = list(fields.items())

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if not batch.num_rows:
                continue
            pages = batch.column(html_col).to_pylist()
            cols: dict[str, list] = {name: [] for name, _ in items}
            for page in pages:
                root = parse_html(page)
                for name, (sel, mode) in items:
                    if mode == "text":
                        hits = select(root, sel)
                        cols[name].append(node_text(hits[0]) if hits else None)
                    elif mode == "count":
                        cols[name].append(len(select(root, sel)))
                    elif mode == "first_href":
                        ls = links(root, sel)
                        cols[name].append(ls[0][0] if ls else None)
                    else:
                        raise ValueError(f"unknown parse mode {mode!r}")
            arrays = [batch.column(k) for k in key_cols]
            names = list(key_cols)
            for name, (_, mode) in items:
                typ = pa.int32() if mode == "count" else pa.string()
                arrays.append(pa.array(cols[name], typ))
                names.append(name)
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df.select(*key_cols, html_col).mapInArrow(run, schema=out_ddl)


def extract_links(
    df: DataFrame,
    html_col: str,
    selector: str,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Explode (href, name) per page for anchors under `selector`,
    skipping /word/view preview links; name = url tail after the last '/'
    when the anchor has no text (oa.py:775-776)."""
    in_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    key_ddl = ", ".join(f"{k} {in_schema[k]}" for k in key_cols)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if not batch.num_rows:
                continue
            pages = batch.column(html_col).to_pylist()
            rows: list[int] = []
            hrefs, names = [], []
            for row, page in enumerate(pages):
                for href, text in links(parse_html(page), selector):
                    rows.append(row)
                    hrefs.append(href)
                    names.append(text or href[href.rfind("/") + 1:])
            # take() on the ORIGINAL columns keeps their exact Arrow types
            # (int32 keys etc.) — rebuilding via pa.array() type inference
            # would re-type them and crash the JVM-side accessor
            idx = pa.array(rows, pa.int64())
            arrays = [batch.column(k).take(idx) for k in key_cols] + [
                pa.array(hrefs, pa.string()), pa.array(names, pa.string())
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=[*key_cols, "href", "name"])

    return df.select(*key_cols, html_col).mapInArrow(
        run, schema=f"{key_ddl}, href string, name string"
    )


def render_routing(
    pages: DataFrame,
    html_col: str = "html",
    min_visible_chars: int = 200,
    max_script_milli: int = 700,
) -> DataFrame:
    """Render-tier routing: which pages need a headless-browser fetch
    (the 10-100× cost tier) versus the plain HTTP path — the P9-style
    type-dispatch a mixed crawl runs before scheduling, because
    rendering everything is the single biggest avoidable cost in a
    JS-era crawl. All signals are row-local JVM regex/length
    expressions (pyspark.sql.functions, NOT this module's Arrow
    parser — routing must stay cheaper than the parse it gates):

      script_blocks   count of <script openings
      script_milli    1000·script-source bytes div total bytes
      visible_chars   text length after stripping tags/scripts
      spa_marker      root/app mount divs or framework attributes

    route = 'render' when (spa_marker AND visible < min) OR
    script_milli > max — i.e. a mount point with no server-rendered
    text, or script-dominated payloads."""
    from pyspark.sql import functions as F

    h = F.col(html_col)
    total = F.length(h)
    noscripts = F.regexp_replace(h, r"(?is)<script\b.*?</script>", "")
    script_bytes = total - F.length(noscripts)
    visible = F.length(
        F.trim(F.regexp_replace(noscripts, r"(?s)<[^>]*>", ""))
    )
    spa = (
        F.lower(h).contains('id="root"')
        | F.lower(h).contains('id="app"')
        | F.lower(h).contains("data-reactroot")
        | F.lower(h).contains("ng-app")
    )
    base = pages.withColumn("_total", total).withColumn(
        "_sb", script_bytes.cast("long")
    )
    out = base.select(
        *[c for c in pages.columns if c != html_col],
        F.size(F.split(h, r"(?i)<script\b")).cast("long").alias("_nsplit"),
        F.expr("1000 * _sb div _total").alias("script_milli"),
        visible.cast("long").alias("visible_chars"),
        spa.alias("spa_marker"),
    ).withColumn("script_blocks", F.col("_nsplit") - 1)
    return out.select(
        *[c for c in pages.columns if c != html_col],
        "script_blocks",
        "script_milli",
        "visible_chars",
        "spa_marker",
        F.when(
            (F.col("spa_marker") & (F.col("visible_chars") < min_visible_chars))
            | (F.col("script_milli") > max_script_milli),
            "render",
        )
        .otherwise("static")
        .alias("route"),
    )


def extract_tables(
    pages: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """HTML tables to relational cells — (doc, table_idx, row_idx,
    col_idx, cell_text) — the structured-data mining step that turns a
    crawled page's <table> islands into joinable rows (the reference
    scrapes exactly one fixed table shape at oa.py:922-941; a general
    pipeline gets arbitrary ones). Pure JVM regex explode: tables via
    regexp_extract_all('(?is)<table[^>]*>(.*?)</table>'), rows via
    '(?is)<tr[^>]*>(.*?)</tr>', cells via '(?is)<t[dh][^>]*>(.*?)</t[dh]>'
    (td and th both — header rows are data here), inner tags stripped
    and whitespace collapsed. Three posexplodes, zero shuffles, zero
    Python — a page never leaves its row until the final cell explode.
    Nested tables surface their cells under the OUTER table's cell scan
    once stripped — genuinely nested layouts need the DOM parser above;
    this is the bulk-mining fast path."""
    from pyspark.sql import functions as F

    tables = F.expr(
        f"regexp_extract_all({html_col}, '(?is)<table[^>]*>(.*?)</table>', 1)"
    )
    t = pages.select(
        F.col(id_col), F.posexplode(tables).alias("table_idx", "_t")
    )
    rows = t.select(
        id_col,
        "table_idx",
        F.posexplode(
            F.expr("regexp_extract_all(_t, '(?is)<tr[^>]*>(.*?)</tr>', 1)")
        ).alias("row_idx", "_r"),
    )
    cells = rows.select(
        id_col,
        "table_idx",
        "row_idx",
        F.posexplode(
            F.expr(
                "regexp_extract_all(_r, '(?is)<t[dh][^>]*>(.*?)</t[dh]>', 1)"
            )
        ).alias("col_idx", "_c"),
    )
    txt = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("_c"), r"(?s)<[^>]*>", " "), r"\s+", " "
        )
    )
    return cells.select(
        id_col, "table_idx", "row_idx", "col_idx", txt.alias("cell_text")
    )


SOFT404_PHRASES = [
    "page not found", "404", "does not exist", "no longer available",
]


def soft404_detect(
    pages: DataFrame,
    html_col: str = "html",
    status_col: str = "status",
    min_tokens: int = 12,
) -> DataFrame:
    """Soft-404 detection — error pages served with HTTP 200, the
    classic crawl-corpus poison (they dedup into giant boilerplate
    clusters and waste recrawl budget on content that isn't there).
    Signals, all row-local JVM expressions: error-phrase hits on the
    tag-stripped lowercased text, visible token count, and outlink
    count; a 200-status page is flagged when it carries an error phrase
    OR is a near-empty dead end (< min_tokens tokens AND zero links).
    Hard 404s are already handled by the retry taxonomy (T2) — only
    status-200 rows can flag here."""
    from pyspark.sql import functions as F

    h = F.col(html_col)
    visible = F.lower(
        F.trim(F.regexp_replace(F.regexp_replace(h, r"(?s)<[^>]*>", " "), r"\s+", " "))
    )
    phrase_hit = None
    for p in SOFT404_PHRASES:
        c = visible.contains(p)
        phrase_hit = c if phrase_hit is None else (phrase_hit | c)
    n_tok = F.when(visible == "", 0).otherwise(
        F.size(F.split(visible, " "))
    ).cast("long")
    n_links = (F.size(F.split(F.lower(h), "<a ")) - 1).cast("long")
    base = pages.select(
        *[c for c in pages.columns if c != html_col],
        phrase_hit.alias("phrase_hit"),
        n_tok.alias("n_tokens"),
        n_links.alias("n_links"),
    )
    return base.withColumn(
        "soft404",
        (F.col(status_col) == 200)
        & (
            F.col("phrase_hit")
            | ((F.col("n_tokens") < min_tokens) & (F.col("n_links") == 0))
        ),
    )


def jsonld_harvest(
    pages: DataFrame, html_col: str = "html", id_col: str = "url"
) -> DataFrame:
    """schema.org JSON-LD harvest: extract every
    <script type="application/ld+json"> block and pull the core entity
    fields (@type, name, datePublished) with JVM JSON-path — the
    structured-data mining pass that turns crawled pages into an entity
    table without any HTML heuristics. Malformed JSON blocks yield a
    NULL @type and are dropped (counted by the caller via block_idx
    gaps). One regex explode + three get_json_object calls, all
    row-local."""
    from pyspark.sql import functions as F

    block = F.posexplode(
        F.regexp_extract_all(
            F.col(html_col),
            F.lit(
                "(?is)<script[^>]*type=[\"']?application/ld\\+json[\"']?"
                "[^>]*>(.*?)</script>"
            ),
            F.lit(1),
        )
    ).alias("block_idx", "_b")
    base = pages.select(F.col(id_col), block)
    j = F.trim(F.col("_b"))
    return (
        base.select(
            id_col,
            "block_idx",
            F.get_json_object(j, "$['@type']").alias("jtype"),
            F.get_json_object(j, "$.name").alias("name"),
            F.get_json_object(j, "$.datePublished").alias("date_published"),
        )
        .filter(F.col("jtype").isNotNull())
    )


def extract_assets(
    pages: DataFrame,
    html_col: str = "html",
    key_cols: tuple = ("doc_id",),
    per_page_budget: int = 4,
) -> DataFrame:
    """Subresource harvest for the media-fetch tier: every <img src>,
    stylesheet <link href>, and <script src> on a page, classified,
    deduplicated per page, and admitted against a per-page budget with
    images first — the page-local admission step that feeds the image
    pipeline (S8/K-family) without letting a gallery page monopolize a
    fetch round the way the global byte budget (X118) guards rounds.

    Whole pipeline is column expressions: three regexp_extract_all
    (patterns kept to the Java∩RE2 subset so the DuckDB oracle replays
    them verbatim) → one posexplode per kind unioned, per-(page, url)
    dedup, then rank by (priority, first position) inside the page.
    The per-page window is NOT a scale hazard: a page's tag count is
    bounded by its HTML size (a 2 MB page holds at most ~10^5 tags),
    so every window task is page-sized by construction — the same
    argument extract_tables makes. Shuffles: one dedup aggregate + one
    page-keyed window, both on (page, url) keys.

    Output: key_cols + (asset_url, kind, priority, first_pos, rank,
    admitted)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    kinds = [
        ("img", r'<img[^>]*\ssrc="([^"]+)"', 1),
        ("css", r'<link[^>]*\shref="([^"]+\.css)"', 2),
        ("script", r'<script[^>]*\ssrc="([^"]+)"', 3),
    ]
    keys = [F.col(k) for k in key_cols]
    parts = []
    for kind, pat, prio in kinds:
        parts.append(
            pages.select(
                *keys,
                F.posexplode(
                    F.regexp_extract_all(F.col(html_col), F.lit(pat), F.lit(1))
                ).alias("pos", "asset_url"),
            ).select(
                *keys,
                "asset_url",
                F.lit(kind).alias("kind"),
                F.lit(prio).alias("priority"),
                F.col("pos").cast("long").alias("pos"),
            )
        )
    tags = parts[0]
    for p in parts[1:]:
        tags = tags.unionByName(p)
    # kind is a pure function of the winning priority (no min_by with a
    # struct key — DuckDB's min_by has no struct overload, CLAUDE.md)
    dedup = (
        tags.groupBy(*key_cols, "asset_url")
        .agg(
            F.min("priority").alias("priority"),
            F.min("pos").alias("first_pos"),
        )
        .withColumn(
            "kind",
            F.when(F.col("priority") == 1, "img")
            .when(F.col("priority") == 2, "css")
            .otherwise("script"),
        )
    )
    w = Window.partitionBy(*key_cols).orderBy(
        "priority", "first_pos", "asset_url"
    )
    return dedup.withColumn("rank", F.row_number().over(w)).withColumn(
        "admitted", F.col("rank") <= per_page_budget
    )


def heading_outline(
    pages: DataFrame,
    html_col: str = "html",
    key_cols: tuple = ("doc_id",),
) -> DataFrame:
    """Document outline (TOC) extraction: every h1-h6 heading with its
    PARENT heading — the nearest preceding heading of a strictly lower
    level — and its section end, turning flat HTML into the section
    tree that chunking-by-section and TOC-aware dedup consume.

    Relational parent-finding without recursion: for each of the five
    possible "lower than me" thresholds, one running-max-position
    window column over the page's heading sequence (max pos among
    preceding headings with level < l); each heading then PICKS its
    threshold column by its own level — a constant 5 window columns,
    never a self-join. section_end is the symmetric forward-min with
    level <= l. Regexes avoid backreferences (Java-only; RE2/DuckDB
    has none): blocks match <h[1-6]...>...</h[1-6]> non-greedily and
    the level is read off the block's third character. Per-page
    windows are heading-count-bounded (extract_tables' argument).

    Output: key_cols + (pos, level, title, parent_pos, section_end) —
    parent_pos NULL for top-level headings, section_end NULL when the
    section runs to the page end."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    keys = [F.col(k) for k in key_cols]
    blocks = pages.select(
        *keys,
        F.posexplode(
            F.regexp_extract_all(
                F.col(html_col),
                F.lit(r"(?s)<h[1-6][^>]*>.*?</h[1-6]>"),
                F.lit(0),
            )
        ).alias("pos", "_blk"),
    )
    level = F.substring("_blk", 3, 1).cast("int")
    title = F.trim(
        F.regexp_replace(F.col("_blk"), r"(?s)<[^>]*>", " ")
    )
    h = blocks.select(
        *keys,
        F.col("pos").cast("long").alias("pos"),
        level.alias("level"),
        F.regexp_replace(title, r"\s+", " ").alias("title"),
    )
    back = Window.partitionBy(*key_cols).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    fwd = Window.partitionBy(*key_cols).orderBy("pos").rowsBetween(
        1, Window.unboundedFollowing
    )
    for l in range(2, 7):
        h = h.withColumn(
            f"_p{l}",
            F.max(F.when(F.col("level") < l, F.col("pos"))).over(back),
        )
    for l in range(1, 7):
        h = h.withColumn(
            f"_e{l}",
            F.min(F.when(F.col("level") <= l, F.col("pos"))).over(fwd),
        )
    parent = F.when(F.col("level") == 1, F.lit(None).cast("long"))
    for l in range(2, 7):
        parent = parent.when(F.col("level") == l, F.col(f"_p{l}"))
    end = F.when(F.col("level") == 1, F.col("_e1"))
    for l in range(2, 7):
        end = end.when(F.col("level") == l, F.col(f"_e{l}"))
    return h.select(
        *key_cols, "pos", "level", "title",
        parent.alias("parent_pos"), end.alias("section_end"),
    )


def main_content_extract(
    pages: DataFrame,
    html_col: str = "html",
    key_cols: tuple = ("doc_id",),
    max_link_density_milli: int = 500,
    min_block_chars: int = 20,
) -> DataFrame:
    """Boilerpipe-style main-content extraction by LINK DENSITY
    (Kohlschütter et al., WSDM'10's strongest single feature):
    navigation, related-links and footer blocks are mostly anchor
    text, article prose is mostly not — keep <p> blocks whose anchor-
    text share stays under the threshold AND that carry enough text,
    reassemble in document order. The extraction stage between the
    raw fetch and every text-quality operator (X53/X88 score the MAIN
    text, not the nav).

    Entirely column expressions: one block explode (backreference-free
    '<p...>...</p>' — RE2-safe), per-block tag-strip + anchor-strip
    lengths (link chars = stripped-len minus stripped-len-after-
    removing-anchors, so nested markup inside anchors counts once),
    integer milli density, ordered reassembly via the paragraph_dedup
    discipline (sort by block pos inside a per-page collect — page-
    bounded). Output: key_cols + (n_blocks, n_kept, main_chars,
    main_md5) — the md5 stands in for the text so oracle rows stay
    small."""
    from pyspark.sql import functions as F

    keys = [F.col(k) for k in key_cols]
    blocks = pages.select(
        *keys,
        F.posexplode(
            F.regexp_extract_all(
                F.col(html_col), F.lit(r"(?s)<p[^>]*>.*?</p>"), F.lit(0)
            )
        ).alias("pos", "_blk"),
    )
    strip = lambda c: F.trim(F.regexp_replace(c, r"(?s)<[^>]*>", ""))
    text_all = strip(F.col("_blk"))
    no_anchor = strip(
        F.regexp_replace(F.col("_blk"), r"(?s)<a[^>]*>.*?</a>", "")
    )
    scored = blocks.select(
        *keys,
        "pos",
        text_all.alias("_t"),
        (F.length(text_all) - F.length(no_anchor)).alias("_lk"),
    ).withColumn(
        "_keep",
        (
            F.expr(
                f"1000 * _lk div greatest(length(_t), 1)"
                f" < {int(max_link_density_milli)}"
            )
        )
        & (F.length("_t") >= min_block_chars),
    )
    return (
        scored.groupBy(*key_cols)
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum(F.col("_keep").cast("long")).alias("n_kept"),
            F.sum(
                F.when(F.col("_keep"), F.length("_t")).otherwise(0)
            ).cast("long").alias("main_chars"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("_keep"),
                                    F.struct("pos", F.col("_t").alias("t")),
                                )
                            )
                        ),
                        lambda s: s["t"],
                    ),
                    "\n",
                )
            ).alias("main_md5"),
        )
    )
