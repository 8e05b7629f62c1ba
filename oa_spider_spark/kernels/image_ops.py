"""Vectorized (numpy) reimplementations of the reference captcha kernels.

Reference: `/root/reference/oa_spider/captcha/captcha.py` — the reference
operates on PIL "L"-mode images pixel-by-pixel; here every kernel is a
whole-array numpy operation over uint8 arrays of shape (h, w), suitable for
Arrow-batch UDF execution (SURVEY.md §2.9 K1-K10). Semantics are
behavior-equivalent (golden-tested), not line translations.

Conventions: BLACK=0, WHITE=255 (captcha.py:11-12); images are (h, w)
row-major, so the reference's `img.getpixel((x, y))` is `arr[y, x]`.
"""

from __future__ import annotations

import numpy as np

from ..config import BLACK, THRESHOLD, WHITE


def binarize(arr: np.ndarray, threshold: int = THRESHOLD) -> np.ndarray:
    """K2 — threshold to {0, 255} (reference `binarization`, captcha.py:41-58).

    RGB input is first converted to luminance like `Image.convert('L')`
    (ITU-R 601: L = 0.299R + 0.587G + 0.114B, truncated to int as PIL does).
    """
    if arr.ndim == 3:
        arr = (
            0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
        ).astype(np.uint8)
    return np.where(arr < threshold, BLACK, WHITE).astype(np.uint8)


def xprojection(arr: np.ndarray, box: tuple | None = None) -> np.ndarray:
    """K3 — per-column BLACK-pixel counts (reference `xprojection`,
    captcha.py:61-76). ``box`` = (left, upper, right, lower).

    NOTE the reference quirk: with a box, the output vector still has
    length ``right - left`` but is indexed by *absolute* x (`shadow[x] += 1`
    at captcha.py:75 while `shadow = [0]*(right-left)` at :71) — callers
    only ever use box=(start_x, 0, end_x, ysize) together with relative
    indexing downstream, so we return counts for columns [left, right)
    relative to the box, which is the semantics `img_split` relies on
    (it crops first in our pipeline).
    """
    if box:
        left, upper, right, lower = box
        arr = arr[upper:lower, left:right]
    return np.sum(arr == BLACK, axis=0)


def yprojection(arr: np.ndarray, box: tuple | None = None) -> np.ndarray:
    """K3 — per-row BLACK-pixel counts (reference `yprojection`,
    captcha.py:79-94)."""
    if box:
        left, upper, right, lower = box
        arr = arr[upper:lower, left:right]
    return np.sum(arr == BLACK, axis=1)


def continuous_runs(segment) -> list[list[int]]:
    """K4 — maximal runs of >0 values as [start, end) pairs.

    Reference `continuous_lines(segment)` (captcha.py:97-139); goldens at
    captcha/tests.py:21-50 are ported verbatim into tests/test_kernels.py.
    Vectorized via a padded-diff scan instead of the reference's
    element-by-element state machine.
    """
    v = np.asarray(segment) > 0
    if v.size == 0:
        return []
    d = np.diff(np.concatenate(([0], v.astype(np.int8), [0])))
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    return [[int(s), int(e)] for s, e in zip(starts, ends)]


def envelope(segment) -> list[int]:
    """K4 single-mode — outer [first_start, last_end) envelope; [0, 0] when
    the vector is all zero (reference `continuous_lines(segment, 1)`,
    captcha.py:103-120)."""
    runs = continuous_runs(segment)
    if not runs:
        return [0, 0]
    return [runs[0][0], runs[-1][1]]


def despeckle(arr: np.ndarray) -> np.ndarray:
    """K5 — remove isolated black pixels (reference `minesweeper` +
    `lonely_pixel`, captcha.py:141-190).

    The reference walks aligned 2×2 tiles and whitens a tile's sole black
    pixel when its 8-neighborhood (out-of-bounds = WHITE) is all white.
    Any pixel with an all-white 8-neighborhood is automatically the only
    black in its tile, and lonely pixels are never 8-adjacent to each
    other, so the sequential tile walk is equivalent to one parallel
    "black with zero black neighbors → white" mask — computed here with
    nine shifted adds on a zero-padded mask.
    """
    black = (arr == BLACK).astype(np.uint8)
    h, w = black.shape
    padded = np.zeros((h + 2, w + 2), dtype=np.uint8)
    padded[1:-1, 1:-1] = black
    neighbors = np.zeros((h, w), dtype=np.uint8)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            neighbors += padded[dy : dy + h, dx : dx + w]
    out = arr.copy()
    out[(black == 1) & (neighbors == 0)] = WHITE
    return out


def split_glyphs(arr: np.ndarray) -> list[np.ndarray]:
    """K6 — crop one sub-image per x-run, tightened to its y-envelope
    (reference `img_split`, captcha.py:193-209)."""
    xs = continuous_runs(xprojection(arr))
    regions = []
    for x0, x1 in xs:
        y0, y1 = envelope(yprojection(arr, (x0, 0, x1, arr.shape[0])))
        regions.append(arr[y0:y1, x0:x1])
    return regions


def img_compare(a: np.ndarray, b: np.ndarray) -> float:
    """K7 — projection-profile L1 similarity in [~0, 1] (reference
    `img_compare`, captcha.py:228-250).

    Iterates over *a*'s projections; where *b* is shorter the missing
    entries count as 0 (reference's IndexError branch, captcha.py:240-241),
    where *b* is longer its extra entries are ignored — reproduced exactly
    with padded/truncated vector arithmetic.
    """
    count = 0
    for proj in ("x", "y"):
        pa = xprojection(a) if proj == "x" else yprojection(a)
        pb = xprojection(b) if proj == "x" else yprojection(b)
        n = len(pa)
        pb_fit = np.zeros(n, dtype=np.int64)
        m = min(n, len(pb))
        pb_fit[:m] = pb[:m]
        count += int(np.abs(pa.astype(np.int64) - pb_fit).sum())
    h, w = a.shape
    return 1 - count / 2.0 / (w * h)


def models_match(glyph: np.ndarray, templates: dict[str, np.ndarray]) -> str:
    """K7 — best-matching template name, early exit at similarity 1.0
    (reference `models_match`, captcha.py:253-269).

    Deviation noted: the reference iterates templates in `os.listdir`
    order (filesystem-dependent); we iterate in sorted name order so
    ties break deterministically.
    """
    best_name, best_score = None, -np.inf
    for name in sorted(templates):
        score = img_compare(glyph, templates[name])
        if score == 1.0:
            return name
        if score > best_score:
            best_name, best_score = name, score
    return best_name


def hack_captcha(arr: np.ndarray, templates: dict[str, np.ndarray], n: int = 4) -> str:
    """K8 — full pipeline: binarize → despeckle → split → match, truncate
    to n chars (reference `hack_captcha`, captcha.py:305-316)."""
    bin_img = despeckle(binarize(arr))
    return "".join(models_match(g, templates) for g in split_glyphs(bin_img))[:n]


def img2str(arr: np.ndarray) -> str:
    """K9 — ASCII debug render, 'X' for black / '-' for white (reference
    `img2str`, captcha.py:212-225)."""
    rows = np.where(arr == BLACK, "X", "-")
    return "".join("".join(r) + "\n" for r in rows)


# ---------------------------------------------------------------------------
# Digit glyph templates.
#
# The reference ships 10 greyscale template PNGs, 6-8 px wide × 12 px tall
# (`oa_spider/captcha/models/0..9.png`). We synthesize an equivalent family
# from a 3×5 bitmap font scaled to 12 px height — the *pipeline* (projection
# L1 matching) is what's under test, not the exact glyph art.
# ---------------------------------------------------------------------------

_FONT_3X5 = {
    "0": ["111", "101", "101", "101", "111"],
    "1": ["010", "110", "010", "010", "111"],
    "2": ["111", "001", "111", "100", "111"],
    "3": ["111", "001", "011", "001", "111"],
    "4": ["101", "101", "111", "001", "001"],
    "5": ["111", "100", "111", "001", "110"],
    "6": ["100", "100", "111", "101", "111"],
    "7": ["111", "001", "010", "010", "010"],
    "8": ["111", "101", "111", "101", "111"],
    "9": ["111", "101", "111", "001", "001"],
}


def digit_templates(scale_y: int = 2, scale_x: int = 2) -> dict[str, np.ndarray]:
    """Binary digit glyphs (BLACK strokes on WHITE), ~6×10 px at default
    scale — same size family as the reference's model PNGs."""
    out = {}
    for name, rows in _FONT_3X5.items():
        bits = np.array([[int(c) for c in r] for r in rows], dtype=np.uint8)
        bits = np.kron(bits, np.ones((scale_y, scale_x), dtype=np.uint8))
        out[name] = np.where(bits == 1, BLACK, WHITE).astype(np.uint8)
    return out


def render_captcha(
    code: str,
    templates: dict[str, np.ndarray] | None = None,
    pad: int = 2,
    gap: int = 3,
    noise: int = 0,
    rng: np.random.RandomState | None = None,
) -> np.ndarray:
    """Deterministically render a digit string onto a white canvas, with
    optional isolated speckle noise (which `despeckle` must remove).
    Greyscale values: strokes ~30 (< THRESHOLD), background ~220."""
    templates = templates or digit_templates()
    glyphs = [templates[c] for c in code]
    h = max(g.shape[0] for g in glyphs) + 2 * pad
    w = sum(g.shape[1] for g in glyphs) + gap * (len(glyphs) + 1)
    canvas = np.full((h, w), 220, dtype=np.uint8)
    x = gap
    for g in glyphs:
        gh, gw = g.shape
        canvas[pad : pad + gh, x : x + gw] = np.where(g == BLACK, 30, 220)
        x += gw + gap
    if noise and rng is not None:
        placed = 0
        black = canvas < THRESHOLD
        while placed < noise:
            y, x = int(rng.randint(0, h)), int(rng.randint(0, w))
            y0, y1 = max(0, y - 2), min(h, y + 3)
            x0, x1 = max(0, x - 2), min(w, x + 3)
            if not black[y0:y1, x0:x1].any():  # keep speckles isolated
                canvas[y, x] = 30
                black[y, x] = True
                placed += 1
    return canvas
