"""Property-based tests (hypothesis) over the pure-Python kernels — the
no-Spark surfaces whose invariants must hold for ANY input, not just the
goldens: codecs, segmentation, perceptual hash, RSA, NN-OCR features.

Fast by construction (no SparkSession); runs in the no-Spark tier with
tests/test_kernels.py.
"""

from __future__ import annotations

import numpy as np
import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from oa_spider_spark.kernels.codec import (
    average_hash,
    decode_image,
    encode_image,
    psnr,
)
from oa_spider_spark.kernels.image_ops import WHITE, continuous_runs, envelope

GREY = arrays(
    np.uint8,
    st.tuples(st.integers(4, 24), st.integers(4, 24)),
    elements=st.integers(0, 255),
)


@settings(max_examples=40, deadline=None)
@given(GREY)
def test_png_roundtrip_identity(arr):
    """Lossless codec: decode(encode(x)) == x for any greyscale array."""
    assert np.array_equal(decode_image(encode_image(arr, "png")), arr)


@settings(max_examples=40, deadline=None)
@given(GREY)
def test_lossy_roundtrip_meets_psnr_gate(arr):
    """Lossy codec: same shape back, and PSNR >= 40 dB — the per-row
    invariant the fetch stage enforces (BASELINE.json input_hint)."""
    out = decode_image(encode_image(arr, "jpeg"))
    assert out.shape == arr.shape
    assert psnr(arr, out) >= 40.0


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 5), min_size=1, max_size=64))
def test_continuous_runs_partition_the_nonzero_support(seg):
    """Runs are disjoint, ordered, half-open [start, end), and their
    union is exactly the nonzero positions of the projection."""
    runs = continuous_runs(np.asarray(seg))
    covered = set()
    prev_end = -1
    for start, end in runs:
        assert start < end
        assert start > prev_end  # ordered, separated by at least one zero
        prev_end = end
        for i in range(start, end):
            covered.add(i)
    assert covered == {i for i, v in enumerate(seg) if v != 0}


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 5), min_size=1, max_size=64))
def test_envelope_bounds_all_runs(seg):
    """envelope() is the outer hull of continuous_runs."""
    runs = continuous_runs(np.asarray(seg))
    if not runs:
        assert list(envelope(np.asarray(seg))) == [0, 0]  # documented contract
        return
    lo, hi = envelope(np.asarray(seg))
    assert lo == runs[0][0] and hi == runs[-1][1]


@settings(max_examples=40, deadline=None)
@given(arrays(np.uint8, st.tuples(st.integers(8, 32), st.integers(8, 32)),
              elements=st.integers(0, 255)))
def test_average_hash_is_64bit_signed_and_deterministic(arr):
    h = average_hash(arr)
    assert -(1 << 63) <= h < (1 << 63)
    assert average_hash(arr) == h


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=40))
def test_rsa_roundtrip_any_short_token(tok):
    """PKCS#1-shaped encrypt/decrypt is the identity on any token that
    fits the modulus (k - 11 bytes)."""
    from oa_spider_spark.functions.rsa import (
        decrypt_token_bytes,
        demo_keypair,
        encrypt_token_bytes,
    )

    n, e, d = demo_keypair()
    c = encrypt_token_bytes(tok, n, e)
    assert decrypt_token_bytes(c, n, d) == tok
    assert encrypt_token_bytes(tok, n, e) == c  # deterministic


@settings(max_examples=40, deadline=None)
@given(arrays(np.uint8, st.tuples(st.integers(1, 30), st.integers(1, 30)),
              elements=st.sampled_from([0, WHITE])))
def test_glyph_features_fixed_size_any_glyph(glyph):
    """The NN-OCR feature map is total: fixed length, {0,1} grid + bias,
    for any glyph crop size >= 1x1."""
    from oa_spider_spark.kernels.nn_ocr import GRID_H, GRID_W, glyph_features

    f = glyph_features(glyph)
    assert f.shape == (GRID_H * GRID_W + 1,)
    assert f[-1] == 1.0
    assert set(np.unique(f[:-1])) <= {0.0, 1.0}


# --- round-4 operator arithmetic (engine-free twins) ------------------------


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-10_000, 10_000), st.integers(-10_000, 10_000)),
        min_size=2,
        max_size=40,
    )
)
def test_morton_zvalue_sql_matches_python_reference(points):
    """The generated z-order SQL (the DuckDB oracle side) reproduces a
    direct Python Morton encoding for ANY integer point set — pinning
    the quantize+interleave arithmetic both engines share."""
    import duckdb

    from oa_spider_spark.operators.layout import zvalue_sql

    bits = 8
    xs, ys = [p[0] for p in points], [p[1] for p in points]
    lox, hix, loy, hiy = min(xs), max(xs), min(ys), max(ys)
    top = (1 << bits) - 1

    def q(v, lo, hi):
        span = max(hi - lo, 1)
        return max(0, min(top, ((v - lo) * top) // span))

    def morton(x, y):
        qx, qy = q(x, lox, hix), q(y, loy, hiy)
        z = 0
        for i in range(bits):
            z |= ((qx >> i) & 1) << (2 * i)
            z |= ((qy >> i) & 1) << (2 * i + 1)
        return z

    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT * FROM (VALUES {}) t(x, y)".format(
        ", ".join(f"({x}, {y})" for x, y in points)
    ))
    got = [r[0] for r in con.execute(
        f"SELECT {zvalue_sql('pts', ['x', 'y'], bits=bits)} FROM pts"
    ).fetchall()]
    assert got == [morton(x, y) for x, y in points]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet="abc", min_size=1, max_size=6), min_size=2, max_size=12))
def test_deletion_neighborhood_blocking_is_complete_for_distance_1(words):
    """FastSS soundness property behind X60: lev(a,b) ≤ 1 ⟹ a and b
    share a member of D1 = {s} ∪ single-deletions(s), for ANY strings."""

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def d1(s):
        return {s} | {s[:i] + s[i + 1:] for i in range(len(s))}

    for i, a in enumerate(words):
        for b in words[i + 1:]:
            if lev(a, b) <= 1:
                assert d1(a) & d1(b), (a, b)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=200),
    st.integers(1, 64),
)
def test_systematic_pps_arithmetic_sums_to_k(weights, k):
    """The floor-difference pick rule behind X50: Σ n_picks == k for ANY
    weight vector with positive total, and every row's pick count is
    within 1 of its exact PPS expectation k·w/W."""
    W = sum(weights)
    if W == 0:
        return
    cum = 0
    picks = []
    for w in weights:
        prev = cum
        cum += w
        picks.append((k * cum) // W - (k * prev) // W)
    assert sum(picks) == k
    for w, p in zip(weights, picks):
        assert abs(p - k * w / W) <= 1
