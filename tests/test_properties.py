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
