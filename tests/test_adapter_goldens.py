"""Adapter-contract goldens (VERDICT r04 item 6): the PIL-JPEG and
ONNX-OCR seams were import-gated and therefore NEVER EXECUTED in this
sandbox — well-designed seams with zero runtime evidence. These tests
drive the adapters' actual code paths against injected fake backends fed
by vendored goldens, so the plumbing (byte dispatch, mode handling,
dtype/shape contract, feature stacking, argmax→label mapping) is pinned
everywhere, while the library-present integration tests stay skip-gated
(tests/test_kernels.py::test_real_jpeg_roundtrip / the ONNX export test).
"""

import io
import sys

import numpy as np
import pytest

from oa_spider_spark.kernels import codec, nn_ocr
from oa_spider_spark.kernels.image_ops import digit_templates, render_captcha

# --- goldens ---------------------------------------------------------------

# grayscale golden: 3x4 gradient-ish grid (the values are arbitrary but
# FIXED — any drift in the adapter's array handling flips the comparison)
GREY_GOLDEN = np.array(
    [[0, 17, 34, 51], [68, 85, 102, 119], [136, 170, 204, 255]], dtype=np.uint8
)
# palette-mode golden: a 2x2 image whose RGB conversion is this grid
RGB_GOLDEN = np.array(
    [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [32, 64, 96]]], dtype=np.uint8
)
CAPTCHA_GOLDEN = "3791"  # rendered below; both OCR backends must read it


# --- fake PIL: minimal Image-module surface the adapter touches ------------


class _FakeImg:
    def __init__(self, arr: np.ndarray, mode: str):
        self._arr, self.mode = arr, mode

    def convert(self, mode: str) -> "_FakeImg":
        assert mode == "RGB", f"adapter must convert non-L modes to RGB, got {mode}"
        return _FakeImg(RGB_GOLDEN, "RGB")

    def __array__(self, dtype=None, copy=None):
        a = self._arr
        return a.astype(dtype) if dtype is not None else a

    def save(self, buf, format=None, quality=None):
        assert format == "JPEG"
        assert isinstance(quality, int) and 1 <= quality <= 100
        # fake wire format with REAL JPEG magic so decode_image's
        # format sniff dispatches back through the seam
        mode = self.mode.encode()
        arr = np.ascontiguousarray(self._arr)
        shape = np.asarray(arr.shape, dtype=np.int32).tobytes()
        buf.write(b"\xff\xd8\xff" + bytes([len(mode)]) + mode
                  + bytes([len(arr.shape)]) + shape + arr.tobytes())


class _FakeImageModule:
    last_fromarray_mode = None

    @classmethod
    def fromarray(cls, arr, mode=None):
        cls.last_fromarray_mode = mode
        return _FakeImg(np.asarray(arr), mode)

    @staticmethod
    def open(buf: io.BytesIO) -> _FakeImg:
        data = buf.read()
        assert data[:3] == b"\xff\xd8\xff"
        i = 3
        mlen = data[i]; i += 1
        mode = data[i:i + mlen].decode(); i += mlen
        ndim = data[i]; i += 1
        shape = tuple(np.frombuffer(data[i:i + 4 * ndim], dtype=np.int32)); i += 4 * ndim
        arr = np.frombuffer(data[i:], dtype=np.uint8).reshape(shape)
        return _FakeImg(arr, mode)


def test_jpeg_adapter_plumbing_against_goldens(monkeypatch):
    """encode_jpeg_real/decode_jpeg_real's own code runs end-to-end: the
    grayscale golden round-trips bit-exactly through the sniffing
    decode_image dispatch, mode selection is correct for 2-D vs 3-D
    arrays, and non-L modes are converted to RGB — all without PIL."""
    monkeypatch.setattr(codec, "_pil", lambda: _FakeImageModule)

    # grayscale path: fromarray(mode="L"), decode returns the exact grid
    data = codec.encode_jpeg_real(GREY_GOLDEN, quality=90)
    assert data[:3] == b"\xff\xd8\xff"
    assert _FakeImageModule.last_fromarray_mode == "L"
    out = codec.decode_image(data)  # sniffed dispatch, not a direct call
    assert out.dtype == np.uint8 and out.shape == GREY_GOLDEN.shape
    assert np.array_equal(out, GREY_GOLDEN)

    # RGB path: 3-D array → mode="RGB"
    codec.encode_jpeg_real(RGB_GOLDEN, quality=80)
    assert _FakeImageModule.last_fromarray_mode == "RGB"

    # palette-mode decode: the adapter must convert("RGB"), never return
    # raw palette indices
    buf = io.BytesIO()
    _FakeImg(np.zeros((2, 2), dtype=np.uint8), "P").save(buf, format="JPEG", quality=50)
    out = codec.decode_jpeg_real(buf.getvalue())
    assert out.shape == (2, 2, 3) and np.array_equal(out, RGB_GOLDEN)


# --- fake onnxruntime: InferenceSession surface the adapter touches --------


def test_onnx_adapter_plumbing_against_golden(monkeypatch):
    """onnx_glyph_backend's own code runs end-to-end: session
    construction, input-name lookup, float32 feature stacking, argmax →
    label strings — against a fake session whose logits are the in-repo
    linear classifier's, so the ONNX path must read the golden captcha
    identically to the default backend. No onnxruntime needed."""
    W = nn_ocr.glyph_classifier().astype(np.float32)
    seen = {}

    class _FakeSession:
        def __init__(self, path, providers=None):
            seen["path"], seen["providers"] = path, providers

        def get_inputs(self):
            return [type("In", (), {"name": "feats"})()]

        def run(self, outputs, feed):
            assert outputs is None and set(feed) == {"feats"}
            feats = feed["feats"]
            assert feats.dtype == np.float32 and feats.ndim == 2
            return [feats @ W]

    fake_ort = type("ort", (), {"InferenceSession": _FakeSession})
    monkeypatch.setitem(sys.modules, "onnxruntime", fake_ort)

    predict = nn_ocr.onnx_glyph_backend("golden-model.onnx")
    assert seen["path"] == "golden-model.onnx"
    assert seen["providers"] == ["CPUExecutionProvider"]

    img = render_captcha(CAPTCHA_GOLDEN, digit_templates())
    assert nn_ocr.hack_captcha_nn(img, predict=predict) == CAPTCHA_GOLDEN
    # golden equivalence: ONNX plumbing ≡ default backend on same weights
    assert nn_ocr.hack_captcha_nn(img) == CAPTCHA_GOLDEN
