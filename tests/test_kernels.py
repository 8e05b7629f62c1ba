"""Kernel golden tests.

The run-length segmentation vectors are ported VERBATIM from the reference's
only golden corpus (`/root/reference/oa_spider/captcha/tests.py:21-50`), per
SURVEY.md §5. Everything else tests behavior equivalence of the numpy
kernels against small hand-checked cases.
"""

import numpy as np
import pytest

from oa_spider_spark.config import BLACK, THRESHOLD, WHITE
from oa_spider_spark.kernels.codec import (
    average_hash,
    decode_image,
    encode_image,
    encode_png,
    decode_png,
    psnr,
)
from oa_spider_spark.kernels.image_ops import (
    binarize,
    continuous_runs,
    despeckle,
    digit_templates,
    envelope,
    hack_captcha,
    img2str,
    img_compare,
    models_match,
    render_captcha,
    split_glyphs,
    xprojection,
    yprojection,
)

# --- K4 goldens, verbatim from captcha/tests.py:21-50 ----------------------

S1 = [1, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 0]
S2 = [0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 0]
S3 = [0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1]
S4 = [1, 1, 1, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0]
S5 = [1, 1, 1, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 1, 1, 1, 1]
S6 = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
S7 = [0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0]
S8 = [0, 0, 0, 0, 1, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 1, 1, 1, 1, 0, 0]
S9 = [0, 0, 0, 0, 1, 0, 0, 0]


@pytest.mark.parametrize(
    "vec,runs,env",
    [
        (S1, [[0, 1], [5, 11]], [0, 11]),
        (S2, [[3, 7], [11, 17]], [3, 17]),
        (S3, [[3, 7], [11, 18]], [3, 18]),
        (S4, [[0, 4], [6, 7], [8, 9], [10, 11]], [0, 11]),
        (S5, [[0, 4], [6, 7], [8, 9], [10, 11], [14, 18]], [0, 18]),
        (S6, [], [0, 0]),
        (S7, [[4, 8]], [4, 8]),
        (S8, [[4, 6], [8, 9], [10, 11], [12, 13], [16, 20]], [4, 20]),
        (S9, [[4, 5]], [4, 5]),
    ],
)
def test_continuous_runs_goldens(vec, runs, env):
    assert continuous_runs(vec) == runs
    assert envelope(vec) == env


# --- K2 / K3 ---------------------------------------------------------------


def test_binarize_threshold():
    arr = np.array([[0, 134, 135, 255]], dtype=np.uint8)
    assert binarize(arr).tolist() == [[BLACK, BLACK, WHITE, WHITE]]


def test_binarize_rgb_luminance():
    rgb = np.zeros((1, 2, 3), dtype=np.uint8)
    rgb[0, 0] = [255, 255, 255]  # L=255 -> white
    rgb[0, 1] = [50, 50, 50]  # L=50 -> black
    assert binarize(rgb).tolist() == [[WHITE, BLACK]]


def test_projections():
    img = np.full((3, 4), WHITE, dtype=np.uint8)
    img[0, 1] = BLACK
    img[2, 1] = BLACK
    img[1, 3] = BLACK
    assert xprojection(img).tolist() == [0, 2, 0, 1]
    assert yprojection(img).tolist() == [1, 1, 1]
    assert xprojection(img, (1, 0, 3, 3)).tolist() == [2, 0]


# --- K5 despeckle ----------------------------------------------------------


def test_despeckle_removes_isolated_keeps_connected():
    img = np.full((6, 6), WHITE, dtype=np.uint8)
    img[0, 0] = BLACK  # lonely corner pixel -> removed
    img[3, 3] = BLACK  # pair -> kept
    img[3, 4] = BLACK
    out = despeckle(img)
    assert out[0, 0] == WHITE
    assert out[3, 3] == BLACK and out[3, 4] == BLACK


def test_despeckle_diagonal_neighbor_kept():
    img = np.full((4, 4), WHITE, dtype=np.uint8)
    img[1, 1] = BLACK
    img[2, 2] = BLACK  # diagonal neighbors protect each other
    out = despeckle(img)
    assert out[1, 1] == BLACK and out[2, 2] == BLACK


# --- K6/K7/K8 split + match + end-to-end captcha ---------------------------


def test_split_glyphs_counts_and_tight_crop():
    t = digit_templates()
    img = render_captcha("407", t)
    bin_img = binarize(img)
    glyphs = split_glyphs(bin_img)
    assert len(glyphs) == 3
    for g in glyphs:
        # tight crop: first/last rows and columns contain a black pixel
        assert (g[0] == BLACK).any() and (g[-1] == BLACK).any()
        assert (g[:, 0] == BLACK).any() and (g[:, -1] == BLACK).any()


def test_img_compare_self_is_one():
    t = digit_templates()
    for g in t.values():
        assert img_compare(g, g) == 1.0


def test_img_compare_shorter_model_counts_missing_as_zero():
    a = np.full((2, 3), BLACK, dtype=np.uint8)
    b = np.full((2, 2), BLACK, dtype=np.uint8)
    # a projections: x=[2,2,2], y=[3,3]; b fitted: x=[2,2,0], y=[2,2]
    # L1 = 2 + 2 = 4 -> 1 - 4/2/6
    assert img_compare(a, b) == pytest.approx(1 - 4 / 2.0 / 6)


def test_models_match_exact_and_every_digit():
    t = digit_templates()
    for name, glyph in t.items():
        assert models_match(glyph, t) == name


@pytest.mark.parametrize("code", ["0123", "4567", "8901", "9876", "2468"])
def test_hack_captcha_end_to_end(code):
    t = digit_templates()
    rng = np.random.RandomState(42)
    img = render_captcha(code, t, noise=5, rng=rng)
    assert hack_captcha(img, t) == code


def test_hack_captcha_truncates_to_n():
    t = digit_templates()
    img = render_captcha("12345", t)
    assert hack_captcha(img, t, n=4) == "1234"


def test_img2str_render():
    img = np.array([[BLACK, WHITE], [WHITE, BLACK]], dtype=np.uint8)
    assert img2str(img) == "X-\n-X\n"


# --- codecs ---------------------------------------------------------------


def test_png_roundtrip_grey_and_rgb():
    rng = np.random.RandomState(7)
    grey = rng.randint(0, 256, (13, 17), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(grey)), grey)
    rgb = rng.randint(0, 256, (9, 11, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)


def test_lossy_roundtrip_psnr_above_gate():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (32, 48), dtype=np.uint8)
    decoded = decode_image(encode_image(img, "jpeg"))
    assert decoded.shape == img.shape
    assert psnr(img, decoded) >= 40.0  # BASELINE.json invariant
    assert np.abs(decoded.astype(int) - img.astype(int)).max() <= 2


def test_png_is_lossless_psnr_inf():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert psnr(img, decode_image(encode_image(img, "png"))) == float("inf")


def test_real_jpeg_seam_raises_without_pil():
    """Real-codec seam contract where no image library exists: real
    JPEG magic (FFD8FF) must fail loudly with install guidance, never
    misdecode (reference decodes via PIL, captcha.py:20-25)."""
    from oa_spider_spark.kernels import codec

    if codec.HAS_REAL_JPEG:
        pytest.skip("PIL installed — covered by test_real_jpeg_roundtrip")
    fake_jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(fake_jpeg)
    with pytest.raises(NotImplementedError, match="PIL"):
        encode_image(np.zeros((4, 4), dtype=np.uint8), "jpeg_real")


def test_real_jpeg_roundtrip():
    """Validates the PIL adapter wherever PIL exists (skip-gated here):
    real JPEG bytes flow through the SAME decode_image dispatch and meet
    the PSNR >= 40 dB gate — so decode_stats/phash/PSNR run unchanged on
    production images (VERDICT r03 item 5)."""
    pytest.importorskip("PIL")
    from oa_spider_spark.kernels import codec

    rng = np.random.RandomState(5)
    # smooth gradient + mild noise: JPEG at q=90 holds >40 dB on natural
    # content (pure uniform noise would not — that is a codec property,
    # not a seam defect)
    base = np.linspace(0, 255, 48, dtype=np.uint8)[None, :].repeat(32, axis=0)
    img = (base.astype(int) + rng.randint(-8, 9, base.shape)).clip(0, 255).astype(np.uint8)
    data = codec.encode_jpeg_real(img, quality=90)
    assert data[:3] == b"\xff\xd8\xff"
    decoded = decode_image(data)  # sniffed dispatch, not a direct call
    assert decoded.shape == img.shape
    assert psnr(img, decoded) >= 40.0


def test_average_hash_deterministic_and_robust():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (40, 40), dtype=np.uint8)
    h1 = average_hash(img)
    assert h1 == average_hash(img.copy())
    # lossy re-encode should not flip many bits
    img2 = decode_image(encode_image(img, "jpeg"))
    h2 = average_hash(img2)
    assert bin(np.uint64(h1 ^ h2) & np.uint64(0xFFFFFFFFFFFFFFFF)).count("1") <= 4


def test_average_hash_small_hash_size():
    """hash_size < 8 must work (ADVICE r01: the packed-bytes u64 view only
    existed for 64 bits) and equal the naive shift-accumulate."""
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (32, 32), dtype=np.uint8)
    for hs in (2, 4, 8):
        got = average_hash(img, hash_size=hs)
        blocks = img.astype(np.float64).reshape(hs, 32 // hs, hs, 32 // hs).mean(axis=(1, 3))
        bits = (blocks > blocks.mean()).ravel()
        want = 0
        for b in bits:
            want = (want << 1) | int(b)
        if hs == 8 and want >= 1 << 63:
            want -= 1 << 64
        assert got == want, hs


# --- K10 learned-OCR backend (kernels/nn_ocr.py; ddddocr stand-in) -------


def test_nn_ocr_deterministic_weights():
    import numpy as np

    from oa_spider_spark.kernels import nn_ocr

    W1 = nn_ocr.glyph_classifier()
    nn_ocr.glyph_classifier.cache_clear()
    W2 = nn_ocr.glyph_classifier()
    assert W1.shape == (nn_ocr.GRID_H * nn_ocr.GRID_W + 1, 10)
    assert np.array_equal(W1, W2), "closed-form training must be bit-deterministic"


def test_nn_ocr_recovers_codes_all_scales():
    """The learned backend must match the template backend's exact-recovery
    bar on clean and speckled renders, at train and held-out scales."""
    import numpy as np

    from oa_spider_spark.kernels.image_ops import digit_templates, render_captcha
    from oa_spider_spark.kernels.nn_ocr import hack_captcha_nn

    rng = np.random.RandomState(99)
    for scale in ((2, 2), (3, 3), (5, 4)):  # (5,4) never seen in training
        t = digit_templates(*scale)
        for i in range(0, 10000, 1111):
            code = f"{i:04d}"
            assert hack_captcha_nn(render_captcha(code, t, noise=4, rng=rng)) == code


def test_nn_ocr_backend_seam_is_pluggable():
    """The ONNX swap point (VERDICT r03 missing #2): (a) the pipeline
    plumbing — segmentation order, batching, truncation — is backend-
    agnostic, proven by injecting a fake backend; (b) without
    onnxruntime the real adapter fails loudly with install guidance;
    (c) where onnxruntime exists, a linear ONNX model equal to the
    in-repo weights reproduces the default output (skip-gated)."""
    import numpy as np

    from oa_spider_spark.kernels import nn_ocr
    from oa_spider_spark.kernels.image_ops import render_captcha

    arr = render_captcha("3714")
    default = nn_ocr.hack_captcha_nn(arr, n=4)
    seen_batches = []

    def fake_predict(glyphs):
        seen_batches.append(len(glyphs))
        return ["7"] * len(glyphs)

    out = nn_ocr.hack_captcha_nn(arr, n=4, predict=fake_predict)
    assert out == "7" * min(4, seen_batches[0])
    assert seen_batches[0] == len(default)  # same segmentation reaches any backend
    try:
        import onnxruntime  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="onnxruntime"):
            nn_ocr.onnx_glyph_backend("/nonexistent/model.onnx")
        return
    # onnxruntime present: export W as a 1-layer ONNX matmul and pin
    # identity with the default backend
    import onnx
    from onnx import TensorProto, helper

    W = nn_ocr.glyph_classifier().astype(np.float32)
    node = helper.make_node("MatMul", ["x", "w"], ["y"])
    graph = helper.make_graph(
        [node], "lin",
        [helper.make_tensor_value_info("x", TensorProto.FLOAT, [None, W.shape[0]])],
        [helper.make_tensor_value_info("y", TensorProto.FLOAT, [None, W.shape[1]])],
        [helper.make_tensor("w", TensorProto.FLOAT, W.shape, W.ravel())],
    )
    import tempfile

    path = tempfile.mktemp(suffix=".onnx")
    onnx.save(helper.make_model(graph), path)
    assert nn_ocr.hack_captcha_nn(arr, predict=nn_ocr.onnx_glyph_backend(path)) == default
