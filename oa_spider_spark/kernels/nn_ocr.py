"""K10 — learned-model OCR backend (deterministic stand-in for ddddocr).

The reference's second OCR path feeds captcha bytes to `ddddocr`, a
pretrained ONNX CNN (`oa.py:300-303`), as an alternative to the
projection-profile template matcher (`captcha.py:253-269`, our
image_ops.models_match). Shipping a real pretrained network is out of
scope for a deterministic engine (no model downloads, no onnxruntime in
the container), so this module reproduces the OPERATOR SHAPE with a
model that is trained at first use, in closed form, from a fixed seed:

* features — glyph binarized and nearest-resampled to a fixed
  GRID_H×GRID_W grid, flattened, bias appended (size-invariant, like the
  CNN's fixed input plane);
* training set — every digit rendered through the SAME pipeline the
  engine runs at inference (render → binarize → despeckle →
  split_glyphs) across several stroke scales and seeded speckle-noise
  draws, so train and inference distributions match by construction;
* model — one linear layer solved by ridge regression
  W = (XᵀX + λI)⁻¹ XᵀY (closed form ⇒ bit-deterministic for a fixed
  seed; no SGD, no wall-clock, no external weights);
* inference — logits = features @ W, argmax over the 10 digit classes.

What the Spark side exercises is identical to a real model deployment:
weights materialize once per executor (module-level cache), inference is
vectorized over Arrow batches (operators/multimodal.captcha_solve_nn),
and decode is argmax — swapping W for an ONNX session changes only
`classify_glyph` internals.
"""

from __future__ import annotations

import functools

import numpy as np

from .image_ops import (
    BLACK,
    THRESHOLD,
    binarize,
    despeckle,
    digit_templates,
    render_captcha,
    split_glyphs,
)

GRID_H, GRID_W = 12, 8
N_CLASSES = 10
_SEED = 20260817
_RIDGE_LAMBDA = 1e-3


def glyph_features(glyph: np.ndarray) -> np.ndarray:
    """Binary occupancy grid at fixed GRID_H×GRID_W + bias, float64.

    Nearest-neighbor index resampling (not bilinear) keeps the feature
    exactly reproducible across numpy versions — pure integer indexing.
    """
    h, w = glyph.shape
    ys = (np.arange(GRID_H) * h) // GRID_H
    xs = (np.arange(GRID_W) * w) // GRID_W
    grid = (glyph[np.ix_(ys, xs)] == BLACK).astype(np.float64)
    return np.concatenate([grid.ravel(), [1.0]])


def _training_glyphs() -> tuple[np.ndarray, np.ndarray]:
    """(X features, y labels) from seeded renders of each digit across
    stroke scales and noise draws, extracted by the inference pipeline."""
    rng = np.random.RandomState(_SEED)
    feats: list[np.ndarray] = []
    labels: list[int] = []
    for scale in ((2, 2), (3, 2), (2, 3), (3, 3), (4, 3)):
        templates = digit_templates(*scale)
        for d in range(N_CLASSES):
            for noise in (0, 3, 6):
                img = render_captcha(str(d), templates, noise=noise, rng=rng)
                glyphs = split_glyphs(despeckle(binarize(img)))
                # a single digit must segment to a single glyph; noise
                # that survived despeckle would break that — the render
                # only places isolated speckles, so this is an invariant
                assert len(glyphs) == 1, (d, scale, noise)
                feats.append(glyph_features(glyphs[0]))
                labels.append(d)
    return np.stack(feats), np.asarray(labels)


@functools.lru_cache(maxsize=1)
def glyph_classifier() -> np.ndarray:
    """The trained weight matrix W (d × 10), cached per process — the
    moral equivalent of loading pretrained weights once per executor."""
    X, y = _training_glyphs()
    Y = np.eye(N_CLASSES)[y]
    d = X.shape[1]
    W = np.linalg.solve(X.T @ X + _RIDGE_LAMBDA * np.eye(d), X.T @ Y)
    return W


def classify_glyph(glyph: np.ndarray, W: np.ndarray | None = None) -> str:
    if W is None:
        W = glyph_classifier()
    logits = glyph_features(glyph) @ W
    return str(int(np.argmax(logits)))


def hack_captcha_nn(arr: np.ndarray, n: int = 4, predict=None) -> str:
    """K10 pipeline: binarize → despeckle → split → NN classify, truncate
    to n chars — drop-in twin of image_ops.hack_captcha (K8) with the
    learned backend instead of template matching.

    `predict(glyphs: list[np.ndarray]) -> list[str]` swaps the model:
    default is the in-repo deterministic linear classifier; a real
    deployment passes `onnx_glyph_backend(path)` (the ddddocr analog,
    reference oa.py:302-303). The preprocessing/segmentation/order/
    truncation plumbing is backend-agnostic (pinned by test with an
    injected backend)."""
    glyphs = split_glyphs(despeckle(binarize(arr)))
    if predict is None:
        W = glyph_classifier()
        return "".join(classify_glyph(g, W) for g in glyphs)[:n]
    return "".join(predict(list(glyphs)))[:n]


def onnx_glyph_backend(model_path: str, providers: list[str] | None = None):
    """Real-model OCR backend: an ONNX session over the same glyph
    features (the ddddocr swap seam, reference oa.py:302-303). Returns
    a `predict(glyphs) -> labels` callable for hack_captcha_nn.
    Import-gated: raises with install guidance where onnxruntime is
    absent (this sandbox); validated by a skip-gated test wherever it
    IS installed (same policy as the PIL JPEG seam, codec.py)."""
    try:
        import onnxruntime as ort  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "the ONNX OCR backend needs onnxruntime (pip install "
            "onnxruntime); the in-sandbox deterministic backend is the "
            "default — see kernels/nn_ocr.py swap seam"
        ) from exc
    sess = ort.InferenceSession(
        model_path, providers=providers or ["CPUExecutionProvider"]
    )
    inp = sess.get_inputs()[0].name

    def predict(glyphs: list[np.ndarray]) -> list[str]:
        feats = np.stack([glyph_features(g) for g in glyphs]).astype(np.float32)
        logits = sess.run(None, {inp: feats})[0]
        return [str(int(i)) for i in logits.argmax(axis=1)]

    return predict
