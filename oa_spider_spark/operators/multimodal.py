"""Multimodal (binary payload) operators over the images table
`(image_id, bytes, w, h, fmt, caption, phash)` — BASELINE.json input_hint.

The Spark-side plumbing is real and tested: BinaryType columns ride Arrow
batches through `mapInArrow`; schemas, batch shapes, and partitioning are
production-shaped. The *codecs* are the sandbox stand-ins from
kernels/codec.py (no image libraries in this container): PNG is a real
codec; JPEG is the documented deterministic quantizing stub. Swapping in
libjpeg/ffmpeg bindings changes only `decode_image` internals.

Operators:
* decode_stats     — decode + pixel stats + PSNR-vs-reencode verify
* captcha_solve    — the reference's full captcha pipeline (K1-K8) as a
                     batch stage
* resize_bilinear  — numpy bilinear resize of decoded payloads
* frame_sample     — video-style frame sampling STUB: treats the byte
                     payload as a container of N synthetic frames; real
                     decoder would go here (clearly marked)
* phash_hamming_pairs — near-dup images by perceptual-hash Hamming
                     distance (JVM bit_count, no Python)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import image_ops
from ..kernels.codec import average_hash, decode_image, encode_image, psnr


def _map_arrow(df: DataFrame, fn, out_ddl: str) -> DataFrame:
    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if b.num_rows:
                yield fn(b)

    return df.mapInArrow(run, schema=out_ddl)


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every payload; emit shape, mean/std, recompressed PSNR and
    the per-row invariant flags. Arrow batch in, Arrow batch out."""

    def fn(batch: pa.RecordBatch) -> pa.RecordBatch:
        ids = batch.column("image_id").to_pylist()
        datas = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        out = {"image_id": [], "dec_w": [], "dec_h": [], "mean_px": [], "std_px": [],
               "reencode_psnr": [], "decode_ok": []}
        for i, data in enumerate(datas):
            out["image_id"].append(ids[i])
            try:
                arr = decode_image(data)
                re_dec = decode_image(encode_image(arr, fmts[i]))
                p = psnr(arr, re_dec)
                out["dec_h"].append(arr.shape[0])
                out["dec_w"].append(arr.shape[1])
                out["mean_px"].append(float(arr.mean()))
                out["std_px"].append(float(arr.std()))
                out["reencode_psnr"].append(float(min(p, 1e6)))
                out["decode_ok"].append(True)
            except Exception:
                out["dec_h"].append(0)
                out["dec_w"].append(0)
                out["mean_px"].append(0.0)
                out["std_px"].append(0.0)
                out["reencode_psnr"].append(0.0)
                out["decode_ok"].append(False)
        schema = pa.schema(
            [("image_id", pa.string()), ("dec_w", pa.int32()), ("dec_h", pa.int32()),
             ("mean_px", pa.float64()), ("std_px", pa.float64()),
             ("reencode_psnr", pa.float64()), ("decode_ok", pa.bool_())]
        )
        return pa.RecordBatch.from_pydict(out, schema=schema)

    return _map_arrow(
        images.select("image_id", "bytes", "fmt"),
        fn,
        "image_id string, dec_w int, dec_h int, mean_px double, std_px double, "
        "reencode_psnr double, decode_ok boolean",
    )


def captcha_solve(images: DataFrame) -> DataFrame:
    """K1-K8 as a batch stage: binarize → despeckle → split → match."""
    templates = image_ops.digit_templates()

    def fn(batch: pa.RecordBatch) -> pa.RecordBatch:
        ids = batch.column("image_id").to_pylist()
        datas = batch.column("bytes").to_pylist()
        codes = []
        for data in datas:
            try:
                codes.append(image_ops.hack_captcha(decode_image(data), templates))
            except Exception:
                codes.append(None)
        return pa.RecordBatch.from_pydict({"image_id": ids, "code": codes})

    return _map_arrow(images.select("image_id", "bytes"), fn, "image_id string, code string")


def captcha_solve_nn(images: DataFrame) -> DataFrame:
    """K10 — learned-model OCR backend (reference ddddocr path,
    oa.py:300-303) as a batch stage. The seeded closed-form classifier
    (kernels/nn_ocr.py) materializes once per executor process via its
    module cache — the deployment shape of any pretrained model: weights
    resident per worker, inference vectorized over Arrow batches."""
    from ..kernels.nn_ocr import glyph_classifier, hack_captcha_nn

    def fn(batch: pa.RecordBatch) -> pa.RecordBatch:
        glyph_classifier()  # warm the per-process weight cache once
        codes = []
        for data in batch.column("bytes").to_pylist():
            try:
                codes.append(hack_captcha_nn(decode_image(data)))
            except Exception:
                codes.append(None)
        # pass the key column through untouched (no pa.array re-inference)
        return pa.RecordBatch.from_arrays(
            [batch.column("image_id"), pa.array(codes, pa.string())],
            names=["image_id", "code"],
        )

    return _map_arrow(images.select("image_id", "bytes"), fn, "image_id string, code string")


def _bilinear(arr: np.ndarray, oh: int, ow: int) -> np.ndarray:
    h, w = arr.shape[:2]
    ys = (np.arange(oh) + 0.5) * h / oh - 0.5
    xs = (np.arange(ow) + 0.5) * w / ow - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None]
    wx = np.clip(xs - x0, 0, 1)[None, :]
    a = arr[np.ix_(y0, x0)].astype(np.float64)
    b = arr[np.ix_(y0, x1)].astype(np.float64)
    c = arr[np.ix_(y1, x0)].astype(np.float64)
    d = arr[np.ix_(y1, x1)].astype(np.float64)
    out = a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def resize_images(images: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Decode → bilinear resize → re-encode PNG. Output keeps image_id,
    new payload + dims + phash of the resized pixels."""

    def fn(batch: pa.RecordBatch) -> pa.RecordBatch:
        ids = batch.column("image_id").to_pylist()
        datas = batch.column("bytes").to_pylist()
        payloads, phs = [], []
        for data in datas:
            arr = _bilinear(decode_image(data), out_h, out_w)
            payloads.append(encode_image(arr, "png"))
            phs.append(average_hash(arr))
        return pa.RecordBatch.from_arrays(
            [pa.array(ids, pa.string()), pa.array(payloads, pa.binary()),
             pa.array([out_w] * len(ids), pa.int32()), pa.array([out_h] * len(ids), pa.int32()),
             pa.array(phs, pa.int64())],
            names=["image_id", "bytes", "w", "h", "phash"],
        )

    return _map_arrow(
        images.select("image_id", "bytes"), fn,
        "image_id string, bytes binary, w int, h int, phash long",
    )


def frame_sample(videos: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame-sampling plumbing. The real decoder is STUBBED (no
    av/ffmpeg in this container): payloads produced by
    `synth_video_bytes` are a trivial concat container of PNG frames;
    a real implementation replaces `_split_frames` with PyAV and keeps
    everything else (schema, explode shape, batching) unchanged."""

    def _split_frames(data: bytes) -> list[bytes]:
        # container format: 4-byte frame count, then (4-byte len, frame)*
        import struct

        if len(data) < 4 or data[:4] == b"\x89PNG":
            raise NotImplementedError(
                "real video codec not available in-container; payload is "
                "not a synthetic frame container"
            )
        (n,) = struct.unpack_from(">I", data, 0)
        frames, pos = [], 4
        for _ in range(n):
            (ln,) = struct.unpack_from(">I", data, pos)
            pos += 4
            frames.append(data[pos : pos + ln])
            pos += ln
        return frames

    def fn(batch: pa.RecordBatch) -> pa.RecordBatch:
        ids = batch.column("image_id").to_pylist()
        datas = batch.column("bytes").to_pylist()
        out_id, out_idx, out_frame = [], [], []
        for vid, data in zip(ids, datas):
            frames = _split_frames(data)
            for i in range(0, len(frames), every_n):
                out_id.append(vid)
                out_idx.append(i)
                out_frame.append(frames[i])
        return pa.RecordBatch.from_arrays(
            [pa.array(out_id, pa.string()), pa.array(out_idx, pa.int32()),
             pa.array(out_frame, pa.binary())],
            names=["image_id", "frame_idx", "frame_bytes"],
        )

    return _map_arrow(
        videos.select("image_id", "bytes"), fn,
        "image_id string, frame_idx int, frame_bytes binary",
    )


def synth_video_bytes(frames: list[np.ndarray]) -> bytes:
    """Deterministic fake video container (frame-count + length-prefixed
    PNG frames) for testing `frame_sample`'s plumbing."""
    import struct

    out = [struct.pack(">I", len(frames))]
    for f in frames:
        b = encode_image(f, "png")
        out.append(struct.pack(">I", len(b)))
        out.append(b)
    return b"".join(out)


AUDIO_MAGIC = b"AUD0"


def synth_audio_bytes(seed: int, sample_rate: int = 16000) -> bytes:
    """Deterministic fake audio container: magic + uint32 sample_rate +
    uint32 n_samples + int16 little-endian PCM of a quantized sine.
    freq/amplitude/length all derive from `seed` — the audio analog of
    synth_video_bytes (real codecs aren't in this container; audio_stats
    raises NotImplementedError on non-AUD0 payloads)."""
    import struct

    n_samples = sample_rate * (1 + seed % 3) + seed * 7
    freq = 200 + (seed * 37) % 1800
    amp = 8000 + (seed % 8) * 2000
    t = np.arange(n_samples, dtype=np.float64)
    pcm = np.round(amp * np.sin(2 * np.pi * freq * t / sample_rate)).astype("<i2")
    return AUDIO_MAGIC + struct.pack("<II", sample_rate, n_samples) + pcm.tobytes()


def audio_stats(audios: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Multimodal audio source (binary column + typed metadata out):
    decode the AUD0 container per Arrow batch and emit header- and
    sample-level stats. Real formats (wav/mp3/ogg) would slot in behind
    the same mapInArrow signature with soundfile/ffmpeg — unavailable in
    this container, so non-AUD0 payloads raise NotImplementedError
    (documented stub, plumbing is real). Output: (audio_id, sample_rate,
    n_samples, duration_ms, rms, peak)."""
    import struct

    def fn(batch: pa.RecordBatch) -> pa.RecordBatch:
        ids = batch.column("audio_id").to_pylist()
        datas = batch.column(bytes_col).to_pylist()
        out = {"audio_id": [], "sample_rate": [], "n_samples": [],
               "duration_ms": [], "rms": [], "peak": []}
        for aid, data in zip(ids, datas):
            if data[:4] != AUDIO_MAGIC:
                raise NotImplementedError(
                    "real audio codecs unavailable in this container; "
                    "only the AUD0 synthetic format decodes"
                )
            rate, n = struct.unpack("<II", data[4:12])
            pcm = np.frombuffer(data, dtype="<i2", offset=12, count=n).astype(np.float64)
            out["audio_id"].append(aid)
            out["sample_rate"].append(rate)
            out["n_samples"].append(n)
            out["duration_ms"].append(n * 1000 // rate)
            out["rms"].append(int(np.sqrt(np.mean(pcm * pcm))))
            out["peak"].append(int(np.max(np.abs(pcm))))
        return pa.RecordBatch.from_arrays(
            [pa.array(out["audio_id"], pa.string()),
             pa.array(out["sample_rate"], pa.int32()),
             pa.array(out["n_samples"], pa.int64()),
             pa.array(out["duration_ms"], pa.int64()),
             pa.array(out["rms"], pa.int32()),
             pa.array(out["peak"], pa.int32())],
            names=list(out),
        )

    return _map_arrow(
        audios.select("audio_id", bytes_col),
        fn,
        "audio_id string, sample_rate int, n_samples long, duration_ms long, "
        "rms int, peak int",
    )


def phash_hamming_pairs(
    images: DataFrame, max_hamming: int = 6, max_block: int | None = None
) -> DataFrame:
    """Near-duplicate images by phash Hamming distance, blocked on
    max_hamming+1 disjoint phash blocks (`dedup.hamming_blocks`): the
    pigeonhole candidate set is complete for the REQUESTED radius — the
    old fixed 4×16 split silently missed any pair with ≥1 differing bit
    in every block once the radius exceeded 3 (VERDICT r02 item 3).
    Candidate gen + exact bit_count verify, all JVM: explode +
    equi-join + bit_count. `max_block` is the hot-block guard for the
    scale path (narrow blocks at large radii ⇒ hotter buckets)."""
    from .dedup import _cap_groups, hamming_blocks

    blocks = images.select(
        "image_id", "phash",
        F.explode(F.array(*hamming_blocks("phash", max_hamming))).alias("b"),
    ).select("image_id", "phash", "b.blk", "b.val")
    blocks = _cap_groups(blocks, ["blk", "val"], max_block)
    a, b = blocks.alias("a"), blocks.alias("b")
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        a.join(b, ["blk", "val"])
        .filter(F.col("a.image_id") < F.col("b.image_id"))
        .select(
            F.col("a.image_id").alias("img_a"),
            F.col("b.image_id").alias("img_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def decode_text(df: DataFrame, charset: str = "GBK", bytes_col: str = "body",
                out_col: str = "text") -> DataFrame:
    """Parse-stage charset decode (reference F16: `r.content.decode('GBK')`,
    oa.py:931,963). Spark's built-in `F.decode` only covers the UTF/ASCII
    family, so legacy-charset decode rides the Arrow parse stage like the
    rest of the HTML/JSON parsing (SURVEY.md S5/F15) — batch-at-a-time,
    never a row UDF. Undecodable payloads yield NULL (the reference would
    raise; a crawl engine dead-letters instead)."""
    in_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def fn(batch: pa.RecordBatch) -> pa.RecordBatch:
        datas = batch.column(bytes_col).to_pylist()
        texts = []
        for data in datas:
            try:
                texts.append(None if data is None else bytes(data).decode(charset))
            except (UnicodeDecodeError, LookupError):
                texts.append(None)
        cols = list(batch.columns) + [pa.array(texts, pa.string())]
        return pa.RecordBatch.from_arrays(cols, names=batch.schema.names + [out_col])

    return _map_arrow(df, fn, f"{in_ddl}, {out_col} string")


def sniff_content_type(
    df: DataFrame, bytes_col: str = "bytes", claimed_col: str = "claimed_type"
) -> DataFrame:
    """X90: magic-byte content-type sniffing — trust the payload, not
    the header. Real crawls route fetched bytes by what they ARE
    (decoders crash or, worse, get exploited on mislabeled payloads),
    so the decode dispatch must run on the leading magic, exactly like
    kernels/codec.py::decode_image does per format.

    Entirely JVM-side: one `substring(bytes, …)` per signature compared
    against X'…' binary literals in a single CASE — a row-local
    projection with NO shuffle, NO Python, and only the first 8 bytes
    of each payload ever examined (Parquet column projection keeps the
    blob scan sequential; at 100 TB this is scan-bound, exactly as a
    byte-sniffer should be).

    Signature table (precedence = CASE order, longest magic first):
    \\x89PNG\\r\\n\\x1a\\n → image/png; FJPG (the sandbox lossy
    stand-in) and \\xFF\\xD8\\xFF (real JPEG) → image/jpeg; AUD0 →
    audio/aud0; \\x1f\\x8b → application/gzip; leading '<' →
    text/html; else application/octet-stream. `mismatch` flags rows
    whose transport-claimed type disagrees with the sniffed one — the
    feed for a quarantine/refetch policy.
    """
    detected = F.expr(
        f"CASE WHEN substring({bytes_col}, 1, 8) = X'89504E470D0A1A0A'"
        "       THEN 'image/png'"
        f"      WHEN substring({bytes_col}, 1, 4) = X'464A5047'"
        "       THEN 'image/jpeg'"
        f"      WHEN substring({bytes_col}, 1, 3) = X'FFD8FF'"
        "       THEN 'image/jpeg'"
        f"      WHEN substring({bytes_col}, 1, 4) = X'41554430'"
        "       THEN 'audio/aud0'"
        f"      WHEN substring({bytes_col}, 1, 2) = X'1F8B'"
        "       THEN 'application/gzip'"
        f"      WHEN substring({bytes_col}, 1, 1) = X'3C'"
        "       THEN 'text/html'"
        "      ELSE 'application/octet-stream' END"
    )
    return df.withColumn("detected_type", detected).withColumn(
        "mismatch",
        F.when(F.col(claimed_col) != F.col("detected_type"), 1)
        .otherwise(0)
        .cast("int"),
    )


def charset_detect(
    blobs: DataFrame,
    hex_col: str = "lead_hex",
    header_col: str = "header_ct",
    html_col: str = "html",
    high_byte_threshold_milli: int = 300,
) -> DataFrame:
    """Charset detection cascade in WHATWG encoding-sniffing order —
    BOM > transport header > meta prescan > content heuristic — the
    decision F16's GBK decode sits downstream of (the reference
    hardcodes per-site GBK, oa.py:931; a general crawl must sniff).
    `lead_hex` is the uppercase hex of the payload's leading bytes (the
    cross-engine-safe binary representation).

    * BOM: EFBBBF → utf-8, FFFE → utf-16le, FEFF → utf-16be;
    * header/meta: charset= parameter via one regexp_extract each
      (empty → NULL via nullif, matching DuckDB's no-match NULL);
    * heuristic: share of leading bytes with the high bit set
      (first hex nibble ≥ '8' — an ASCII string compare on upper hex)
      over threshold → 'gbk-likely', else 'ascii'.

    Every signal is a row-local expression; the pair walk guards the
    F.sequence(1,0) DESCENDING trap with an explicit n_pairs >= 1
    branch (CLAUDE.md). Output adds charset, charset_source,
    highbyte_milli."""
    hx = F.upper(F.col(hex_col))
    bom = (
        F.when(hx.startswith("EFBBBF"), "utf-8")
        .when(hx.startswith("FFFE"), "utf-16le")
        .when(hx.startswith("FEFF"), "utf-16be")
    )
    header = F.nullif(
        F.lower(
            F.regexp_extract(F.col(header_col), r"(?i)charset=([A-Za-z0-9_-]+)", 1)
        ),
        F.lit(""),
    )
    meta = F.nullif(
        F.lower(
            F.regexp_extract(
                F.col(html_col), "(?i)<meta[^>]*charset=[\"']?([A-Za-z0-9_-]+)", 1
            )
        ),
        F.lit(""),
    )
    n_pairs = F.expr(f"length(upper({hex_col})) div 2")
    hb = F.when(
        n_pairs >= 1,
        F.expr(
            f"size(filter(sequence(1, length(upper({hex_col})) div 2),"
            f" i -> substring(upper({hex_col}), 2*i-1, 1) >= '8'))"
        ),
    ).otherwise(F.lit(0))
    base = blobs.withColumn("_np", n_pairs.cast("long")).withColumn(
        "_hb", hb.cast("long")
    )
    milli = F.when(
        F.col("_np") > 0, F.expr("1000 * _hb div _np")
    ).otherwise(F.lit(0).cast("long"))
    heur = F.when(
        milli > high_byte_threshold_milli, F.lit("gbk-likely")
    ).otherwise(F.lit("ascii"))
    return base.select(
        *blobs.columns,
        milli.alias("highbyte_milli"),
        F.coalesce(bom, header, meta, heur).alias("charset"),
        F.when(bom.isNotNull(), "bom")
        .when(header.isNotNull(), "header")
        .when(meta.isNotNull(), "meta")
        .otherwise("heuristic")
        .alias("charset_source"),
    )
