"""Multimodal queries (SURVEY §2.12 X9–X12, K8/K10, F16): synthetic
FIMG/FVID/AUD0 container decode, captcha OCR (template + learned), phash
near-dup images + clusters, resize, frame sampling, GBK decode, audio
stats. All pixel/byte work runs in mapInArrow over the shared kernels
(kernels/codec.py, kernels/image_ops.py); oracles are ground-truth
recomputation (relational dims + generated repr literals). Split out of
queries.py (VERDICT r04 #8, pure hygiene — no behavior change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _synth_images_df(spark: SparkSession, n: int = 60) -> DataFrame:
    from . import datagen
    from .kernels.codec import average_hash, encode_image

    rows = []
    for i in range(n):
        arr = datagen.synth_image(5000 + i)
        fmt = "png" if i % 2 == 0 else "jpeg"
        rows.append(
            (f"img{i:04d}", bytearray(encode_image(arr, fmt)), int(arr.shape[1]),
             int(arr.shape[0]), fmt, datagen.synth_caption(5000 + i), average_hash(arr))
        )
    return spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )


def q_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — Arrow-batch decode + stats + PSNR re-encode verify
    over the deterministic synthetic images table. Fully value-oracled
    (r03): dims/flag recomputed relationally from the seed arithmetic,
    float stats via generated repr-literal twins."""
    from .operators.multimodal import decode_stats

    return decode_stats(_synth_images_df(spark))


def q_captcha_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1-K8 captcha pipeline as a batch stage over rendered digit
    images (rows-only; exact-code recovery pinned in tests)."""
    import numpy as np

    from .kernels.codec import encode_image
    from .kernels.image_ops import digit_templates, render_captcha
    from .operators.multimodal import captcha_solve

    t = digit_templates()
    rng = np.random.RandomState(31)
    rows = []
    for i in range(40):
        code = f"{(i * 2467 + 123) % 10000:04d}"
        rows.append((f"cap{i:03d}", bytearray(encode_image(render_captcha(code, t, noise=5, rng=rng), "png"))))
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    return captcha_solve(df)


# Ground-truth recomputation: the rendered codes are (i*2467+123) % 10000,
# so the oracle regenerates what the pixel pipeline must recover. A wrong
# binarize/segment/match step shows up as a value mismatch.
SQL_CAPTCHA_PIPELINE = """
SELECT 'cap' || lpad(i::VARCHAR, 3, '0') AS image_id,
       lpad(((i * 2467 + 123) % 10000)::VARCHAR, 4, '0') AS code
FROM range(40) t(i)
"""


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — Arrow-batch bilinear resize to 32x32 thumbnails.
    Fully value-oracled (r03) via generated literals from the Python
    twin (payload length + resized phash); exactness of the pixel path
    additionally pinned in tests/test_operators.py."""
    from .operators.multimodal import resize_images

    return resize_images(_synth_images_df(spark, 40), out_w=32, out_h=32).select(
        "image_id", "w", "h", F.length("bytes").alias("thumb_bytes"), "phash"
    )


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — every-Nth frame sampling from synthetic video
    containers, then a PNG decode of each sampled frame's dimensions.
    Fully value-oracled by ground-truth recomputation: vid i holds
    6 + i%5 frames of synth_image(9000 + i*31 + j), whose h/w are pure
    integer arithmetic on the seed (datagen.synth_image), so the oracle
    regenerates (image_id, frame_idx, frame_w, frame_h) relationally —
    a wrong container split, sample stride, or decode shows up as a
    value mismatch."""
    import pyarrow as pa

    from . import datagen
    from .kernels.codec import decode_image
    from .operators.multimodal import _map_arrow, frame_sample, synth_video_bytes

    rows = []
    for i in range(12):
        frames = [datagen.synth_image(9000 + i * 31 + j) for j in range(6 + i % 5)]
        rows.append((f"vid{i:03d}", bytearray(synth_video_bytes(frames))))
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    sampled = frame_sample(df, every_n=3)

    def dims(batch: pa.RecordBatch) -> pa.RecordBatch:
        shapes = [decode_image(bytes(d)).shape for d in batch.column("frame_bytes").to_pylist()]
        # key columns pass through from the ORIGINAL batch (pa.array
        # re-inference would re-type int32 → int64, CLAUDE.md invariant)
        return pa.RecordBatch.from_arrays(
            [batch.column("image_id"), batch.column("frame_idx"),
             pa.array([s[1] for s in shapes], pa.int32()),
             pa.array([s[0] for s in shapes], pa.int32())],
            names=["image_id", "frame_idx", "frame_w", "frame_h"],
        )

    return _map_arrow(
        sampled, dims, "image_id string, frame_idx int, frame_w int, frame_h int"
    )


# Ground-truth recomputation (the captcha-oracle pattern): vid i has
# 6 + i%5 frames; sampling stride 3 keeps j*3 < n; frame seed is
# 9000 + i*31 + idx and synth_image dims are
#   m = (seed * 2654435761) & 0xFFFFFFFF;  h = 24 + m%41;  w = 24 + (m>>8)%41
SQL_FRAME_SAMPLE = """
WITH f AS (
  SELECT i, 3 * j AS idx
  FROM range(12) v(i), range(4) s(j)
  WHERE 3 * j < 6 + i % 5
), m AS (
  SELECT i, idx, ((9000 + i * 31 + idx) * 2654435761) & 4294967295 AS mm
  FROM f
)
SELECT 'vid' || lpad(i::VARCHAR, 3, '0') AS image_id,
       idx::INT AS frame_idx,
       (24 + (mm >> 8) % 41)::INT AS frame_w,
       (24 + mm % 41)::INT AS frame_h
FROM m
"""


def q_phash_near_dup_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — perceptual-hash Hamming near-dup image pairs via
    sound k+1-block pigeonhole LSH + bit_count verify. Fully oracled:
    the phashes are deterministic (average_hash of synth_image), so the
    oracle embeds them as literals and recomputes the PAIR JOIN
    relationally (bit_count(xor) in DuckDB matches Spark's
    two's-complement semantics) — a missed candidate pair shows up as a
    row-count mismatch, which is exactly the r02 recall bug class."""
    from .operators.multimodal import phash_hamming_pairs

    return phash_hamming_pairs(_synth_images_df(spark), max_hamming=16)


def q_image_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup clusters end-to-end (the image-axis twin of
    q_dedup_keep): phash Hamming pairs (sound k+1-block LSH, radius 12)
    → connected components → one representative per cluster (max pixel
    count, tie min image_id); singleton images keep themselves. Oracle:
    literal phashes → relational pair join → recursive-CTE closure →
    the same window — every stage of the composition is value-checked."""
    from .operators.dedup import connected_components
    from .operators.multimodal import phash_hamming_pairs

    imgs = _synth_images_df(spark)
    pairs = phash_hamming_pairs(imgs, max_hamming=12)
    num = lambda c: F.substring(c, 4, 10).cast("long")  # noqa: E731
    comp = connected_components(
        pairs.select(num("img_a").alias("a"), num("img_b").alias("b")),
        src="a",
        dst="b",
    )
    labeled = (
        imgs.select("image_id", num("image_id").alias("_nid"), "w", "h")
        .join(comp, F.col("_nid") == F.col("doc_id"), "left")
        .withColumn("component_id", F.coalesce("component_id", F.col("_nid")))
    )
    cw = Window.partitionBy("component_id")
    ranked = labeled.select(
        "image_id",
        F.concat(
            F.lit("img"), F.lpad(F.col("component_id").cast("string"), 4, "0")
        ).alias("cluster_id"),
        (F.col("w") * F.col("h")).cast("long").alias("rep_px"),
        F.count("*").over(cw).alias("n_members"),
        F.row_number()
        .over(cw.orderBy((F.col("w") * F.col("h")).desc(), F.col("image_id").asc()))
        .alias("_rk"),
    )
    return ranked.filter(F.col("_rk") == 1).drop("_rk")


def _sql_image_dedup_clusters() -> str:
    vals = ",\n".join(
        f"({int(r['image_id'][3:])}, {r['phash']}, {r['dec_w']}, {r['dec_h']})"
        for r in _image_twin_rows(60)
    )
    return f"""
WITH RECURSIVE p(i, phash, w, h) AS (VALUES
{vals}
), pairs AS (
  SELECT a.i AS u, b.i AS v
  FROM p a JOIN p b ON a.i < b.i
  WHERE bit_count(xor(a.phash::BIGINT, b.phash::BIGINT)) <= 12
), edges AS (
  SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
), reach(u, x) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.x = e.u
), lbl AS (
  SELECT u AS i, least(u, min(x)) AS component_id FROM reach GROUP BY u
), labeled AS (
  SELECT p.i, coalesce(l.component_id, p.i) AS component_id,
         p.w * p.h AS px
  FROM p LEFT JOIN lbl l USING (i)
), ranked AS (
  SELECT 'img' || lpad(i::VARCHAR, 4, '0') AS image_id,
         'img' || lpad(component_id::VARCHAR, 4, '0') AS cluster_id,
         CAST(px AS BIGINT) AS rep_px,
         count(*) OVER (PARTITION BY component_id) AS n_members,
         row_number() OVER (
           PARTITION BY component_id ORDER BY px DESC, i ASC
         ) AS rk
  FROM labeled
)
SELECT image_id, cluster_id, rep_px, n_members FROM ranked WHERE rk = 1
"""


def _image_twin_rows(n: int = 60):
    """Python twin of `_synth_images_df` → decode/stats/resize, used ONLY
    to generate literal ground-truth oracles (the IVF/captcha pattern:
    `repr(float)` literals in generated SQL — CLAUDE.md oracle trick).
    Everything here is deterministic: synth_image is pure seed
    arithmetic + PCG64 noise, the codecs are the repo's own."""
    from . import datagen
    from .kernels.codec import average_hash, decode_image, encode_image, psnr
    from .operators.multimodal import _bilinear

    rows = []
    for i in range(n):
        arr = datagen.synth_image(5000 + i)
        fmt = "png" if i % 2 == 0 else "jpeg"
        dec = decode_image(encode_image(arr, fmt))
        re_dec = decode_image(encode_image(dec, fmt))
        thumb = _bilinear(dec, 32, 32)
        rows.append({
            "image_id": f"img{i:04d}",
            "dec_w": int(dec.shape[1]), "dec_h": int(dec.shape[0]),
            "mean_px": float(dec.mean()), "std_px": float(dec.std()),
            "reencode_psnr": float(min(psnr(dec, re_dec), 1e6)),
            "phash": int(average_hash(arr)),
            "thumb_bytes": len(encode_image(thumb, "png")),
            "thumb_phash": int(average_hash(thumb)),
        })
    return rows


def _sql_image_decode_stats() -> str:
    """Hybrid ground-truth oracle: dec_w/dec_h/decode_ok recomputed
    RELATIONALLY from the seed arithmetic (the q_frame_sample pattern —
    synth_image dims are pure integer ops on the seed), float stats as
    generated repr literals joined on image_id."""
    vals = ",\n".join(
        f"('{r['image_id']}', {r['mean_px']!r}, {r['std_px']!r}, {r['reencode_psnr']!r})"
        for r in _image_twin_rows(60)
    )
    return f"""
WITH m AS (
  SELECT 'img' || lpad(i::VARCHAR, 4, '0') AS image_id,
         ((5000 + i) * 2654435761) & 4294967295 AS mm
  FROM range(60) t(i)
), px(image_id, mean_px, std_px, reencode_psnr) AS (VALUES
{vals}
)
SELECT m.image_id,
       (24 + (mm >> 8) % 41)::INT AS dec_w,
       (24 + mm % 41)::INT AS dec_h,
       mean_px::DOUBLE AS mean_px,
       std_px::DOUBLE AS std_px,
       reencode_psnr::DOUBLE AS reencode_psnr,
       true AS decode_ok
FROM m JOIN px ON px.image_id = m.image_id
"""


def _sql_image_resize() -> str:
    """Generated-literal oracle for the resize stage: 32×32 dims are
    relational constants; payload length and resized phash come from the
    Python twin (deterministic bilinear + PNG encoder)."""
    vals = ",\n".join(
        f"('{r['image_id']}', {r['thumb_bytes']}, {r['thumb_phash']})"
        for r in _image_twin_rows(40)
    )
    return f"""
SELECT image_id, 32::INT AS w, 32::INT AS h,
       thumb_bytes::INT AS thumb_bytes, phash::BIGINT AS phash
FROM (VALUES
{vals}
) t(image_id, thumb_bytes, phash)
"""


def _sql_phash_near_dups() -> str:
    """Literal phashes + RELATIONAL pair recomputation: DuckDB bit_count
    over xor of two's-complement BIGINTs matches Spark's F.bit_count, so
    the oracle independently derives every pair at Hamming ≤ 16 — the
    blocking scheme on the Spark side must lose no candidate."""
    vals = ",\n".join(
        f"('{r['image_id']}', {r['phash']})" for r in _image_twin_rows(60)
    )
    return f"""
WITH p(image_id, phash) AS (VALUES
{vals}
)
SELECT a.image_id AS img_a, b.image_id AS img_b,
       bit_count(xor(a.phash::BIGINT, b.phash::BIGINT))::INT AS hamming
FROM p a JOIN p b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash::BIGINT, b.phash::BIGINT)) <= 16
"""


def q_gbk_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16 — legacy-charset (GBK) decode in the Arrow parse stage
    (reference r.content.decode('GBK'), oa.py:931,963). Binary in, string
    out. Oracled by ground-truth recomputation: the plaintext is a
    deterministic function of i, so the oracle regenerates what the
    decode stage must produce from the GBK bytes."""
    from .operators.multimodal import decode_text

    texts = [f"通知文件{i}公告会议第{i % 7}号" for i in range(60)]
    df = spark.createDataFrame(
        [(i, bytearray(t.encode("gbk"))) for i, t in enumerate(texts)],
        "doc_id int, body binary",
    )
    return decode_text(df, "GBK").select("doc_id", "text")


SQL_GBK_DECODE = """
SELECT CAST(i AS INT) AS doc_id,
       '通知文件' || i::VARCHAR || '公告会议第' || (i % 7)::VARCHAR || '号' AS text
FROM range(60) t(i)
"""



def q_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio source — AUD0 container decode in mapInArrow
    (binary column in, typed metadata out; the audio analog of the image
    decode stage). Oracled by ground-truth recomputation of the
    header-derived fields (sample_rate / n_samples / duration_ms are
    closed-form in i); the sample-level stats (rms/peak) are pinned
    against a numpy twin in tests/test_operators.py instead."""
    from .operators.multimodal import audio_stats, synth_audio_bytes

    df = spark.createDataFrame(
        [(f"aud{i:03d}", bytearray(synth_audio_bytes(i))) for i in range(50)],
        "audio_id string, bytes binary",
    )
    return audio_stats(df).select("audio_id", "sample_rate", "n_samples", "duration_ms")


SQL_AUDIO_STATS = """
SELECT 'aud' || lpad(i::VARCHAR, 3, '0') AS audio_id,
       CAST(16000 AS INT) AS sample_rate,
       CAST(16000 * (1 + i % 3) + i * 7 AS BIGINT) AS n_samples,
       CAST((16000 * (1 + i % 3) + i * 7) * 1000 // 16000 AS BIGINT) AS duration_ms
FROM range(50) t(i)
"""


def q_captcha_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K10 — learned-model OCR (reference ddddocr path, oa.py:300-303)
    over the same rendered captcha set as q_captcha_pipeline, via the
    seeded closed-form classifier (kernels/nn_ocr.py). Ground-truth
    oracle: codes are (i*2467+987) % 10000 by construction, so a wrong
    feature grid / weight solve / argmax shows up as a value mismatch."""
    import numpy as np

    from .kernels.codec import encode_image
    from .kernels.image_ops import digit_templates, render_captcha
    from .operators.multimodal import captcha_solve_nn

    t = digit_templates()
    rng = np.random.RandomState(47)
    rows = []
    for i in range(40):
        code = f"{(i * 2467 + 987) % 10000:04d}"
        rows.append(
            (f"nn{i:03d}", bytearray(encode_image(render_captcha(code, t, noise=5, rng=rng), "png")))
        )
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    return captcha_solve_nn(df)


SQL_CAPTCHA_NN = """
SELECT 'nn' || lpad(i::VARCHAR, 3, '0') AS image_id,
       lpad(((i * 2467 + 987) % 10000)::VARCHAR, 4, '0') AS code
FROM range(40) t(i)
"""


# --- X90: magic-byte content-type sniffing ----------------------------------


def _synth_payloads_df(spark: SparkSession, n: int = 84) -> DataFrame:
    """Deterministic mixed-payload table: REAL container bytes from the
    repo's own codecs (PNG/FJPG via encode_image, AUD0 via
    synth_audio_bytes) plus HTML/gzip/opaque rows, actual format =
    i % 6. Every 7th row LIES in its transport header (claims
    image/png regardless) — the rows the sniffer must flag."""
    from . import datagen
    from .kernels.codec import encode_image
    from .operators.multimodal import synth_audio_bytes

    kinds = (
        "image/png", "image/jpeg", "audio/aud0",
        "text/html", "application/gzip", "application/octet-stream",
    )
    rows = []
    for i in range(n):
        k = i % 6
        if k == 0:
            body = encode_image(datagen.synth_image(7000 + i), "png")
        elif k == 1:
            body = encode_image(datagen.synth_image(7000 + i), "jpeg")
        elif k == 2:
            body = synth_audio_bytes(7000 + i)
        elif k == 3:
            body = b"<html><body>doc %d</body></html>" % i
        elif k == 4:
            body = b"\x1f\x8b\x08\x00" + bytes([i % 251]) * 16
        else:
            body = bytes([0, 1, 2, 3, i % 251]) * 8
        claimed = "image/png" if i % 7 == 0 else kinds[k]
        rows.append((f"p{i:04d}", claimed, bytearray(body)))
    return spark.createDataFrame(
        rows, "payload_id string, claimed_type string, bytes binary"
    )


def q_content_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte sniff + header-lie detection over the mixed synthetic
    payload table (operators/multimodal.py::sniff_content_type). The
    oracle regenerates (claimed, detected, mismatch) from the i % 6 /
    i % 7 construction arithmetic, so a wrong signature, precedence, or
    offset in the Spark CASE shows up as a value mismatch."""
    from .operators.multimodal import sniff_content_type

    return sniff_content_type(_synth_payloads_df(spark)).select(
        "payload_id", "claimed_type", "detected_type", "mismatch"
    )


SQL_CONTENT_SNIFF = """
WITH d AS (
  SELECT i,
         'p' || lpad(i::VARCHAR, 4, '0') AS payload_id,
         CASE i % 6 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
              WHEN 2 THEN 'audio/aud0' WHEN 3 THEN 'text/html'
              WHEN 4 THEN 'application/gzip'
              ELSE 'application/octet-stream' END AS actual
  FROM range(84) t(i)
)
SELECT payload_id,
       CASE WHEN i % 7 = 0 THEN 'image/png' ELSE actual END AS claimed_type,
       actual AS detected_type,
       CASE WHEN i % 7 = 0 AND actual <> 'image/png' THEN 1 ELSE 0 END
         AS mismatch
FROM d
"""


def register(queries: dict, oracles: dict) -> None:
    queries.update(
        {
            "q_image_decode_stats": q_image_decode_stats,
            "q_captcha_pipeline": q_captcha_pipeline,
            "q_phash_near_dup_images": q_phash_near_dup_images,
            "q_image_dedup_clusters": q_image_dedup_clusters,
            "q_image_resize": q_image_resize,
            "q_frame_sample": q_frame_sample,
            "q_gbk_decode": q_gbk_decode,
            "q_audio_stats": q_audio_stats,
            "q_captcha_nn": q_captcha_nn,
            "q_content_sniff": q_content_sniff,
        }
    )
    oracles.update(
        {
            "q_captcha_pipeline": SQL_CAPTCHA_PIPELINE,
            "q_frame_sample": SQL_FRAME_SAMPLE,
            # r03: the last three rows-only queries gained full ground-truth
            # oracles (relational dims + generated repr literals for the
            # codec-dependent values; relational pair join for phash) — the
            # no_oracle set is now empty.
            "q_image_decode_stats": _sql_image_decode_stats(),
            "q_image_resize": _sql_image_resize(),
            "q_phash_near_dup_images": _sql_phash_near_dups(),
            "q_image_dedup_clusters": _sql_image_dedup_clusters(),
            "q_gbk_decode": SQL_GBK_DECODE,
            "q_audio_stats": SQL_AUDIO_STATS,
            "q_captcha_nn": SQL_CAPTCHA_NN,
            "q_content_sniff": SQL_CONTENT_SNIFF,
        }
    )
