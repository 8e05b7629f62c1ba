"""Login-envelope query: the reference's login sequence (oa.py:288-344)
as ONE batch pipeline — captcha OCR (K8) → confusable-fix + validate
(F9/F10) → RSA credential envelope (F8/X17) — with a full DuckDB value
oracle. The real-socket composition of the same pieces (live transport,
cookie reuse) is frontier/auth.py, pinned in tests/test_auth.py; THIS is
its bulk twin: sealing a whole table of login attempts in one job, the
shape a 1000-executor credential-migration or session-warmup stage needs.

Oracle strategy: rendered codes are pure seed arithmetic
((i*2467+555) % 10000, with every 7th-ish row truncated to 3 digits so
the VALIDATE branch is exercised, not just present), so DuckDB
regenerates what the pixel pipeline must recover; the RSA modpow replays
as sixteen HUGEINT squarings + one multiply exactly like q_rsa_auth."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_LOGINS = 40


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_login_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.rsa import RSA_CODE, RSA_FLAG, rsa_encrypt_portable
    from .functions.scalar import squeeze_digits, valid_code
    from .kernels.codec import encode_image
    from .kernels.image_ops import digit_templates, render_captcha
    from .operators.multimodal import captcha_solve

    t = digit_templates()
    rows = []
    for i in range(N_LOGINS):
        code = f"{(i * 2467 + 555) % 10000:04d}"
        if i % 7 == 3:  # unsolvable-length captcha → must fail validation
            code = code[:3]
        rows.append(
            (f"login{i:03d}", bytearray(encode_image(render_captcha(code, t), "png")))
        )
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    solved = captcha_solve(df)  # image_id, code (K8 pixel pipeline)
    digits = squeeze_digits(F.col("code"))
    valid = valid_code(F.col("code"))
    # encrpt(username + rsa_code, pub) + rsa_flag (oa.py:331-332); the
    # envelope is only built for attempts that pass validation — NULL
    # token rows skip the modpow entirely (rsa_encrypt_portable masks)
    token = F.when(
        valid,
        F.concat(
            F.lit("user"), F.col("image_id"), F.lit(":"), digits,
            F.lit(":" + RSA_CODE),
        ),
    )
    cipher = rsa_encrypt_portable(token)
    return solved.select(
        "image_id",
        "code",
        valid.alias("valid"),
        cipher.alias("cipher"),
        F.when(valid, F.concat(cipher.cast("string"), F.lit(RSA_FLAG))).alias(
            "auth_token"
        ),
    )


def _sql_login_envelope() -> str:
    from .functions.rsa import PORTABLE_N, RSA_CODE, RSA_FLAG

    n = PORTABLE_N
    inner = f"""
SELECT image_id, code, valid, m, m AS x FROM (
  SELECT image_id, code, valid,
         CASE WHEN valid THEN
           CAST(('0x' || substr(md5('user' || image_id || ':' || code || ':{RSA_CODE}'), 1, 15))::BIGINT
                % {n} AS HUGEINT)
         END AS m
  FROM (
    SELECT 'login' || lpad(i::VARCHAR, 3, '0') AS image_id,
           CASE WHEN i % 7 = 3
                THEN substr(lpad(((i * 2467 + 555) % 10000)::VARCHAR, 4, '0'), 1, 3)
                ELSE lpad(((i * 2467 + 555) % 10000)::VARCHAR, 4, '0') END AS code,
           i % 7 != 3 AS valid
    FROM range({N_LOGINS}) t(i)
  )
)"""
    for _ in range(16):
        inner = f"SELECT image_id, code, valid, m, (x * x) % {n} AS x FROM ({inner})"
    return f"""
SELECT image_id, code, valid,
       CAST((x * m) % {n} AS BIGINT) AS cipher,
       CAST((x * m) % {n} AS BIGINT)::VARCHAR || '{RSA_FLAG}' AS auth_token
FROM ({inner})
"""


def q_rsa_auth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — RSA auth-token encryption (reference JSEncrypt.py:17-19,
    oa.py:321-332: `encrpt(username + rsa_code, pub) + rsa_flag`).
    Portable textbook mode over the fixed 61-bit key: token →
    md5h60 % n → m^65537 mod n (one Arrow-batch modpow; md5 JVM-side).
    The oracle replays the exact modpow in DuckDB HUGEINT as sixteen
    squarings + one multiply (e = 2^16 + 1). The full-width PKCS#1
    envelope path (functions/rsa.py::rsa_encrypt) is roundtrip-pinned in
    tests/test_functions.py."""
    from .functions.rsa import RSA_CODE, RSA_FLAG, rsa_encrypt_portable

    d = _t(spark, sf_dir, "documents")
    token = F.concat(
        F.lit("user"), F.col("doc_id").cast("string"), F.lit(":" + RSA_CODE)
    )
    c = rsa_encrypt_portable(token)
    return d.select(
        "doc_id",
        c.alias("cipher"),
        F.concat(c.cast("string"), F.lit(RSA_FLAG)).alias("auth_token"),
    )


def _sql_rsa_auth() -> str:
    """Generated oracle: md5h60(token) % n, then the e=65537 modpow
    unrolled as 16 nested HUGEINT squaring subqueries + final multiply.
    Nested (not textually expanded) so the SQL stays linear in size."""
    from .functions.rsa import PORTABLE_N, RSA_CODE, RSA_FLAG

    n = PORTABLE_N
    inner = f"""
SELECT doc_id, m, m AS x FROM (
  SELECT doc_id,
         CAST(('0x' || substr(md5('user' || doc_id::VARCHAR || ':{RSA_CODE}'), 1, 15))::BIGINT
              % {n} AS HUGEINT) AS m
  FROM documents
)"""
    for _ in range(16):
        inner = f"SELECT doc_id, m, (x * x) % {n} AS x FROM ({inner})"
    return f"""
SELECT doc_id,
       CAST((x * m) % {n} AS BIGINT) AS cipher,
       CAST((x * m) % {n} AS BIGINT)::VARCHAR || '{RSA_FLAG}' AS auth_token
FROM ({inner})
"""


def register(queries: dict, oracles: dict) -> None:
    queries["q_login_envelope"] = q_login_envelope
    oracles["q_login_envelope"] = _sql_login_envelope()
    queries["q_rsa_auth"] = q_rsa_auth
    oracles["q_rsa_auth"] = _sql_rsa_auth()
