"""Scalar-function goldens (F1-F18), including the reference's
clean_filename unit asserts (`/root/reference/oa_spider/test.py:10-13`)
ported verbatim, verified against a faithful Python model of
`oa.py:36-53`."""

import pytest
from pyspark.sql import functions as F

from oa_spider_spark.functions.scalar import (
    abstract_of,
    b64_decode_utf8,
    clean_filename,
    name_from_url,
    pretty_match,
    sizeof_fmt,
    squeeze_digits,
    url_param,
    valid_code,
)


def ref_clean_filename(name: str) -> str:
    """Faithful Python model of the reference implementation."""
    clean_chars = '<>:"/\\|?*' + "\n\r" + "\u000A\u000B\u000C\u000D\u0085\u2028\u2029"
    for c in clean_chars:
        name = name.replace(c, "")
    while True:
        if name.endswith("."):
            name = name[:-1]
        elif name.startswith("."):
            name = name[1:]
        else:
            break
    return name


CASES = [
    'e\\/:*?"<>|e',            # reference golden 1 (test.py:11)
    'e\\\\/:*?"<>|e',          # reference golden 2
    "normal name",
    "...leading.dots",
    "trailing.dots...",
    "..both..",
    "new\nline\rand seps here",
    "中文 文件名：测试?",
    "",
    "....",
    "a.b.c",
]


def test_reference_goldens_model():
    assert ref_clean_filename('e\\/:*?"<>|e') == "ee"
    assert ref_clean_filename('e\\\\/:*?"<>|e') == "ee"


@pytest.mark.parametrize("s", CASES)
def test_clean_filename_bit_exact(spark, s):
    df = spark.createDataFrame([(s,)], ["name"]).select(clean_filename("name").alias("c"))
    assert df.collect()[0]["c"] == ref_clean_filename(s)


def test_url_param_last_question_mark(spark):
    # reference url_params splits after the LAST '?' (oa.py:74-79)
    df = spark.createDataFrame(
        [("http://x/p?a=1?b=2&c=3",)], ["url"]
    ).select(url_param("url", "b").alias("b"), url_param("url", "c").alias("c"))
    row = df.collect()[0]
    assert row["b"] == "2" and row["c"] == "3"


def test_name_from_url(spark):
    df = spark.createDataFrame([("http://x/a/b/file.pdf",)], ["url"]).select(
        name_from_url("url").alias("n")
    )
    assert df.collect()[0]["n"] == "file.pdf"


def test_pretty_match_and_validate(spark):
    df = spark.createDataFrame(
        [("Ol23",), ("12i4",), ("abcd",), ("12345",)], ["code"]
    ).select(
        "code",
        pretty_match("code").alias("pm"),
        squeeze_digits("code").alias("sq"),
        valid_code("code").alias("ok"),
    )
    rows = {r["code"]: r for r in df.collect()}
    assert rows["Ol23"]["pm"] == "0123" and rows["Ol23"]["ok"]
    assert rows["12i4"]["sq"] == "1214" and rows["12i4"]["ok"]
    assert not rows["abcd"]["ok"]  # b->0 leaves '0' + acd stripped -> len 1
    assert not rows["12345"]["ok"]


def test_abstract_of(spark):
    html = "<div><p>Hello   world, this is a rather long note body for the abstract test</p></div>"
    df = spark.createDataFrame([(html,)], ["note"]).select(abstract_of("note").alias("a"))
    out = df.collect()[0]["a"]
    assert out.endswith("[...]")
    assert out == "Hello world, this is a rather long n[...]"


def test_b64_roundtrip(spark):
    df = spark.createDataFrame([("通知 content",)], ["s"]).select(
        b64_decode_utf8(F.base64(F.encode(F.col("s"), "utf-8"))).alias("out"), "s"
    )
    row = df.collect()[0]
    assert row["out"] == row["s"]


def test_sizeof_fmt_matches_reference_shape():
    assert sizeof_fmt(0) == "0.0B"
    assert sizeof_fmt(1536) == "1.5KB"
    assert sizeof_fmt(104857600) == "100.0MB"


# --- F8 RSA auth encryption (functions/rsa.py; JSEncrypt.py:17-19) -------


def test_rsa_demo_keypair_valid():
    from oa_spider_spark.functions.rsa import demo_keypair

    n, e, d = demo_keypair()
    assert n.bit_length() in (511, 512)
    assert e == 65537
    # d really inverts e for a couple of probes
    for m in (2, 12345, 2**200 + 17):
        assert pow(pow(m, e, n), d, n) == m


def test_rsa_envelope_roundtrip_and_determinism():
    from oa_spider_spark.functions.rsa import (
        decrypt_token_bytes,
        demo_keypair,
        encrypt_token_bytes,
    )

    n, e, d = demo_keypair()
    for tok in [b"userA:rc7", "päss通知:rc7".encode(), b"x"]:
        c1 = encrypt_token_bytes(tok, n, e)
        c2 = encrypt_token_bytes(tok, n, e)
        assert c1 == c2, "padding must be deterministic"
        assert len(c1) == (n.bit_length() + 7) // 8
        assert decrypt_token_bytes(c1, n, d) == tok
    # envelope shape: 00 02 <nonzero PS> 00 M
    raw = pow(int.from_bytes(encrypt_token_bytes(b"t", n, e), "big"), d, n)
    eb = raw.to_bytes((n.bit_length() + 7) // 8, "big")
    assert eb[:2] == b"\x00\x02"
    sep = eb.index(b"\x00", 2)
    assert all(b != 0 for b in eb[2:sep]) and sep >= 2 + 8


def test_rsa_token_too_long_raises():
    from oa_spider_spark.functions.rsa import demo_keypair, encrypt_token_bytes

    n, e, _ = demo_keypair()
    k = (n.bit_length() + 7) // 8
    with pytest.raises(ValueError):
        encrypt_token_bytes(b"x" * (k - 10), n, e)


def test_rsa_portable_key_and_chain():
    """The fixed 61-bit key actually decrypts, and the 16-squarings chain
    the DuckDB oracle replays equals Python pow."""
    from oa_spider_spark.functions.rsa import (
        PORTABLE_D,
        PORTABLE_E,
        PORTABLE_N,
        PORTABLE_P,
        PORTABLE_Q,
    )

    assert PORTABLE_P * PORTABLE_Q == PORTABLE_N
    assert PORTABLE_N.bit_length() == 61  # 2*61 < 127: HUGEINT-safe products
    for m in (0, 1, 123456789, PORTABLE_N - 1):
        c = pow(m, PORTABLE_E, PORTABLE_N)
        assert pow(c, PORTABLE_D, PORTABLE_N) == m
        x = m
        for _ in range(16):
            x = x * x % PORTABLE_N
        assert (x * m) % PORTABLE_N == c


def test_rsa_encrypt_column_roundtrips(spark):
    """Full-width column path: pandas_udf base64 ciphertexts decrypt back
    to the exact input tokens under the demo private key."""
    import base64

    from oa_spider_spark.functions.rsa import (
        decrypt_token_bytes,
        demo_keypair,
        rsa_encrypt,
    )

    n, _, d = demo_keypair()
    toks = [("userA:rc7",), ("p@ss通知:rc7",), ("c",)]
    df = spark.createDataFrame(toks, ["tok"]).select(
        "tok", rsa_encrypt(F.col("tok")).alias("cipher_b64")
    )
    for row in df.collect():
        got = decrypt_token_bytes(base64.b64decode(row["cipher_b64"]), n, d)
        assert got.decode() == row["tok"]


def test_rsa_null_tokens_stay_null(spark):
    """Code-review r02: NULL tokens crashed the portable path and became
    the ciphertext of the string 'None' in the full-width path."""
    from oa_spider_spark.functions.rsa import rsa_encrypt, rsa_encrypt_portable

    df = spark.createDataFrame([("a:rc7",), (None,)], "t: string")
    out = df.select(
        "t",
        rsa_encrypt_portable(F.col("t")).alias("pc"),
        rsa_encrypt(F.col("t")).alias("fc"),
    ).collect()
    by_tok = {r["t"]: r for r in out}
    assert by_tok["a:rc7"]["pc"] is not None and by_tok["a:rc7"]["fc"] is not None
    assert by_tok[None]["pc"] is None and by_tok[None]["fc"] is None


def test_rsa_portable_values_unchanged_by_null_rows(spark):
    """Advisor r02: a nullable long column crosses Arrow as float64, and
    m ~ 1.15e18 > 2^53, so int(m) silently ROUNDED every non-null row in
    a batch containing one NULL. Pin the non-null ciphertexts equal with
    and without a NULL row in the batch, and equal to pure-Python modpow."""
    import hashlib

    from oa_spider_spark.functions.rsa import (
        PORTABLE_E,
        PORTABLE_N,
        rsa_encrypt_portable,
    )

    def md5h60_py(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    toks = [f"user{i}:rc7" for i in range(8)]
    clean = spark.createDataFrame([(t,) for t in toks], "t: string").coalesce(1)
    dirty = spark.createDataFrame(
        [(t,) for t in toks] + [(None,)], "t: string"
    ).coalesce(1)  # one partition ⇒ NULL shares the Arrow batch

    def ciphers(df):
        rows = df.select("t", rsa_encrypt_portable(F.col("t")).alias("c")).collect()
        return {r["t"]: r["c"] for r in rows if r["t"] is not None}

    got_clean, got_dirty = ciphers(clean), ciphers(dirty)
    expect = {t: pow(md5h60_py(t) % PORTABLE_N, PORTABLE_E, PORTABLE_N) for t in toks}
    assert got_clean == expect
    assert got_dirty == expect
