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
