"""Scalar functions of the reference, as native Column expressions.

Each function documents the reference site it reproduces
(`/root/reference/oa_spider/...`). These are canonicalization-critical:
`clean_filename` feeds the seen-set / ordering equivalence tests, so its
semantics must be bit-exact vs the reference implementation (golden-tested
in tests/test_functions.py against a faithful Python model).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F1 — clean_filename (oa.py:36-53): drop Windows-forbidden chars
# <>:"/\|?* plus newline family \n \r \x0b \x0c \x85    ,
# then strip leading/trailing dots (the reference's while-loop strips one
# dot per iteration until neither end has one == strip all edge dots).
_FORBIDDEN_CLASS = '[<>:"/\\\\|?*\\n\\r\\u000B\\u000C\\u0085\\u2028\\u2029]'


def clean_filename(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, _FORBIDDEN_CLASS, "")
    return F.regexp_replace(stripped, r"^\.+|\.+$", "")


# F2 — url_params (oa.py:74-79): parse the query string after the LAST '?'
# into a map. `substring_index(url,'?',-1)` returns the whole string when
# no '?' exists — exactly the reference's url[url.rfind('?')+1:].


def url_params_map(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.str_to_map(F.substring_index(c, "?", -1), F.lit("&"), F.lit("="))


def url_param(col: Column | str, key: str) -> Column:
    """One query parameter (used by F3's URL rewrite, oa.py:735-738)."""
    return url_params_map(col).getItem(key)


# F13 — name-from-url: url[url.rfind('/')+1:] (oa.py:775-776, 950-952).


def name_from_url(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, "/", -1)


# F6/O5 — guess_abstract (oa.py:24-34): HTML → text, first `n` chars,
# suffixed '[...]'. PyQuery(...).text() ~= strip tags + collapse whitespace.


def abstract_of(col: Column | str, n: int = 36) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    text = F.regexp_replace(c, r"<[^>]*>", "")
    text = F.trim(F.regexp_replace(text, r"\s+", " "))
    return F.concat(F.substring(text, 1, n), F.lit("[...]"))


# F9 — pretty_match OCR-confusable substitution (oa.py:248-259):
# O,o->0  I,i,l->1  b->0.


def pretty_match(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, "OoIilb", "001110")


# F10 — validate_code (oa.py:261-273): keep digits only; valid iff exactly 4.


def squeeze_digits(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(pretty_match(c), r"\D", "")


def valid_code(col: Column | str) -> Column:
    return F.length(squeeze_digits(col)) == 4


# F7 — base64-encoded mail body → utf-8 text (oa.py:423).


def b64_decode_utf8(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.unbase64(c).cast("string")


# F5 — sizeof_fmt (oa.py:82-87): display-only helper, driver-side.


def sizeof_fmt(num: float, suffix: str = "B", modulus: int = 1024) -> str:
    for unit in ["", "K", "M", "G", "T", "P", "E", "Z"]:
        if abs(num) < float(modulus):
            return "%3.1f%s%s" % (num, unit, suffix)
        num /= float(modulus)
    return "%.1f%s%s" % (num, "Y", suffix)
