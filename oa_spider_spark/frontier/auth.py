"""Composed end-to-end login flow (VERDICT r04 missing #1) — the
reference's richest sequence, re-expressed over the engine's own pieces:

    captcha fetch → OCR solve (K8)  → confusable-fix + validate (F9/F10)
      → RSA credential envelope (X17/F8) → checkLogin POST
      → authenticated session reused by the fetch stage (X66 transport)

Reference behavior being matched (`/root/reference/oa_spider/oa.py`):

* ``get_code`` (oa.py:288-313): POST the login form for a
  ``validateCodeKey``, GET the captcha image for that key, OCR it.
* ``validate_code`` (oa.py:260-273): substitute OCR confusables
  (O,o→0 I,i,l→1 b→0), keep digits, accept iff exactly 4 remain.
* ``cc`` (oa.py:275-286): bounded retry until a valid code (the
  reference sleeps ``c`` seconds between tries; the engine twin is
  data-driven — a bounded attempt loop with no wall-clock sleeps, per
  the T3 timeout-discipline doctrine).
* ``login`` (oa.py:316-344): GET RSA info (``rsa_code``/``rsa_flag``/
  public key), POST ``encrpt(user + rsa_code) + rsa_flag`` etc. with the
  solved code, succeed iff ``loginstatus == 'true'``; the session cookie
  then authenticates every subsequent request.

Differences by design: the public key travels as JSON ``{"n": "...",
"e": ...}`` instead of PEM (stdlib-only, no ASN.1 parser), and the
PKCS#1-shaped envelope uses the deterministic padding documented in
functions/rsa.py. Everything is stdlib urllib — same zero-dependency
stance as the transport.
"""

from __future__ import annotations

import base64
import json
import re
import urllib.parse
import urllib.request
from dataclasses import dataclass, field

# Endpoint paths mirror the reference's constants (oa.py:60-74).
LOGIN_FORM = "/api/hrm/login/getLoginForm"
WEAVER_FILE = "/weaver/weaver.file.MakeValidateCode"
RSA_INFO = "/api/hrm/login/getRsaInfo"
CHECK_LOGIN = "/api/hrm/login/checkLogin"

_CONFUSABLES = str.maketrans("OoIilb", "001110")


def validate_code(code: str) -> tuple[bool, str]:
    """Python twin of functions/scalar.py's F9+F10 columns (reference
    validate_code, oa.py:260-273): confusable substitution, digits only,
    valid iff exactly four remain. The column and scalar forms are
    pinned equal in tests/test_auth.py."""
    digits = re.sub(r"\D", "", code.translate(_CONFUSABLES))
    return len(digits) == 4, digits


def solve_captcha_bytes(png: bytes) -> str:
    """K8 pixel pipeline over one wire-format captcha: decode →
    binarize → despeckle → split → template-match (captcha.py:305-316)."""
    from ..kernels.codec import decode_image
    from ..kernels.image_ops import digit_templates, hack_captcha

    return hack_captcha(decode_image(png), digit_templates())


@dataclass
class AuthSession:
    """An authenticated OA session: the cookie authorizes every
    subsequent fetch (the reference reuses ``self.session`` for all
    post-login requests, oa.py:345+)."""

    base_url: str
    cookie: str
    rsa_flag: str = "1"
    attempts: int = 1  # captcha tries it took (cc loop iterations)

    @property
    def headers(self) -> dict[str, str]:
        return {"Cookie": self.cookie}

    def fetch_fn(self, timeout_s: float = 10.0, max_workers: int = 16):
        """Arrow fetch function carrying this session's cookie — drop-in
        for ``fetch_stage(selected, fetch_fn=session.fetch_fn())``, so an
        authenticated crawl round differs from an anonymous one by ONE
        argument."""
        from .transport import http_fetch_batch_fn

        return http_fetch_batch_fn(
            timeout_s=timeout_s, max_workers=max_workers, headers=self.headers
        )


def _request(
    url: str, data: dict | None = None, headers: dict | None = None,
    timeout_s: float = 10.0,
):
    body = urllib.parse.urlencode(data).encode() if data is not None else None
    req = urllib.request.Request(
        url, data=body,
        headers={"User-Agent": "oa-spider-spark", **(headers or {})},
    )
    return urllib.request.urlopen(req, timeout=timeout_s)


def get_code(base_url: str, timeout_s: float = 10.0) -> tuple[str, str]:
    """One captcha attempt (oa.py:288-313): returns
    (validateCodeKey, raw OCR output — not yet validated)."""
    with _request(base_url + LOGIN_FORM, data={}, timeout_s=timeout_s) as r:
        form = json.loads(r.read())
    try:
        key = form["loginSetting"]["validateCodeKey"]
    except KeyError:
        # some sites need no captcha (oa.py:293-295)
        return "no validateCodeKey", "0123"
    qs = urllib.parse.urlencode({"validateCodeKey": key})
    with _request(f"{base_url}{WEAVER_FILE}?{qs}", timeout_s=timeout_s) as r:
        png = r.read()
    return key, solve_captcha_bytes(png)


def login(
    base_url: str,
    username: str,
    password: str,
    *,
    max_attempts: int = 5,
    timeout_s: float = 10.0,
) -> AuthSession | None:
    """The full reference login sequence (oa.py:316-344) over real
    sockets. Returns an AuthSession on success, None on a rejected
    login; raises after `max_attempts` captchas fail validation."""
    key = code = None
    attempts = 0
    for attempts in range(1, max_attempts + 1):  # the cc loop, bounded
        key, raw = get_code(base_url, timeout_s)
        ok, code = validate_code(raw)
        if ok:
            break
    else:
        raise RuntimeError(
            f"no valid captcha in {max_attempts} attempts (last: {code!r})"
        )

    # GET rsa info (oa.py:320-328); ts mirrors the reference's cache-bust
    # param — the value itself is never used in the envelope
    qs = urllib.parse.urlencode({"ts": 0})
    with _request(f"{base_url}{RSA_INFO}?{qs}", timeout_s=timeout_s) as r:
        info = json.loads(r.read())
    rsa_code, rsa_flag = info["rsa_code"], info["rsa_flag"]
    pub_n, pub_e = int(info["rsa_pub"]["n"]), int(info["rsa_pub"]["e"])

    from ..functions.rsa import encrypt_token_bytes

    def envelope(token: str) -> str:
        # encrpt(token + rsa_code, pub) + rsa_flag (oa.py:331-332)
        c = encrypt_token_bytes((token + rsa_code).encode(), pub_n, pub_e)
        return base64.b64encode(c).decode() + rsa_flag

    with _request(
        base_url + CHECK_LOGIN,
        data={
            "loginid": envelope(username),
            "userpassword": envelope(password),
            "validatecode": code,
            "validateCodeKey": key,
            "logintype": 1,
            "islanguid": 7,
            "isie": "false",
        },
        timeout_s=timeout_s,
    ) as r:
        status = json.loads(r.read())
        cookie = r.headers.get("Set-Cookie", "").split(";")[0]
    if status.get("loginstatus") != "true":
        return None
    return AuthSession(base_url, cookie, rsa_flag=rsa_flag, attempts=attempts)
