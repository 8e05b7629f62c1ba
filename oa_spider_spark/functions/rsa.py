"""F8 — RSA auth-token encryption (reference `JSEncrypt.py:4-19`,
`oa.py:321-332`).

The reference logs in by fetching the server's RSA public key
(`GetRsaInfo`, oa.py:321-328) and sending
`encrpt(username + rsa_code, pub) + rsa_flag` /
`encrpt(password + rsa_code, pub) + rsa_flag` (oa.py:331-332), where
`encrpt` is PKCS#1 v1.5 encryption + base64 (JSEncrypt.py:17-19).
Round 1 scoped this out as driver-side auth; this module brings it into
the engine as a deterministic column transform so credential/token
columns can be sealed in bulk during a crawl-export job.

Differences from the reference, by design:

* **Deterministic padding.** PKCS#1 v1.5 pads with *random* nonzero
  bytes; a crawl engine needs resume-idempotent, testable output, so PS
  is drawn from an iterated-md5 stream of the message instead (still
  nonzero, still the 00 02 PS 00 M envelope). Security of the demo path
  is NOT the point — determinism under the engine's exactly-once
  contract is.
* **Bulk, not per-login**: a `pandas_udf` encrypts a whole Arrow batch
  of tokens per call; Python's native bignum `pow` is the modular-
  exponentiation engine (no per-row Python API, no F.udf).
* **Portable oracle mode**: textbook RSA over a fixed 61-bit modulus on
  `md5h60(token) % n`. e = 65537 = 2^16 + 1, so DuckDB reproduces the
  exact ciphertext with sixteen HUGEINT squarings + one multiply
  (generated SQL, `queries.py::SQL_RSA_AUTH`) — the same
  generated-literal oracle trick as the IVF centroids.
"""

from __future__ import annotations

import base64
import functools
import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# --- portable (oracle-able) textbook key: fixed 61-bit semiprime --------
# p, q are the first primes above 2^30; d verified in tests via
# pow(c, d, n) roundtrip. Small ON PURPOSE: products must fit DuckDB
# HUGEINT (2 * 61 = 122 < 127 bits) so the oracle can replay the
# square-and-multiply chain exactly.
PORTABLE_P = 1073741827
PORTABLE_Q = 1073741831
PORTABLE_N = PORTABLE_P * PORTABLE_Q  # 1152921515344265237 (61 bits)
PORTABLE_E = 65537
PORTABLE_D = 1117051592916508793

# The reference appends the server's `rsa_flag` to every ciphertext
# (oa.py:331-332); fixed here since the synthetic "server" is ours.
RSA_CODE = "rc7"
RSA_FLAG = "1"


def rsa_encrypt_portable(tokens: Column) -> Column:
    """Textbook-RSA ciphertext (long) of ``md5h60(token) % n``.

    The md5h60 hash runs JVM-side; only the modpow crosses to Python as
    one Arrow batch per partition. Matches `SQL_RSA_AUTH` bit-for-bit.
    """
    from ..operators.dedup import md5h60

    # Keep NULLs OUT of the udf input: a nullable long column crosses
    # Arrow as float64, and m values reach ~1.15e18 > 2^53, so every
    # non-null row in a batch containing one NULL would silently round
    # to a wrong ciphertext. Hash a coalesced token (series stays
    # int64), then mask the NULL rows back JVM-side.
    m = md5h60(F.coalesce(tokens, F.lit(""))) % F.lit(PORTABLE_N)

    @pandas_udf("long")
    def _modpow(ms: pd.Series) -> pd.Series:
        n, e = PORTABLE_N, PORTABLE_E
        return ms.map(lambda m_: pow(int(m_), e, n))

    return F.when(tokens.isNull(), F.lit(None).cast("long")).otherwise(_modpow(m))


# --- full-width engine path (PKCS#1 v1.5 envelope, 512-bit demo key) ----


def _is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for n < 3.3e24 (fixed-base set)."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _seeded_prime(bits: int, tag: bytes) -> int:
    """First prime at/after a seeded odd starting point with the top two
    bits set (so p*q always reaches the full modulus width)."""
    stream = b""
    counter = 0
    while len(stream) * 8 < bits:
        stream += hashlib.sha256(tag + counter.to_bytes(4, "big")).digest()
        counter += 1
    cand = int.from_bytes(stream[: (bits + 7) // 8], "big")
    cand |= (1 << (bits - 1)) | (1 << (bits - 2)) | 1
    cand &= (1 << bits) - 1
    while not _is_prime(cand):
        cand += 2
    return cand


@functools.lru_cache(maxsize=None)
def demo_keypair(bits: int = 512, seed: str = "oa-spider-spark-f8") -> tuple[int, int, int]:
    """Deterministic (n, e, d) demo keypair — the stand-in for the
    per-login server key the reference fetches (oa.py:321-328)."""
    half = bits // 2
    p = _seeded_prime(half, seed.encode() + b"|p")
    q = _seeded_prime(half, seed.encode() + b"|q")
    if p == q:  # astronomically unlikely with distinct tags; be safe
        q = _seeded_prime(half, seed.encode() + b"|q2")
    n, e = p * q, 65537
    d = pow(e, -1, (p - 1) * (q - 1))
    return n, e, d


def _det_padding(msg: bytes, n_pad: int) -> bytes:
    """n_pad nonzero bytes from an iterated-md5 stream of the message
    (the deterministic stand-in for PKCS#1 v1.5's random PS)."""
    out = bytearray()
    block = hashlib.md5(msg).digest()
    while len(out) < n_pad:
        out.extend(b for b in block if b != 0)
        block = hashlib.md5(block).digest()
    return bytes(out[:n_pad])


def encrypt_token_bytes(msg: bytes, n: int, e: int) -> bytes:
    """PKCS#1 v1.5-shaped encrypt of one message → k-byte ciphertext
    (JSEncrypt.py:18-19 semantics, deterministic PS)."""
    k = (n.bit_length() + 7) // 8
    if len(msg) > k - 11:
        raise ValueError(f"token too long for modulus: {len(msg)} > {k - 11}")
    eb = b"\x00\x02" + _det_padding(msg, k - 3 - len(msg)) + b"\x00" + msg
    c = pow(int.from_bytes(eb, "big"), e, n)
    return c.to_bytes(k, "big")


def decrypt_token_bytes(cipher: bytes, n: int, d: int) -> bytes:
    """Test-side inverse: strip the 00 02 PS 00 envelope."""
    eb = pow(int.from_bytes(cipher, "big"), d, n)
    k = (n.bit_length() + 7) // 8
    raw = eb.to_bytes(k, "big")
    if raw[:2] != b"\x00\x02":
        raise ValueError("bad envelope")
    return raw[raw.index(b"\x00", 2) + 1 :]


def rsa_encrypt(tokens: Column, n: int | None = None, e: int = 65537) -> Column:
    """Base64 PKCS#1-v1.5-shaped ciphertext column (full-width path;
    default key = `demo_keypair()`). One Arrow batch per partition."""
    if n is None:
        n = demo_keypair()[0]

    @pandas_udf("string")
    def _enc(ts: pd.Series) -> pd.Series:
        # NULL token → NULL cipher (not the ciphertext of the string "None")
        return ts.map(
            lambda t: base64.b64encode(
                encrypt_token_bytes(str(t).encode(), n, e)
            ).decode(),
            na_action="ignore",
        )

    return _enc(tokens)
