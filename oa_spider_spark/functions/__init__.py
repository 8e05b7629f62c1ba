"""Column-expression scalar functions (SURVEY.md §2.8 F1-F18).

Everything here is built from native `pyspark.sql.functions` — JVM-side,
whole-stage-codegen'd. No Python UDFs (BASELINE.json input_hint). The one
exception is `rsa.py` (F8): bignum modular exponentiation has no JVM
column primitive, so it rides a pandas_udf (Arrow batch, never per-row).
"""

from .rsa import rsa_encrypt, rsa_encrypt_portable  # noqa: F401
from .scalar import (  # noqa: F401
    abstract_of,
    b64_decode_utf8,
    clean_filename,
    name_from_url,
    pretty_match,
    sizeof_fmt,
    squeeze_digits,
    url_param,
    url_params_map,
    valid_code,
)
