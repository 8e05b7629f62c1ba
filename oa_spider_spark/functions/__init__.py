"""Column-expression scalar functions (SURVEY.md §2.8 F1-F18).

Everything here is built from native `pyspark.sql.functions` — JVM-side,
whole-stage-codegen'd. No Python UDFs (BASELINE.json input_hint).
"""

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
