"""URL functions — parity with the reference UDF surface.

The reference registers ``parse_domain`` (tldextract registered domain)
as a DuckDB python UDF (reference: sqlflow/udf/url.py:6,
dev/config/examples/udf.yml). Row-at-a-time Python is the slow path on
Spark, so the default implementation is pure Catalyst expressions
(regexp over a compact public-suffix heuristic); a pandas UDF variant
exists for user-supplied python functions (see sql_flow_spark.udf).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Host extraction from a URL: scheme://host[:port]/...
HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/:?#]+)"
# Multi-label public suffixes we recognize (compact heuristic; a real
# deployment would broadcast-join the full public-suffix list).
SUFFIX3_RE = r"([^.]+\.(?:co|com|org|net|ac|gov)\.(?:uk|au|jp|br|in))$"
SUFFIX2_RE = r"([^.]+\.[^.]+)$"


def url_host(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, HOST_RE, 1)


def parse_domain(url: Column | str) -> Column:
    """Registered domain of a URL (e.g. ``https://www.a.co.uk/x`` ->
    ``a.co.uk``), as a codegen-friendly expression."""
    host = url_host(url)
    dom3 = F.regexp_extract(host, SUFFIX3_RE, 1)
    dom2 = F.regexp_extract(host, SUFFIX2_RE, 1)
    return F.when(dom3 != "", dom3).otherwise(dom2)


# DuckDB oracle equivalent (same regexes; both engines use RE2-style
# syntax for these patterns).
def oracle_parse_domain(url_expr: str) -> str:
    host = f"regexp_extract({url_expr}, '{HOST_RE}', 1)"
    dom3 = f"regexp_extract({host}, '{SUFFIX3_RE}', 1)"
    dom2 = f"regexp_extract({host}, '{SUFFIX2_RE}', 1)"
    return f"CASE WHEN {dom3} <> '' THEN {dom3} ELSE {dom2} END"
