"""UDF registration by import path (reference: sqlflow/pipeline.py:302
init_udfs + sqlflow/udf/url.py).

The reference registers plain python functions into DuckDB. On Spark
row-at-a-time python is the slow path, so by default the function is
wrapped as an Arrow-batched pandas UDF (the python fn is applied over
a pd.Series — ~10-100x less overhead); set vectorized=False only for
functions that genuinely need row scope.

Functions that already operate on pd.Series are used as-is.
"""

from __future__ import annotations

import importlib
import inspect

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _load(import_path: str):
    module_name, function_name = import_path.rsplit(".", 1)
    return getattr(importlib.import_module(module_name), function_name)


def register_udf(
    spark: SparkSession,
    function_name: str,
    import_path: str,
    return_type: str = "string",
    vectorized: bool = True,
):
    fn = _load(import_path)

    if not vectorized:
        spark.udf.register(function_name, fn, returnType=return_type)
        return

    sig = inspect.signature(fn)
    takes_series = any(
        p.annotation is pd.Series for p in sig.parameters.values()
    )
    if takes_series:
        wrapped = fn
    else:
        def wrapped(*cols: pd.Series) -> pd.Series:  # scalar fn -> series map
            if len(cols) == 1:
                return cols[0].map(fn)
            return pd.Series(map(fn, *cols))

    spark.udf.register(
        function_name, F.pandas_udf(wrapped, returnType=return_type)
    )


def init_udfs(spark: SparkSession, udf_confs) -> None:
    for u in udf_confs:
        register_udf(
            spark, u.function_name, u.import_path, u.return_type, u.vectorized
        )


# ---- built-in UDF library (parity with reference sqlflow/udf/) ----

def parse_domain(url: str) -> str:
    """Registered domain (reference: sqlflow/udf/url.py:6 uses
    tldextract; same compact heuristic as functions/url.py). Prefer the
    expression version sql_flow_spark.functions.url.parse_domain — this
    python variant exists to exercise the UDF registration path."""
    import re

    m = re.search(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/:?#]+)", url or "")
    if not m:
        return ""
    host = m.group(1)
    m3 = re.search(r"([^.]+\.(?:co|com|org|net|ac|gov)\.(?:uk|au|jp|br|in))$", host)
    if m3:
        return m3.group(1)
    m2 = re.search(r"([^.]+\.[^.]+)$", host)
    return m2.group(1) if m2 else host
