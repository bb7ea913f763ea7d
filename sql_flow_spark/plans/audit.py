"""Plan audits as library functions (tests/test_plans.py uses the same
checks): make 'is this plan scale-shaped?' a one-liner."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_no_cartesian(df: DataFrame):
    p = plan_string(df)
    assert "CartesianProduct" not in p, "plan degraded to a cartesian product"


def scan_summary(df: DataFrame) -> list[dict]:
    """Per-scan pushed filters + read schema — what actually reaches
    the parquet reader."""
    p = plan_string(df)
    out = []
    for m in re.finditer(r"\(\d+\) Scan parquet.*?(?=\n\n)", p, re.S):
        block = m.group(0)
        pushed = re.search(r"PushedFilters: \[(.*?)\]", block, re.S)
        schema = re.search(r"ReadSchema: (.*)", block)
        out.append(
            {
                "pushed_filters": pushed.group(1).strip() if pushed else "",
                "read_schema": schema.group(1).strip() if schema else "",
            }
        )
    return out
