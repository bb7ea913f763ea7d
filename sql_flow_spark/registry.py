"""Query registry + cross-engine determinism helpers.

Every operator in SURVEY.md §2 registers a (spark, sf_dir) -> DataFrame
builder and, when SQL-expressible, a DuckDB oracle statement. The
driver's correctness gate hashes values column-by-column, so builders
are written to be *bit-identical* to their oracle:

- money/metric sums go through DECIMAL (exact, order-insensitive
  addition regardless of partitioning) and are cast to DOUBLE only at
  the output boundary;
- time buckets are emitted as formatted strings (the reference does the
  same for window output — dev/config/examples/tumbling.window.yml uses
  strftime on the bucket) to sidestep tz-awareness differences between
  Arrow producers;
- every ORDER-sensitive top-k has a total tiebreak order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query builder; ``oracle`` is DuckDB SQL or None for
    rows-only checks (non-SQL-expressible ops)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def scaled_int(col: Column | str, scale: int = 4) -> Column:
    """Fixed-point representation computed in pure IEEE double math.

    DOUBLE addition is not associative, so a shuffled Spark sum and a
    single-threaded DuckDB sum can differ in the last bits. Casting
    double->decimal is ALSO unsafe: Spark converts via the shortest
    string representation (BigDecimal.valueOf), DuckDB rounds the true
    binary value — they disagree on repr-boundary ties. floor(x*10^s +
    0.5) instead uses only IEEE ops (multiply, add, floor), which both
    engines evaluate bit-identically, then the integer sum is exact.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.floor(c * F.lit(float(10**scale)) + F.lit(0.5)).cast("decimal(30,0)")
    )


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-insensitive, engine-identical sum exposed as DOUBLE."""
    return F.sum(scaled_int(col, scale)).cast("double") / F.lit(float(10**scale))


def davg(col: Column | str, scale: int = 4) -> Column:
    """Exact-sum average divided in DOUBLE (engine-identical)."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c).cast("double")


# DuckDB-side equivalents for use inside oracle SQL strings.
def o_dsum(expr: str, scale: int = 4) -> str:
    m = float(10**scale)
    return (
        f"CAST(SUM(CAST(floor(({expr}) * {m} + 0.5) AS DECIMAL(30,0))) AS DOUBLE)"
        f" / {m}"
    )


def o_davg(expr: str, scale: int = 4) -> str:
    return f"{o_dsum(expr, scale)} / CAST(COUNT({expr}) AS DOUBLE)"


def ts_str(col: Column | str) -> Column:
    """Format a timestamp for output, matching DuckDB strftime."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


O_TS_STR = "strftime({expr}, '%Y-%m-%d %H:%M:%S')"
