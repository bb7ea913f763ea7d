"""Oracle type-discipline guard (r11 verdict item 2).

The driver's value hash is type-sensitive: a DuckDB column whose type
has no exact Spark twin (HUGEINT from int128 promotion, DECIMAL from
integer division or exact SUM) hash-mismatches even when every value
is equal — this killed the Kaplan-Meier family for four rounds when a
windowed SUM(d + c) over BIGINT silently promoted n_risk to HUGEINT.

This test LIMIT-0-plans every committed oracle through DuckDB at
sf0.001 (no Spark, <5 s) and pins each output column to the closed set
of types the registry actually uses, all of which have exact Spark
equivalents: BIGINT/INTEGER (long/int), DOUBLE, VARCHAR, BOOLEAN.
Any new oracle that leaks HUGEINT, DECIMAL, or another unmapped type
fails here in the inner lane instead of in a red driver row.
"""

import duckdb
import pytest

import __spark_entry__ as entrymod
from sql_flow_spark.tables import TABLE_NAMES

# DuckDB types with an exact Spark/Arrow twin under the driver's
# type-sensitive value hash. Extend deliberately (e.g. DATE, TIMESTAMP)
# only alongside a matching Spark-side column — never to paper over an
# accidental promotion.
ALLOWED = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN"}

ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_have_spark_twins(name, duck, sf_dir):
    rel = duck.sql(f"SELECT * FROM ({ORACLES[name]}) LIMIT 0")
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ) not in ALLOWED
    ]
    assert not bad, (
        f"oracle '{name}' emits DuckDB types with no exact Spark twin "
        f"{bad}; CAST them (e.g. CAST(... AS BIGINT)) so the driver's "
        f"type-sensitive hash can match"
    )
