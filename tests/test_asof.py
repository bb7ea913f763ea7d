"""asof_join semantics: backward match, >= tie inclusion, NULL when no
prior right row, multi-key isolation — pinned on synthetic frames
(the registered asof_attribution key is additionally DuckDB
ASOF-JOIN-verified in test_queries_oracle)."""

from pyspark.sql import functions as F

from sql_flow_spark.operators.asof import asof_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_basic(spark):
    left = _mk(
        spark,
        [(1, 10, "a"), (1, 25, "b"), (2, 5, "c")],
        "k int, ts int, tag string",
    )
    right = _mk(
        spark,
        [(1, 8, 100.0), (1, 20, 200.0), (2, 50, 300.0)],
        "k int, ts int, payload double",
    )
    out = {
        r["tag"]: (r["payload"], r["asof_ts"])
        for r in asof_join(left, right, ["k"], "ts", ["payload"]).collect()
    }
    assert out["a"] == (100.0, 8)  # latest right at-or-before 10
    assert out["b"] == (200.0, 20)  # supersedes the earlier right row
    assert out["c"] == (None, None)  # right row is in the future


def test_asof_equal_ts_matches(spark):
    left = _mk(spark, [(1, 10, "x")], "k int, ts int, tag string")
    right = _mk(spark, [(1, 10, 7.0)], "k int, ts int, payload double")
    row = asof_join(left, right, ["k"], "ts", ["payload"]).collect()[0]
    assert row["payload"] == 7.0 and row["asof_ts"] == 10


def test_asof_keys_isolated(spark):
    left = _mk(spark, [(1, 10, "x"), (2, 10, "y")], "k int, ts int, tag string")
    right = _mk(spark, [(2, 3, 9.0)], "k int, ts int, payload double")
    out = {
        r["tag"]: r["payload"]
        for r in asof_join(left, right, ["k"], "ts", ["payload"]).collect()
    }
    assert out == {"x": None, "y": 9.0}


def test_asof_left_columns_pass_through(spark):
    left = _mk(spark, [(1, 10, "x")], "k int, ts int, tag string")
    right = _mk(spark, [(1, 2, 1.5)], "k int, ts int, payload double")
    df = asof_join(left, right, ["k"], "ts", ["payload"])
    assert set(df.columns) == {"k", "ts", "tag", "asof_ts", "payload"}
    assert df.where(F.col("tag") == "x").count() == 1


def test_asof_single_shuffle_plan(spark):
    left = _mk(spark, [(1, 10, "x")], "k int, ts int, tag string")
    right = _mk(spark, [(1, 2, 1.5)], "k int, ts int, payload double")
    plan = (
        asof_join(left, right, ["k"], "ts", ["payload"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one hashpartitioning exchange on the key feeds the window; no
    # range-join blowup, no cartesian
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


def test_asof_null_ts_right_rows_never_match(spark):
    """A NULL-ts right row can never satisfy right.ts <= left.ts (DuckDB
    ASOF agrees). Unfiltered it would sort nulls-first in the window and
    last(payload, ignorenulls=True) could attach its payload with a
    mismatched asof_ts."""
    left = _mk(spark, [(1, 10, "x")], "k int, ts int, tag string")
    right = _mk(
        spark,
        [(1, None, 666.0), (1, 4, 2.0)],
        "k int, ts int, payload double",
    )
    row = asof_join(left, right, ["k"], "ts", ["payload"]).collect()[0]
    assert row["payload"] == 2.0 and row["asof_ts"] == 4
    # and when the NULL-ts row is the ONLY right row: no match at all
    right_only_null = _mk(spark, [(1, None, 666.0)], "k int, ts int, payload double")
    row = asof_join(left, right_only_null, ["k"], "ts", ["payload"]).collect()[0]
    assert row["payload"] is None and row["asof_ts"] is None


def test_asof_null_keys_never_match(spark):
    """SQL join semantics: a NULL key matches nothing — a null-key
    left row gets NULL payload even when null-key right rows exist."""
    left = _mk(spark, [(None, 10, "x"), (1, 10, "y")], "k int, ts int, tag string")
    right = _mk(spark, [(None, 5, 1.0), (1, 5, 2.0)], "k int, ts int, payload double")
    out = {
        r["tag"]: r["payload"]
        for r in asof_join(left, right, ["k"], "ts", ["payload"]).collect()
    }
    assert out == {"x": None, "y": 2.0}
