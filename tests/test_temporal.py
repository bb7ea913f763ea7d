"""range_join semantics + plan shape (the registered
range_join_attribution and events_gapfill keys are DuckDB-verified in
test_queries_oracle; these pin the generic operator and the
no-nested-loop guarantee)."""

from pyspark.sql import functions as F

from sql_flow_spark.operators.temporal import range_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_range_join_window_edges(spark):
    left = _mk(spark, [(1, 100, "c")], "k int, lus long, tag string")
    right = _mk(
        spark,
        [(1, 99, "before"), (1, 100, "at"), (1, 150, "in"), (1, 200, "edge"), (1, 201, "after")],
        "k int, rus long, rtag string",
    )
    got = {
        r["rtag"]
        for r in range_join(left, right, ["k"], "lus", "rus", 100).collect()
    }
    assert got == {"at", "in", "edge"}


def test_range_join_no_duplicate_pairs(spark):
    # a right row straddling a bucket boundary is exploded onto two
    # buckets but must match each left row at most once
    left = _mk(spark, [(1, 95, "a"), (1, 100, "b")], "k int, lus long, tag string")
    right = _mk(spark, [(1, 101, "r")], "k int, rus long, rtag string")
    rows = range_join(left, right, ["k"], "lus", "rus", 100).collect()
    assert sorted(r["tag"] for r in rows) == ["a", "b"]


def test_range_join_keys_isolated(spark):
    left = _mk(spark, [(1, 100, "a")], "k int, lus long, tag string")
    right = _mk(spark, [(2, 100, "r")], "k int, rus long, rtag string")
    assert range_join(left, right, ["k"], "lus", "rus", 100).count() == 0


def test_range_join_plan_is_hash_equijoin(spark):
    left = _mk(spark, [(1, 100, "a")], "k int, lus long, tag string")
    right = _mk(spark, [(1, 101, "r")], "k int, rus long, rtag string")
    plan = (
        range_join(left, right, ["k"], "lus", "rus", 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
