"""scd2_apply_changes scenarios: open-version closure, multi-change
chaining, untouched closed history, interval invariants. The
registered scd2_user_status key is DuckDB-verified in
test_queries_oracle."""

from pyspark.sql import functions as F

from sql_flow_spark.operators.scd import scd2_apply_changes


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k int, attr string, valid_from long, valid_to long"
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k int, attr string, cts long")


def _apply(dim, changes):
    return scd2_apply_changes(
        dim, changes, key_cols=["k"], ts_col="cts", attr_cols=["attr"]
    )


def test_change_closes_open_version(spark):
    dim = _dim(spark, [(1, "bronze", 100, None)])
    out = _apply(dim, _changes(spark, [(1, "gold", 200)])).collect()
    rows = {(r["attr"]): (r["valid_from"], r["valid_to"]) for r in out}
    assert rows == {"bronze": (100, 200), "gold": (200, None)}


def test_multiple_changes_chain(spark):
    dim = _dim(spark, [(1, "a", 100, None)])
    out = _apply(
        dim, _changes(spark, [(1, "b", 200), (1, "c", 300)])
    ).collect()
    rows = {r["attr"]: (r["valid_from"], r["valid_to"]) for r in out}
    assert rows == {"a": (100, 200), "b": (200, 300), "c": (300, None)}


def test_closed_history_untouched_and_other_keys_stable(spark):
    dim = _dim(
        spark,
        [
            (1, "old", 50, 100),  # closed history
            (1, "cur", 100, None),
            (2, "other", 10, None),  # untouched key
        ],
    )
    out = _apply(dim, _changes(spark, [(1, "new", 150)])).collect()
    rows = {(r["k"], r["attr"]): (r["valid_from"], r["valid_to"]) for r in out}
    assert rows[(1, "old")] == (50, 100)
    assert rows[(1, "cur")] == (100, 150)
    assert rows[(1, "new")] == (150, None)
    assert rows[(2, "other")] == (10, None)


def test_interval_invariants(spark):
    """No overlaps, exactly one open version per key, intervals abut."""
    dim = _dim(spark, [(1, "a", 100, None), (2, "x", 5, None)])
    changes = _changes(
        spark, [(1, "b", 200), (1, "c", 250), (2, "y", 7), (3, "z", 1)]
    )
    out = _apply(dim, changes)
    per_key = {}
    for r in out.collect():
        per_key.setdefault(r["k"], []).append(
            (r["valid_from"], r["valid_to"])
        )
    for k, ivs in per_key.items():
        ivs.sort()
        opens = [iv for iv in ivs if iv[1] is None]
        assert len(opens) == 1, (k, ivs)
        for (f1, t1), (f2, _t2) in zip(ivs, ivs[1:]):
            assert t1 == f2, (k, ivs)  # abutting, no gap/overlap


def test_new_key_insert(spark):
    dim = _dim(spark, [(1, "a", 100, None)])
    out = _apply(dim, _changes(spark, [(9, "fresh", 42)])).collect()
    rows = {(r["k"], r["attr"]): (r["valid_from"], r["valid_to"]) for r in out}
    assert rows[(9, "fresh")] == (42, None)
    assert rows[(1, "a")] == (100, None)


def test_single_shuffle_plan(spark):
    dim = _dim(spark, [(1, "a", 100, None)])
    changes = _changes(spark, [(1, "b", 200)])
    plan = (
        _apply(dim, changes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
