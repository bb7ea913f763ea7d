"""plans/ utilities: salted join correctness, bucketed-join exchange
elimination, audit helpers."""

import pyspark.sql.functions as F

from sql_flow_spark.plans import (
    assert_no_cartesian,
    plan_string,
    salted_join,
    scan_summary,
    top_keys,
    write_bucketed,
)


def test_salted_join_matches_plain_join(spark):
    # skewed big side: one hot key
    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(5)],
        "k int, v int",
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "none")], "k int, name string")
    plain = big.join(small, "k").groupBy("k", "name").count()
    salted = salted_join(big, small, "k", salt=4).groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_join_preserves_unmatched(spark):
    big = spark.createDataFrame([(1, 1), (9, 2)], "k int, v int")
    small = spark.createDataFrame([(1, "a")], "k int, name string")
    out = salted_join(big, small, "k", how="left", salt=3).collect()
    by_k = {r.k: r.name for r in out}
    assert by_k == {1: "a", 9: None}
    assert len(out) == 2  # no duplication from salting


def test_top_keys(spark):
    df = spark.createDataFrame([(1,)] * 10 + [(2,)] * 3, "k int")
    assert top_keys(df, "k", 1) == [(1, 10)]


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse dir is a static conf; tables land in ./spark-warehouse.
    # Clear both catalog entries AND stale locations (a fresh derby
    # metastore doesn't know about leftover dirs from prior sessions).
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = spark.createDataFrame([(i, f"o{i}") for i in range(100)], "okey long, note string")
    items = spark.createDataFrame(
        [(i % 100, i) for i in range(1000)], "okey long, item long"
    )
    write_bucketed(orders, "b_orders", "okey", num_buckets=8, sort_by="okey")
    write_bucketed(items, "b_lineitem", "okey", num_buckets=8, sort_by="okey")
    # tiny tables would be broadcast; force the sort-merge path the
    # bucketing exists for (at scale both sides exceed the threshold)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "okey")
        p = plan_string(joined)
        assert "SortMergeJoin" in p
        assert "ShuffleExchange" not in p and "Exchange hashpartitioning" not in p, (
            f"bucketed join still shuffles:\n{p}"
        )
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_scan_summary_and_no_cartesian(spark, sf_dir):
    from sql_flow_spark.operators import QUERIES

    df = QUERIES["q6_selective_agg"](spark, sf_dir)
    assert_no_cartesian(df)
    scans = scan_summary(df)
    assert len(scans) == 1
    assert "l_shipdate" in scans[0]["pushed_filters"]
    assert "l_comment" not in scans[0]["read_schema"]
