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


def test_zorder_key_interleaves_bits(spark):
    from sql_flow_spark.plans import zorder_key

    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "a int, b int")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zorder_key("a", "b").alias("z")).collect()
    }
    # morton(a,b) with a in even bit positions, b in odd
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    # a=3 -> bits 0,1 set -> 0b0101; b=5 -> bits 0,2 -> 0b100010 -> 34; total 0b100111 = 39
    assert got[(3, 5)] == 0b100111


def test_zorder_key_out_of_range_fails_loudly(spark):
    """Out-of-range inputs (negative or >= 2^bits) must raise, not
    silently alias into unrelated Morton cells; NULL passes through as
    a NULL key."""
    import pytest

    from sql_flow_spark.plans import zorder_key

    bad_neg = spark.createDataFrame([(-1, 0)], "a int, b int")
    with pytest.raises(Exception, match="zorder_key input out of range"):
        bad_neg.select(zorder_key("a", "b", bits=4).alias("z")).collect()
    bad_big = spark.createDataFrame([(0, 16)], "a int, b int")
    with pytest.raises(Exception, match="zorder_key input out of range"):
        bad_big.select(zorder_key("a", "b", bits=4).alias("z")).collect()
    nulls = spark.createDataFrame([(None, 3)], "a int, b int")
    assert nulls.select(zorder_key("a", "b", bits=4).alias("z")).collect()[0].z is None


def test_zorder_layout_prunes_both_columns(spark, tmp_path):
    """The point of Z-order: after write_zordered, per-file min/max
    spans are narrow on BOTH columns, while a plain sort on column a
    leaves column b's span at full range in every file (no pruning
    possible on b). Measured from real parquet footer stats."""
    import glob

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from sql_flow_spark.plans import write_zordered

    n = 1 << 14
    side = 1 << 7  # a, b uniform in [0, 128): a = i % 128, b = byte-mix
    df = (
        spark.range(n)
        .select(
            (F.col("id") % side).cast("int").alias("a"),
            # the full (a, b) grid: b walks [0, side) independently
            # of a, so single-column clustering cannot help b
            ((F.col("id") / side).cast("long") % side).cast("int").alias("b"),
        )
    )
    z_dir, s_dir = str(tmp_path / "zord"), str(tmp_path / "plain")
    write_zordered(df, z_dir, "a", "b", n_files=16, bits=7)
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.parquet(s_dir)
    )

    def mean_span(d, col):
        spans = []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.read_metadata(f)
            idx = {c: i for i, c in enumerate(md.schema.names)}[col]
            stats = [
                md.row_group(i).column(idx).statistics
                for i in range(md.num_row_groups)
            ]
            spans.append(max(s.max for s in stats) - min(s.min for s in stats))
        return sum(spans) / len(spans)

    # plain sort: perfect on a, useless on b (span ~ full range)
    assert mean_span(s_dir, "b") > side * 0.9
    # z-order: BOTH columns' spans well under the full range
    assert mean_span(z_dir, "a") < side * 0.6
    assert mean_span(z_dir, "b") < side * 0.6
