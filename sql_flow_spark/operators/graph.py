"""Graph analytics over relational facts — iterative PageRank.

Reference scope note: the reference engine (turbolytics/sql-flow —
DuckDB micro-batch plumbing, sqlflow/handlers.py) has no graph
operators; this extends the analytical surface with the third
iterative-algorithm shape (after embedding_top_pc's power iteration
and kmeans_embeddings' Lloyd loop): edge-join message passing, the
PageRank/label-propagation/BP family, expressed in pure DataFrame ops
and still oracle-gated bit-for-bit via an unrolled DuckDB CTE chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_flow_spark.registry import query
from sql_flow_spark.tables import load_tables

_PR_ITERS = 4
_PR_D = 0.85  # damping
_PR_SCALE = 1e12  # fixed-point quantum for inflow sums (values ~1e-7..1)


def _pr_fsum(term):
    return (
        F.sum(
            F.floor(term * F.lit(_PR_SCALE) + F.lit(0.5)).cast("decimal(38,0)")
        ).cast("double")
        / F.lit(_PR_SCALE)
    )


def _o_pr_fsum(expr: str) -> str:
    return (
        f"CAST(SUM(CAST(floor(({expr}) * {_PR_SCALE} + 0.5) "
        f"AS DECIMAL(38,0))) AS DOUBLE) / {_PR_SCALE}"
    )


def _pr_oracle() -> str:
    """The same 4 weighted-PageRank iterations unrolled into
    materialized DuckDB CTEs with identical fixed-point arithmetic —
    both engines walk the identical trajectory."""
    ctes = [
        "pk AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey"
        " FROM lineitem)",
        # symmetric weighted edges: w = number of orders containing both
        "edges AS MATERIALIZED (SELECT a.l_partkey AS src,"
        " b.l_partkey AS dst, CAST(COUNT(*) AS BIGINT) AS w"
        " FROM pk a JOIN pk b ON a.l_orderkey = b.l_orderkey"
        " AND a.l_partkey <> b.l_partkey GROUP BY src, dst)",
        "outw AS MATERIALIZED (SELECT src, CAST(SUM(w) AS BIGINT) AS outw"
        " FROM edges GROUP BY src)",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "p0 AS (SELECT node, 1.0 / n AS pr FROM nodes, nn)",
    ]
    for k in range(1, _PR_ITERS + 1):
        ctes.append(
            f"f{k} AS MATERIALIZED (SELECT e.dst AS node,"
            f" {_o_pr_fsum('p.pr * CAST(e.w AS DOUBLE) / CAST(o.outw AS DOUBLE)')}"
            f" AS inflow"
            f" FROM edges e JOIN outw o ON e.src = o.src"
            f" JOIN p{k - 1} p ON p.node = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"p{k} AS MATERIALIZED (SELECT n.node,"
            f" {1.0 - _PR_D} / nn.n + {_PR_D} * COALESCE(f.inflow, 0.0) AS pr"
            f" FROM nodes n LEFT JOIN f{k} f ON f.node = n.node, nn)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node AS partkey, pr AS pagerank FROM p{_PR_ITERS}"
    )


@query("pagerank_copurchase", oracle=_pr_oracle())
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the part co-purchase graph (edge weight =
    number of orders containing both parts, contributions split
    proportionally to edge weight): 'which parts sit at the center of
    the purchase graph' — the importance ranking behind
    recommendation candidates and catalog curation.

    Oracle-gated on the EXACT trajectory: uniform 1/N start, inflow
    sums fixed-point-exact (order-insensitive under any partitioning),
    per-node update (1-d)/N + d*inflow in IEEE doubles — the DuckDB
    oracle unrolls the same 4 iterations and matches every rank
    bit-for-bit. Parts never co-purchased have no edges and are
    excluded (their rank is the floor (1-d)/N by definition).

    Scale shape: the weighted edge list (bounded by
    Σ basket·(basket−1) — linear in orders for bounded baskets) is
    built once, joined with its out-weight, checkpointed, and
    pre-partitioned on src; every iteration joins the node-sized pr
    table on that same src partitioning (no edge exchange), then
    shuffles only node-sized inflow onto dst. pr is
    localCheckpoint-ed per iteration so the plan stays one iteration
    deep. No collect; driver traffic is zero. Skew = celebrity
    nodes: AQE skew-split handles the inflow groupBy's hot dst keys."""
    from sql_flow_spark.functions.mat import materialize_once

    t = load_tables(spark, sf_dir, ("lineitem",))
    pk = t["lineitem"].select("l_orderkey", "l_partkey").distinct()
    a = pk.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = pk.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("src") != F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("outw"))
    ew = materialize_once(edges.join(outw, "src").repartition("src"))
    nodes = ew.select(F.col("src").alias("node")).distinct()
    nn = nodes.agg(F.count("*").cast("double").alias("n"))
    nodes_n = materialize_once(nodes.join(F.broadcast(nn)))
    pr = nodes_n.select("node", (F.lit(1.0) / F.col("n")).alias("pr"))
    for _ in range(_PR_ITERS):
        inflow = (
            ew.join(pr, ew.src == pr.node)
            .groupBy("dst")
            .agg(
                _pr_fsum(
                    F.col("pr")
                    * F.col("w").cast("double")
                    / F.col("outw").cast("double")
                ).alias("inflow")
            )
        )
        pr = (
            nodes_n.join(inflow, nodes_n.node == inflow.dst, "left")
            .select(
                "node",
                (
                    F.lit(1.0 - _PR_D) / F.col("n")
                    + F.lit(_PR_D) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr.select(F.col("node").alias("partkey"), F.col("pr").alias("pagerank"))
