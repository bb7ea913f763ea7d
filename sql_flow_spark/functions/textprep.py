"""Training-data preparation operators: chunking, vocabulary stats,
split assignment, per-group selection — the steps between raw documents
and a training corpus.

All expression-only (codegen); chunking materializes the token array
once (see dedup.token_ngrams note on the lambda-CSE trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_flow_spark.functions.dedup import ws_tokens
from sql_flow_spark.registry import query
from sql_flow_spark.tables import load_tables

CHUNK_TOKENS = 20
CHUNK_STRIDE = 15  # 5-token overlap


@query(
    "doc_chunking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    )
    SELECT
      doc_id,
      CAST(s / {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
      array_to_string(t[s + 1 : s + {CHUNK_TOKENS}], ' ') AS chunk_text,
      CAST(least({CHUNK_TOKENS}, len(t) - s) AS INTEGER) AS chunk_tokens
    FROM toks, unnest(generate_series(0, len(t) - 1, {CHUNK_STRIDE})) AS u(s)
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size token chunks (20 tokens, stride 15) —
    the context-window packing step of a training pipeline. Narrow
    map + explode; chunk count scales with corpus size, not doc
    count, and no shuffle is involved."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].withColumn("t", ws_tokens("text"))
    starts = F.sequence(F.lit(0), F.size("t") - 1, F.lit(CHUNK_STRIDE))
    exploded = docs.select("doc_id", "t", F.explode(starts).alias("s"))
    return exploded.select(
        "doc_id",
        (F.col("s") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.array_join(F.expr(f"slice(t, s + 1, {CHUNK_TOKENS})"), " ").alias("chunk_text"),
        F.least(F.lit(CHUNK_TOKENS), F.size("t") - F.col("s")).cast("int").alias("chunk_tokens"),
    )


@query(
    "top_terms",
    oracle="""
    SELECT term, COUNT(*) AS occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
      FROM documents
    )
    GROUP BY term
    ORDER BY occurrences DESC, term
    LIMIT 20
    """,
)
def top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: global term counts + document
    frequency, top-20. Explode -> single shuffle on term with map-side
    combine (the word-count plan, but with distinct-doc counting)."""
    t = load_tables(spark, sf_dir, ("documents",))
    terms = t["documents"].select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("term")
    )
    return (
        terms.groupBy("term")
        .agg(
            F.count("*").alias("occurrences"),
            F.count_distinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("occurrences").desc(), "term")
        .limit(20)
    )


@query(
    "train_val_split",
    oracle="""
    SELECT
      CASE WHEN doc_id % 100 < 90 THEN 'train'
           WHEN doc_id % 100 < 95 THEN 'val'
           ELSE 'test' END AS split,
      lang,
      COUNT(*) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 split assignment by key modulo — stable
    across runs and engines (at scale: hash the key first so ids with
    structure don't bias a split; modulo on doc_id keeps the oracle
    trivial here)."""
    t = load_tables(spark, sf_dir, ("documents",))
    split = (
        F.when(F.col("doc_id") % 100 < 90, "train")
        .when(F.col("doc_id") % 100 < 95, "val")
        .otherwise("test")
    )
    return (
        t["documents"]
        .groupBy(split.alias("split"), "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@query(
    "tfidf_top_term",
    oracle="""
    WITH terms AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM terms GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      -- fixed-point to 6dp: ln() is not correctly-rounded and differs
      -- by ulps between engines; rounding makes scores and the argmax
      -- ordering engine-identical
      SELECT tf.doc_id, tf.term,
             floor(CAST(tf.tf AS DOUBLE)
               * ln((CAST(n.n_docs AS DOUBLE) + 1.0) / (CAST(df.df AS DOUBLE) + 1.0))
               * 1000000.0 + 0.5) / 1000000.0
               AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT doc_id, term AS top_term, tfidf
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      FROM scored
    )
    WHERE rn = 1
    """,
)
def tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: most characteristic term per document. Term frequency
    and document frequency are two aggregations over one exploded
    pass; idf joins back on term (broadcastable — vocabulary ≪
    corpus); ln() is IEEE-identical across engines so scores and the
    per-doc argmax agree exactly."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    # corpus size as a broadcast 1-row aggregate, not a driver-side
    # .count(): the builder stays lazy (no job per invocation) and the
    # plan carries the dependency explicitly
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    terms = docs.select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = terms.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    # fixed-point to 6dp: ln() differs by ulps between engines (not
    # correctly rounded); see the oracle's matching floor expression
    raw = (
        F.col("tf").cast("double")
        * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df").cast("double") + F.lit(1.0)))
    )
    tfidf = F.floor(raw * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", tfidf.alias("tfidf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"), "tfidf")
    )


@query(
    "best_docs_per_lang",
    oracle="""
    SELECT lang, doc_id, n_chars, rnk
    FROM (
      SELECT lang, doc_id, n_chars,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS INTEGER) AS rnk
      FROM documents
    )
    WHERE rnk <= 5
    """,
)
def best_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N selection per language (quality-gated corpus curation
    pattern; here ranked by length as the proxy score)."""
    t = load_tables(spark, sf_dir, ("documents",))
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        t["documents"]
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 5)
        .select("lang", "doc_id", "n_chars", "rnk")
    )
