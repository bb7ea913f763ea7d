"""Lexical + hybrid retrieval over the documents corpus.

Two operators, SURVEY.md §2:

- ``bm25_topk`` — Okapi BM25 scoring of every document against a fixed
  query-term set, top-20. The lexical half of every retrieval stack
  (and of retrieval-based decontamination: "which training docs score
  highest against an eval query" is exactly this shape).
- ``rrf_fusion`` — reciprocal-rank fusion (Cormack et al., the
  industry-standard hybrid merge) of the BM25 ranking with an
  embedding-cosine ranking: score = Σ 1/(60 + rank). No score
  calibration between the two systems is needed — that is the point
  of RRF.

The reference (sql-flow) has no retrieval surface; these extend the
LLM-training-data family (SURVEY.md §2 rows 22+) the brief asks for.

Cross-engine determinism: per-term BM25 contributions are pure IEEE
double expressions on exact-integer inputs, fixed-pointed to 6dp
(``scaled_int``; see _BM_SCALE for the margin-audit rationale) and
summed as DECIMAL — exact and order-insensitive under any
partitioning; ln() ulp drift between engines is absorbed by
the fixed-point rounding. RRF scores are one or two IEEE divisions on
exact integer ranks — bit-identical by construction. One known
tokenizer edge: Java's \\s matches vertical tab (\\x0B), RE2's does
not, so a document containing \\x0B would tokenize differently in the
two engines — absent from this corpus, and fixable by spelling the
class explicitly ([ \\t\\n\\f\\r]) on both sides if real data needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql_flow_spark.functions.dedup import ws_tokens
from sql_flow_spark.functions.mat import materialize_once
from sql_flow_spark.functions.similarity import (
    O_NORMS_CTE,
    dot_dec_fast,
    safe_cos,
    sq_norm_dec,
)
from sql_flow_spark.registry import query, scaled_int
from sql_flow_spark.tables import load_tables

# Fixed query: terms exist at every scale factor (the corpus vocabulary
# is closed), selective enough that tf/dl variation drives the ranking.
QUERY_TERMS = ("hash", "join", "stream")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20
RRF_DEPTH = 50  # fuse the top-50 of each ranking
RRF_K = 60.0  # the canonical RRF constant
RRF_TOP = 10
# 6dp fixed point for per-term scores. Deliberately coarse: the term
# score has a RAW ln() in its dataflow, and the margin audit
# (scripts/margin_audit.py) measured the 9dp mask's tightest boundary
# at ~1.7e3 ulps of the argument across the MRR query set — the same
# order as the observed r8 cross-libm flip (~1.4e3 ulps). At 6dp the
# same data clears 1e6+ ulps. Ranking ties the coarser score could
# introduce are already broken deterministically by doc_id.
_BM_SCALE = 1_000_000.0
_BM_DP = 6  # must match _BM_SCALE for the Spark-side scaled_int calls

_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

# Shared oracle CTE chain producing bm25(doc_id, score). Expression
# structure mirrors the Spark builder token for token so both engines
# evaluate the identical IEEE expression tree before the fixed-point.
O_BM25_CTES = f"""
  toks AS (
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\\s+')) AS dl,
           unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
    FROM documents
  ),
  tf AS (
    SELECT doc_id, term, MAX(dl) AS dl,
           CAST(COUNT(*) AS DOUBLE) AS tf
    FROM toks WHERE term IN ({_TERMS_SQL})
    GROUP BY doc_id, term
  ),
  df AS (
    SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
  ),
  stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
           CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')))
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
    FROM documents
  ),
  term_scores AS (
    SELECT tf.doc_id,
           CAST(floor(
             ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
             * (tf.tf * {BM25_K1 + 1.0}
                / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                   * (CAST(tf.dl AS DOUBLE) / s.avgdl))))
             * {_BM_SCALE} + 0.5) AS DECIMAL(30,0)) AS ts
    FROM tf JOIN df ON tf.term = df.term CROSS JOIN stats s
  ),
  bm25 AS (
    SELECT doc_id, CAST(SUM(ts) AS DOUBLE) / {_BM_SCALE} AS score
    FROM term_scores GROUP BY doc_id
  )
"""


def _bm25_term_score(tf: Column, dl: Column, df: Column) -> Column:
    """The per-(doc, term) Okapi contribution — ONE expression tree
    shared by every consumer so the IEEE evaluation order (and the
    oracle mirror) never forks."""
    return F.log(
        F.lit(1.0)
        + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
    ) * (
        tf
        * F.lit(BM25_K1 + 1.0)
        / (
            tf
            + F.lit(BM25_K1)
            * (
                F.lit(1.0 - BM25_B)
                + F.lit(BM25_B) * (dl.cast("double") / F.col("avgdl"))
            )
        )
    )


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bm25(doc_id, score) for the fixed query over `documents`.

    r14 restructure (guide §2.3/§2.4 — same values, fewer passes): the
    query-term set is FIXED and tiny, so per-term tf can be computed
    with array built-ins inside the one tokenize pass
    (size(filter(tokens, = term))) instead of explode + a (doc, term)
    shuffle; the per-doc (dl, tf_*) panel is checkpointed once, and the
    old second full-corpus tokenize for the stats leg becomes a tiny
    aggregate over the checkpoint. Plan: explode + 2 tokenize scans +
    (doc,term)+term shuffles -> 1 tokenize scan + two broadcast-sized
    aggregates. Values are identical: tf/df/dl/n_docs/avgdl are the
    same exact integers, and the per-term contribution reuses the same
    expression tree fixed-pointed per term before the DECIMAL sum
    (terms absent from a doc contribute exactly the rows the old
    explode never produced). Oracle-verified (bm25 CTE chain
    unchanged)."""
    from sql_flow_spark.functions.mat import materialize_once

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = ws_tokens(F.lower(F.col("text")))

    def _is(term):  # one-arg lambda factory (2-arg form = element, index)
        return lambda x: x == F.lit(term)

    per_doc = materialize_once(
        docs.select(
            "doc_id",
            F.size(ws_tokens("text")).alias("dl"),
            *[
                F.size(F.filter(toks, _is(t))).alias(f"tf_{i}")
                for i, t in enumerate(QUERY_TERMS)
            ],
        )
    )
    stats = per_doc.agg(
        F.count("*").cast("double").alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count("*").cast("double")
        ).alias("avgdl"),
    )
    dfs = per_doc.agg(
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long"))
            .cast("double")
            .alias(f"df_{i}")
            for i in range(len(QUERY_TERMS))
        ]
    )
    ts_cols = [
        F.when(
            F.col(f"tf_{i}") > 0,
            scaled_int(
                _bm25_term_score(
                    F.col(f"tf_{i}").cast("double"),
                    F.col("dl"),
                    F.col(f"df_{i}"),
                ),
                _BM_DP,
            ),
        ).otherwise(F.lit(0).cast("decimal(30,0)"))
        for i in range(len(QUERY_TERMS))
    ]
    hit = None
    for i in range(len(QUERY_TERMS)):
        c = F.col(f"tf_{i}") > 0
        hit = c if hit is None else (hit | c)
    total = ts_cols[0]
    for c in ts_cols[1:]:
        total = total + c
    return (
        per_doc.where(hit)
        .crossJoin(F.broadcast(dfs))
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (total.cast("double") / F.lit(_BM_SCALE)).alias("score"),
        )
    )


def _ranked_head(scored: DataFrame, score_col: str, id_col: str, n: int,
                 rank_name: str) -> DataFrame:
    """Top-n by (score desc, id) with a dense 1..n rank column — sort
    + limit FIRST (distributed take-ordered), then row_number over the
    n surviving rows. Never a global single-partition window over the
    full scored set (that is the gini_revenue lesson: an empty
    partition spec moves every row into one task)."""
    head = scored.orderBy(F.col(score_col).desc(), F.col(id_col)).limit(n)
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    return head.withColumn(rank_name, F.row_number().over(w).cast("int"))


@query(
    "bm25_topk",
    oracle=f"""
    WITH {O_BM25_CTES}
    SELECT doc_id, score, rank
    FROM (
      SELECT doc_id, score, CAST(ROW_NUMBER() OVER (
        ORDER BY score DESC, doc_id) AS INTEGER) AS rank
      FROM bm25
    )
    WHERE rank <= {BM25_TOP}
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for the fixed query ({hash, join, stream}):
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)), tf saturation k1=1.2,
    length normalization b=0.75 against the corpus mean doc length.

    Scale shape: see _bm25_scores (one pruned shuffle + broadcasts);
    the top-20 is a distributed sort-limit, with row_number assigned
    only over the 20 survivors."""
    return _ranked_head(
        _bm25_scores(spark, sf_dir), "score", "doc_id", BM25_TOP, "rank"
    ).select("doc_id", "score", "rank")


@query(
    "rrf_fusion",
    oracle=f"""
    WITH {O_BM25_CTES},
    lex AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (
        ORDER BY score DESC, doc_id) AS INTEGER) AS rank_lex
      FROM bm25 WHERE doc_id <> 0
      QUALIFY rank_lex <= {RRF_DEPTH}
    ),
    norms AS ({O_NORMS_CTE}),
    qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    cos AS (
      SELECT c.vec_id AS doc_id,
             CASE WHEN cn.nrm = 0 OR qn.nrm = 0 THEN 0.0 ELSE
             (CAST(list_sum(list_transform(generate_series(1, len(c.embedding)),
               i -> CAST(floor(CAST(c.embedding[i] AS DOUBLE)
                 * CAST(q.qe[i] AS DOUBLE) * 1000000000000.0 + 0.5)
                 AS DECIMAL(30,0)))) AS DOUBLE) / 1000000000000.0)
             / (cn.nrm * qn.nrm) END AS cosine
      FROM embeddings c CROSS JOIN qv q
      JOIN norms cn ON cn.vec_id = c.vec_id
      JOIN norms qn ON qn.vec_id = 0
      WHERE c.vec_id <> 0
    ),
    vec AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (
        ORDER BY cosine DESC, doc_id) AS INTEGER) AS rank_vec
      FROM cos
      QUALIFY rank_vec <= {RRF_DEPTH}
    ),
    fused AS (
      SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
             lex.rank_lex, vec.rank_vec,
             COALESCE(1.0 / ({RRF_K} + CAST(lex.rank_lex AS DOUBLE)), 0.0)
             + COALESCE(1.0 / ({RRF_K} + CAST(vec.rank_vec AS DOUBLE)), 0.0)
               AS rrf_score
      FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
    )
    SELECT doc_id, rank_lex, rank_vec, rrf_score, rank
    FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        ORDER BY rrf_score DESC, doc_id) AS INTEGER) AS rank
      FROM fused
    )
    WHERE rank <= {RRF_TOP}
    """,
)
def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the BM25 ranking with an embedding-cosine
    ranking (query vector = vec_id 0, the convention ann_cosine_topk
    established for "a query against the corpus") via reciprocal-rank
    fusion, score = Σ 1/(60 + rank) over the rankings that retrieved
    the doc. Documents and embeddings are id-aligned (doc_id = vec_id).

    Scale shape: each ranking is a distributed sort-limit to depth 50
    (row_number only over the survivors — no global window); the fuse
    is a 50x50-row broadcast outer join; cosine reuses the broadcast
    query + exact-decimal dot product from similarity.py."""
    # both rankings must cover the SAME candidate universe (corpus
    # minus the query doc) or the fuse compares incommensurable ranks
    # and the query doc itself can occupy a fused slot
    lex = _ranked_head(
        _bm25_scores(spark, sf_dir).where(F.col("doc_id") != 0),
        "score", "doc_id", RRF_DEPTH, "rank_lex",
    ).select("doc_id", "rank_lex")

    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"].withColumn(
        "nrm", F.sqrt(sq_norm_dec(F.col("embedding")))
    )
    qv = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), F.col("nrm").alias("qnrm")
    )
    cos = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            safe_cos(
                dot_dec_fast("embedding", "qe", "nrm", "qnrm"),
                F.col("nrm"),
                F.col("qnrm"),
            ).alias("cosine"),
        )
    )
    vec = _ranked_head(cos, "cosine", "doc_id", RRF_DEPTH, "rank_vec").select(
        "doc_id", "rank_vec"
    )

    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_lex").cast("double")),
        F.lit(0.0),
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_vec").cast("double")),
        F.lit(0.0),
    )
    fused = (
        lex.join(vec, "doc_id", "full_outer")
        .select("doc_id", "rank_lex", "rank_vec", rrf.alias("rrf_score"))
    )
    return _ranked_head(fused, "rrf_score", "doc_id", RRF_TOP, "rank").select(
        "doc_id", "rank_lex", "rank_vec", "rrf_score", "rank"
    )


N_MRR_QUERIES = 8  # same query-set convention as ann_cosine_topk
MRR_QTERMS = 3


@query(
    "bm25_self_retrieval_mrr",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\\s+')) AS dl,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ),
    qterms AS (
      SELECT doc_id AS qid, term FROM (
        SELECT doc_id, term, ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY COUNT(*) DESC, term) AS rn
        FROM toks WHERE doc_id < {N_MRR_QUERIES}
        GROUP BY doc_id, term
      ) WHERE rn <= {MRR_QTERMS}
    ),
    tf AS (
      SELECT doc_id, term, MAX(dl) AS dl,
             CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks WHERE term IN (SELECT term FROM qterms)
      GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')))
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM documents
    ),
    scores AS (
      SELECT q.qid, tf.doc_id,
             CAST(SUM(CAST(floor(
               ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * {BM25_K1 + 1.0}
                  / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                     * (CAST(tf.dl AS DOUBLE) / s.avgdl))))
               * {_BM_SCALE} + 0.5) AS DECIMAL(30,0))) AS DOUBLE)
               / {_BM_SCALE} AS score
      FROM tf
      JOIN qterms q ON tf.term = q.term
      JOIN df ON tf.term = df.term
      CROSS JOIN stats s
      GROUP BY q.qid, tf.doc_id
    ),
    self AS (
      SELECT qid, score AS s FROM scores WHERE doc_id = qid
    )
    SELECT self.qid,
           CAST(1 + SUM(CASE WHEN sc.doc_id <> self.qid
                              AND (sc.score > self.s
                                   OR (sc.score = self.s
                                       AND sc.doc_id < self.qid))
                        THEN 1 ELSE 0 END) AS BIGINT) AS self_rank,
           1.0 / CAST(1 + SUM(CASE WHEN sc.doc_id <> self.qid
                              AND (sc.score > self.s
                                   OR (sc.score = self.s
                                       AND sc.doc_id < self.qid))
                        THEN 1 ELSE 0 END) AS DOUBLE) AS reciprocal_rank
    FROM self JOIN scores sc ON sc.qid = self.qid
    GROUP BY self.qid, self.s
    """,
)
def bm25_self_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-retrieval evaluation of the BM25 ranker: for each of the 8
    query docs, issue its own top-3 tf terms as the query and report
    the rank of the source document among ALL docs (plus the
    reciprocal rank — averaging the rr column gives MRR). The
    standard retrieval sanity eval: if a doc can't retrieve itself
    from its own salient terms, the ranker or the analyzer is broken.

    The rank is computed WITHOUT any per-query global sort: rank(q) =
    1 + |{{docs scoring strictly better (or tied with a lower id)}}|,
    a count aggregate over the scored set — the scale-correct
    formulation when only a target's rank is needed (a
    Window.partitionBy(qid) would drag the whole corpus into 8
    tasks).

    Exactness: same fixed-point per-term BM25 contributions as
    bm25_topk (DECIMAL-summed, ln ulps absorbed), so the count-better
    comparison is over engine-identical doubles.

    Scale shape: one exploded pass filtered by the ≤24 broadcast
    query terms, score shuffle on (qid, doc), then a qid-sized count
    aggregate against the 8-row broadcast self-score table."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select(
        "doc_id",
        F.size(ws_tokens("text")).alias("dl"),
        F.explode(ws_tokens(F.lower(F.col("text")))).alias("term"),
    )
    wq = Window.partitionBy("qid").orderBy(F.col("tf").desc(), "term")
    qterms = (
        toks.where(F.col("doc_id") < N_MRR_QUERIES)
        .groupBy(F.col("doc_id").alias("qid"), "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= MRR_QTERMS)
        .select("qid", "term")
    )
    tf = (
        toks.join(
            F.broadcast(qterms.select("term").distinct()), "term", "left_semi"
        )
        .groupBy("doc_id", "term")
        .agg(
            F.max("dl").alias("dl"),
            F.count("*").cast("double").alias("tf"),
        )
    )
    df_ = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    stats = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        (
            F.sum(F.size(ws_tokens("text"))).cast("double")
            / F.count("*").cast("double")
        ).alias("avgdl"),
    )
    term_score = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    ) * (
        F.col("tf")
        * F.lit(BM25_K1 + 1.0)
        / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (
                F.lit(1.0 - BM25_B)
                + F.lit(BM25_B) * (F.col("dl").cast("double") / F.col("avgdl"))
            )
        )
    )
    # scores feeds TWO consumers (the self-score lookup and the
    # count-better aggregate); unmaterialized, Catalyst re-expands the
    # whole explode/score subtree per consumer (measured: 24 parquet
    # scans in the duplicated plan) — checkpoint it once
    scores = materialize_once(
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(
            (
                F.sum(scaled_int(term_score, _BM_DP)).cast("double")
                / F.lit(_BM_SCALE)
            ).alias("score")
        )
    )
    self_ = scores.where(F.col("doc_id") == F.col("qid")).select(
        F.col("qid").alias("sqid"), F.col("score").alias("s")
    )
    better = F.when(
        (F.col("doc_id") != F.col("sqid"))
        & (
            (F.col("score") > F.col("s"))
            | ((F.col("score") == F.col("s")) & (F.col("doc_id") < F.col("sqid")))
        ),
        1,
    ).otherwise(0)
    ranked = (
        scores.join(F.broadcast(self_), scores["qid"] == self_["sqid"])
        .groupBy(F.col("qid"))
        .agg((F.lit(1) + F.sum(better)).cast("long").alias("self_rank"))
    )
    return ranked.select(
        "qid",
        "self_rank",
        (F.lit(1.0) / F.col("self_rank").cast("double")).alias(
            "reciprocal_rank"
        ),
    )
