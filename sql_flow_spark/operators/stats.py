"""Statistical monitoring operators: parametric drift tests, corpus
divergence, and sequential change detection.

Completes the drift family (operators/drift.py gives KS / PSI /
robust-z): Welch's t for mean shift, chi-square for categorical
(time-of-day) mix shift, Jensen-Shannon for corpus-source divergence,
EWMA for smoothed trending, and CUSUM for sequential changepoint
location. Reference scope note: the reference engine
(sqlflow/handlers.py) ships no statistics operators — this family
extends the brief's quality-signal toolkit to the monitoring layer a
production ingest pipeline alerts from.

Cross-engine exactness follows the house rules (registry.py): counts
are exact integers; every sum of doubles is fixed-point-scaled so
partitioning cannot reorder it; ln/pow are 6-9dp floor-masked because
they are not correctly rounded and differ by ulps between engines;
sqrt and arithmetic on identical doubles are IEEE-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_flow_spark.functions.dedup import ws_tokens
from sql_flow_spark.functions.mat import materialize_once
from sql_flow_spark.registry import o_dsum, query
from sql_flow_spark.tables import load_tables

# Shared first-half/second-half split for the two-sample tests
# (2024-01-16 00:00:00 UTC, same boundary as operators/drift.py).
_SPLIT_US = 1705363200000000

_US_PER_DAY = 86_400_000_000


@query(
    "welch_t_drift",
    oracle=f"""
    WITH lab AS (
      SELECT event_type, value,
             CASE WHEN epoch_us(ts) < {_SPLIT_US} THEN 1 ELSE 2 END AS g
      FROM events
    ),
    s AS (
      SELECT event_type, g,
             CAST(COUNT(*) AS BIGINT) AS n,
             {o_dsum('value')} AS sx,
             {o_dsum('value * value')} AS sxx
      FROM lab GROUP BY event_type, g
    ),
    m AS (
      SELECT event_type, g, n, sx / CAST(n AS DOUBLE) AS mean,
             (sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var
      FROM s
    )
    SELECT a.event_type, a.n AS n1, b.n AS n2,
           a.mean AS mean1, b.mean AS mean2,
           (a.mean - b.mean)
             / sqrt(a.var / CAST(a.n AS DOUBLE) + b.var / CAST(b.n AS DOUBLE))
             AS t_stat,
           pow(a.var / CAST(a.n AS DOUBLE) + b.var / CAST(b.n AS DOUBLE), 2)
             / (pow(a.var / CAST(a.n AS DOUBLE), 2) / CAST(a.n - 1 AS DOUBLE)
                + pow(b.var / CAST(b.n AS DOUBLE), 2) / CAST(b.n - 1 AS DOUBLE))
             AS dof
    FROM m a JOIN m b ON a.event_type = b.event_type AND a.g = 1 AND b.g = 2
    """,
)
def welch_t_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-statistic per event type, first vs
    second half of the period — the parametric mean-shift test that
    complements ks_drift (any-distribution-shape) and psi_drift
    (where-the-mass-moved): t answers "did the MEAN move, given the
    noise", with Welch-Satterthwaite dof so unequal group variances
    don't inflate the test.

    Exactness: n / Σx / Σx² come from exact integer counts and
    fixed-point sums (x·x is computed identically in both engines
    before scaling); mean, variance, t and dof are then pure IEEE
    arithmetic + sqrt/pow(·,2) on identical doubles.

    Scale shape: ONE scan, one shuffle onto the bounded
    (event_type, half) key space with map-side partials, then a
    5-row self-join. The 100 TB cost is the scan."""
    t = load_tables(spark, sf_dir, ("events",))
    from sql_flow_spark.registry import dsum

    lab = t["events"].select(
        "event_type",
        "value",
        F.when(F.unix_micros("ts") < _SPLIT_US, 1).otherwise(2).alias("g"),
    )
    s = lab.groupBy("event_type", "g").agg(
        F.count("*").cast("long").alias("n"),
        dsum("value").alias("sx"),
        dsum(F.col("value") * F.col("value")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    m = s.select(
        "event_type",
        "g",
        "n",
        (F.col("sx") / nd).alias("mean"),
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / nd)
            / (F.col("n") - 1).cast("double")
        ).alias("var"),
    )
    a = m.where(F.col("g") == 1).select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("mean").alias("mean1"),
        F.col("var").alias("var1"),
    )
    b = m.where(F.col("g") == 2).select(
        "event_type",
        F.col("n").alias("n2"),
        F.col("mean").alias("mean2"),
        F.col("var").alias("var2"),
    )
    se1 = F.col("var1") / F.col("n1").cast("double")
    se2 = F.col("var2") / F.col("n2").cast("double")
    return a.join(b, "event_type").select(
        "event_type",
        "n1",
        "n2",
        "mean1",
        "mean2",
        ((F.col("mean1") - F.col("mean2")) / F.sqrt(se1 + se2)).alias("t_stat"),
        (
            F.pow(se1 + se2, F.lit(2))
            / (
                F.pow(se1, F.lit(2)) / (F.col("n1") - 1).cast("double")
                + F.pow(se2, F.lit(2)) / (F.col("n2") - 1).cast("double")
            )
        ).alias("dof"),
    )


@query(
    "chi2_hour_drift",
    oracle=f"""
    WITH o AS (
      SELECT event_type,
             CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
             CAST(SUM(CASE WHEN epoch_us(ts) < {_SPLIT_US}
                      THEN 1 ELSE 0 END) AS BIGINT) AS o1,
             CAST(SUM(CASE WHEN epoch_us(ts) < {_SPLIT_US}
                      THEN 0 ELSE 1 END) AS BIGINT) AS o2
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(SUM(o1) AS BIGINT) AS c1,
             CAST(SUM(o2) AS BIGINT) AS c2,
             CAST(COUNT(*) AS BIGINT) AS n_hours
      FROM o GROUP BY event_type
    ),
    terms AS (
      SELECT o.event_type, tot.c1, tot.c2, tot.n_hours,
             pow(CAST(o1 AS DOUBLE) - CAST((o1 + o2) AS DOUBLE)
                   * CAST(c1 AS DOUBLE) / CAST(c1 + c2 AS DOUBLE), 2)
               / (CAST((o1 + o2) AS DOUBLE)
                   * CAST(c1 AS DOUBLE) / CAST(c1 + c2 AS DOUBLE))
             + pow(CAST(o2 AS DOUBLE) - CAST((o1 + o2) AS DOUBLE)
                   * CAST(c2 AS DOUBLE) / CAST(c1 + c2 AS DOUBLE), 2)
               / (CAST((o1 + o2) AS DOUBLE)
                   * CAST(c2 AS DOUBLE) / CAST(c1 + c2 AS DOUBLE))
             AS term
      FROM o JOIN tot ON tot.event_type = o.event_type
    )
    SELECT event_type,
           {o_dsum('term', 6)} AS chi2,
           MIN(n_hours) - 1 AS dof,
           MIN(c1) AS n1, MIN(c2) AS n2
    FROM terms GROUP BY event_type
    """,
)
def chi2_hour_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of hour-of-day mix drift per event
    type: does the TIME-OF-DAY profile of the second half differ from
    the first half's — the categorical drift check (bot traffic,
    timezone mix changes, scheduler bugs) that value-based KS/PSI
    cannot see. Expected counts are the classic row-total x
    col-total / grand-total; dof = (hours present - 1) x (2 - 1).

    Exactness: all observed/marginal counts are exact integers (hour
    from pure epoch integer arithmetic, no calendar functions);
    per-cell terms are identical IEEE arithmetic; the term sum is
    fixed-point at 6dp so hour arrival order cannot change it.

    Scale shape: one shuffle onto the bounded (type, hour) key space
    with map-side partials; everything after is type x 24 rows."""
    t = load_tables(spark, sf_dir, ("events",))
    from sql_flow_spark.registry import dsum

    first = F.unix_micros("ts") < _SPLIT_US
    o = (
        t["events"]
        .select(
            "event_type",
            ((F.unix_micros("ts") / F.lit(3_600_000_000)).cast("long") % 24)
            .cast("long")
            .alias("hour"),
            F.when(first, 1).otherwise(0).alias("is1"),
        )
        .groupBy("event_type", "hour")
        .agg(
            F.sum("is1").cast("long").alias("o1"),
            F.sum(1 - F.col("is1")).cast("long").alias("o2"),
        )
    )
    tot = o.groupBy("event_type").agg(
        F.sum("o1").cast("long").alias("c1"),
        F.sum("o2").cast("long").alias("c2"),
        F.count("*").cast("long").alias("n_hours"),
    )
    rowtot = (F.col("o1") + F.col("o2")).cast("double")
    grand = (F.col("c1") + F.col("c2")).cast("double")
    e1 = rowtot * F.col("c1").cast("double") / grand
    e2 = rowtot * F.col("c2").cast("double") / grand
    term = (
        F.pow(F.col("o1").cast("double") - e1, F.lit(2)) / e1
        + F.pow(F.col("o2").cast("double") - e2, F.lit(2)) / e2
    )
    return (
        o.join(F.broadcast(tot), "event_type")
        .select("event_type", "c1", "c2", "n_hours", term.alias("term"))
        .groupBy("event_type")
        .agg(
            dsum("term", 6).alias("chi2"),
            (F.min("n_hours") - 1).alias("dof"),
            F.min("c1").alias("n1"),
            F.min("c2").alias("n2"),
        )
    )


@query(
    "js_divergence_sources",
    oracle="""
    WITH terms AS (
      SELECT source,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ),
    c AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM terms GROUP BY source, term
    ),
    vocab AS (
      SELECT term, CAST(SUM(cnt) AS BIGINT) AS ct FROM c GROUP BY term
    ),
    st AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS ts FROM c GROUP BY source),
    g AS (SELECT CAST(SUM(ct) AS BIGINT) AS tg FROM vocab),
    grid AS (
      SELECT st.source, v.term, v.ct, st.ts, g.tg,
             COALESCE(c.cnt, 0) AS cnt
      FROM st CROSS JOIN vocab v CROSS JOIN g
      LEFT JOIN c ON c.source = st.source AND c.term = v.term
    ),
    pq AS (
      SELECT source, ts, tg - ts AS tr,
             CAST(cnt AS DOUBLE) / CAST(ts AS DOUBLE) AS p,
             CAST(ct - cnt AS DOUBLE) / CAST(tg - ts AS DOUBLE) AS q
      FROM grid
    ),
    t AS (
      SELECT source, ts, tr,
             CASE WHEN p > 0 THEN
               p * (floor(ln(2.0 * p / (p + q)) * 1000000.0 + 0.5)
                    / 1000000.0) ELSE 0.0 END
             + CASE WHEN q > 0 THEN
               q * (floor(ln(2.0 * q / (p + q)) * 1000000.0 + 0.5)
                    / 1000000.0) ELSE 0.0 END
             AS term_jsd
      FROM pq
    )
    SELECT source, MIN(ts) AS source_tokens,
           CAST(SUM(CAST(floor(term_jsd * 1000000000000.0 + 0.5)
                         AS DECIMAL(30,0))) AS DOUBLE)
             / 1000000000000.0 / 2.0 AS jsd
    FROM t GROUP BY source
    """,
)
def js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's unigram
    distribution vs the REST of the corpus — "which ingest source is
    lexically unlike the mix". The bounded, symmetric alternative to
    KL (finite even on disjoint support), and the standard corpus-mix
    diagnostic when weighting pretraining sources.

    Exactness: word counts are exact integers over the shared
    whitespace tokenization (top_terms/tfidf precedent); p, q are
    count ratios; each ln is 6dp floor-masked; the per-term sum is
    fixed-point at 12dp (terms are O(p)-small) so term order cannot
    change it; zero-count sides contribute exactly 0 by mask.

    Scale shape: one exploded token pass -> (source, term) counts;
    the vocab + per-source grid is vocab x sources rows with the
    tiny source-totals broadcast; the JSD reduce lands on the
    source key space with map-side partials. Never pairwise over
    documents, never a driver collect."""
    t = load_tables(spark, sf_dir, ("documents",))
    from sql_flow_spark.registry import dsum

    c = (
        t["documents"]
        .select(
            "source",
            F.explode(ws_tokens(F.lower(F.col("text")))).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    c = materialize_once(c)
    vocab = c.groupBy("term").agg(F.sum("cnt").cast("long").alias("ct"))
    st = c.groupBy("source").agg(F.sum("cnt").cast("long").alias("ts"))
    grand = vocab.agg(F.sum("ct").cast("long").alias("tg"))
    grid = (
        vocab.crossJoin(F.broadcast(st))
        .crossJoin(F.broadcast(grand))
        .join(c, ["source", "term"], "left")
        .select(
            "source",
            "ts",
            "tg",
            "ct",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )
    p = F.col("cnt").cast("double") / F.col("ts").cast("double")
    q = (F.col("ct") - F.col("cnt")).cast("double") / (
        F.col("tg") - F.col("ts")
    ).cast("double")

    def masked_ln(x):
        return (
            F.floor(F.log(x) * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
        )

    term_jsd = F.when(p > 0, p * masked_ln(F.lit(2.0) * p / (p + q))).otherwise(
        0.0
    ) + F.when(q > 0, q * masked_ln(F.lit(2.0) * q / (p + q))).otherwise(0.0)
    return (
        grid.select("source", "ts", term_jsd.alias("term_jsd"))
        .groupBy("source")
        .agg(
            F.min("ts").alias("source_tokens"),
            (dsum("term_jsd", 12) / F.lit(2.0)).alias("jsd"),
        )
    )


# EWMA smoothing factor; weights use (1-alpha)^gap over calendar-day
# gaps so missing days decay correctly.
_EWMA_ALPHA = 0.3


@query(
    "ewma_daily",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day_idx,
             {o_dsum('value')} / CAST(COUNT(*) AS DOUBLE) AS daily_avg
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT t.event_type, t.day_idx, t.daily_avg,
             floor(pow({1.0 - _EWMA_ALPHA}, t.day_idx - i.day_idx)
                   * 1000000000.0 + 0.5) / 1000000000.0 AS w,
             i.daily_avg AS x
      FROM daily t JOIN daily i
        ON i.event_type = t.event_type AND i.day_idx <= t.day_idx
    )
    SELECT event_type, day_idx, MIN(daily_avg) AS daily_avg,
           (CAST(SUM(CAST(floor(w * x * 1000000.0 + 0.5)
                          AS DECIMAL(30,0))) AS DOUBLE) / 1000000.0)
           / (CAST(SUM(CAST(floor(w * 1000000000.0 + 0.5)
                            AS DECIMAL(30,0))) AS DOUBLE) / 1000000000.0)
           AS ewma
    FROM pairs GROUP BY event_type, day_idx
    """,
)
def ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of the daily mean value
    per event type (alpha = 0.3, pandas ewm adjust=True semantics:
    ewma_t = sum w_i x_i / sum w_i with w_i = (1-a)^(t-i) over
    calendar-day gaps) — the smoothed trend line a monitoring
    dashboard draws, robust to single-day spikes, correctly decaying
    across missing days.

    Exactness: daily means are fixed-point sums / exact counts; the
    decay weight pow(0.7, gap) is 9dp floor-masked (pow is not
    correctly rounded across engines; mask spacing 1e-9 vs pow error
    ~1e-16 makes boundary flips impossible in practice); numerator
    and denominator are fixed-point sums so join order cannot change
    them.

    Scale shape: the raw scan collapses to types x days rows FIRST
    (one bounded-key shuffle with map-side partials); the triangular
    self-join runs on that tiny aggregate, never on raw events. At
    unbounded history, bound the window (w < 1e-9 after ~64 days) —
    the same prefilter keeps the join linear."""
    t = load_tables(spark, sf_dir, ("events",))
    from sql_flow_spark.registry import davg

    daily = (
        t["events"]
        .select(
            "event_type",
            (F.unix_micros("ts") / F.lit(_US_PER_DAY)).cast("long").alias(
                "day_idx"
            ),
            "value",
        )
        .groupBy("event_type", "day_idx")
        .agg(davg("value").alias("daily_avg"))
    )
    daily = materialize_once(daily)
    i = daily.select(
        F.col("event_type").alias("e2"),
        F.col("day_idx").alias("d2"),
        F.col("daily_avg").alias("x"),
    )
    w = (
        F.floor(
            F.pow(F.lit(1.0 - _EWMA_ALPHA), F.col("day_idx") - F.col("d2"))
            * F.lit(1e9)
            + F.lit(0.5)
        )
        / F.lit(1e9)
    )
    pairs = daily.join(
        i,
        (F.col("e2") == F.col("event_type")) & (F.col("d2") <= F.col("day_idx")),
    ).select(
        "event_type",
        "day_idx",
        "daily_avg",
        w.alias("w"),
        "x",
    )
    num = (
        F.sum(
            F.floor(F.col("w") * F.col("x") * F.lit(1e6) + F.lit(0.5)).cast(
                "decimal(30,0)"
            )
        ).cast("double")
        / F.lit(1e6)
    )
    den = (
        F.sum(F.floor(F.col("w") * F.lit(1e9) + F.lit(0.5)).cast("decimal(30,0)"))
        .cast("double")
        / F.lit(1e9)
    )
    return pairs.groupBy("event_type", "day_idx").agg(
        F.min("daily_avg").alias("daily_avg"),
        (num / den).alias("ewma"),
    )


# CUSUM tuning: k = drift allowance (in sigma units), h = alert
# threshold. Standard SPC defaults.
_CUSUM_K = 0.5
_CUSUM_H = 4.0


@query(
    "cusum_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day_idx,
             {o_dsum('value')} / CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             {o_dsum('x', 6)} / CAST(COUNT(*) AS DOUBLE) AS mu,
             sqrt(({o_dsum('x * x', 6)}
                   - {o_dsum('x', 6)} * {o_dsum('x', 6)}
                     / CAST(COUNT(*) AS DOUBLE))
                  / CAST(COUNT(*) - 1 AS DOUBLE)) AS sd
      FROM daily GROUP BY event_type
    ),
    z AS (
      SELECT d.event_type, d.day_idx,
             floor((d.x - s.mu) / s.sd * 1000000.0 + 0.5) / 1000000.0 AS z
      FROM daily d JOIN stats s ON s.event_type = d.event_type
    ),
    r AS (
      SELECT event_type, day_idx, z,
             SUM(z - {_CUSUM_K}) OVER w AS rp,
             SUM(-z - {_CUSUM_K}) OVER w AS rn
      FROM z
      WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
                   ROWS UNBOUNDED PRECEDING)
    ),
    s2 AS (
      SELECT event_type, day_idx,
             rp - LEAST(0.0, MIN(rp) OVER w) AS sp,
             rn - LEAST(0.0, MIN(rn) OVER w) AS sn
      FROM r
      WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
                   ROWS UNBOUNDED PRECEDING)
    ),
    ranked AS (
      SELECT event_type, day_idx, sp, sn,
             GREATEST(sp, sn) AS s_max,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY GREATEST(sp, sn) DESC, day_idx) AS rk
      FROM s2
    )
    SELECT event_type,
           floor(s_max * 1000000.0 + 0.5) / 1000000.0 AS cusum_max,
           day_idx AS peak_day,
           CASE WHEN s_max > {_CUSUM_H} THEN 1 ELSE 0 END AS drifted
    FROM ranked WHERE rk = 1
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM changepoint detector on the daily mean value
    per event type (Page 1954): standardized deviations accumulate in
    S+ / S- with drift allowance k = 0.5 sigma; the peak locates the
    most likely change day and peak > h = 4 flags a sustained shift —
    the sequential test that catches SLOW drifts a two-sample test
    diluted over the whole period misses.

    The recursion S_t = max(0, S_{{t-1}} + z_t - k) is rewritten
    closed-form as S_t = R_t - min(0, min_{{j<=t}} R_j) with
    R_t = sum(z - k) — two stock window functions, no recursion, no
    UDF, identical in both engines.

    Exactness: daily means via fixed-point sums; mu/sd per type from
    6dp-masked sums over the tiny daily aggregate; z is 6dp-masked so
    both engines accumulate identical doubles; ROWS frames over the
    unique (type, day) ordering have no tie ambiguity; the output
    statistic is 6dp-masked.

    Scale shape: raw scan -> types x days aggregate (one bounded-key
    shuffle); windows and argmax run on that tiny frame."""
    t = load_tables(spark, sf_dir, ("events",))
    from sql_flow_spark.registry import davg, dsum

    daily = (
        t["events"]
        .select(
            "event_type",
            (F.unix_micros("ts") / F.lit(_US_PER_DAY)).cast("long").alias(
                "day_idx"
            ),
            "value",
        )
        .groupBy("event_type", "day_idx")
        .agg(davg("value").alias("x"))
    )
    nd = F.count("*").cast("double")
    stats = daily.groupBy("event_type").agg(
        (dsum("x", 6) / nd).alias("mu"),
        F.sqrt(
            (dsum(F.col("x") * F.col("x"), 6) - dsum("x", 6) * dsum("x", 6) / nd)
            / (F.count("*") - 1).cast("double")
        ).alias("sd"),
    )
    z = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day_idx",
        (
            F.floor(
                (F.col("x") - F.col("mu")) / F.col("sd") * F.lit(1e6) + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("z"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = z.select(
        "event_type",
        "day_idx",
        F.sum(F.col("z") - F.lit(_CUSUM_K)).over(w).alias("rp"),
        F.sum(-F.col("z") - F.lit(_CUSUM_K)).over(w).alias("rn"),
    )
    s2 = r.select(
        "event_type",
        "day_idx",
        (F.col("rp") - F.least(F.lit(0.0), F.min("rp").over(w))).alias("sp"),
        (F.col("rn") - F.least(F.lit(0.0), F.min("rn").over(w))).alias("sn"),
    )
    s_max = F.greatest("sp", "sn")
    ranked = s2.select(
        "event_type",
        "day_idx",
        s_max.alias("s_max"),
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(
                s_max.desc(), F.col("day_idx")
            )
        )
        .alias("rk"),
    )
    return ranked.where(F.col("rk") == 1).select(
        "event_type",
        (F.floor(F.col("s_max") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "cusum_max"
        ),
        F.col("day_idx").alias("peak_day"),
        F.when(F.col("s_max") > _CUSUM_H, 1).otherwise(0).alias("drifted"),
    )


_US_PER_HOUR = 3_600_000_000
_ACF_MAX_LAG = 6


@query(
    "events_autocorr",
    oracle=f"""
    WITH hourly AS MATERIALIZED (
      SELECT epoch_us(ts) // {_US_PER_HOUR} AS h,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cnt) AS BIGINT) AS s,
             CAST(SUM(cnt * cnt) AS BIGINT) AS ss
      FROM hourly
    ),
    lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag),
    pairs AS (
      SELECT l.lag,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(x.cnt * y.cnt) AS BIGINT) AS sxy,
             CAST(SUM(x.cnt) AS BIGINT) AS sx,
             CAST(SUM(y.cnt) AS BIGINT) AS sy
      FROM lags l
      JOIN hourly x ON TRUE
      JOIN hourly y ON y.h = x.h + l.lag
      GROUP BY l.lag
    )
    SELECT p.lag AS lag, t.n AS n_hours, p.n_pairs AS n_pairs,
           (CAST(p.sxy AS DOUBLE)
              - (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
                * CAST(p.sx + p.sy AS DOUBLE)
              + CAST(p.n_pairs AS DOUBLE)
                * (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
                * (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)))
           / (CAST(t.ss AS DOUBLE)
              - CAST(t.n AS DOUBLE)
                * (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
                * (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)))
           AS acf
    FROM pairs p CROSS JOIN tot t
    """,
)
def events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..6 autocorrelation of the hourly event-arrival series —
    the seasonality/burstiness probe that tells a monitoring layer
    whether a traffic series is hour-over-hour sticky (high r1),
    periodic (peaks at the cycle length), or white (all ~0). Pairs are
    (hour h, hour h+k) where BOTH buckets exist; mean and the
    denominator come from the full series (Box-Jenkins convention).

    Exactness: counts are integers, so Σx, Σx², Σxy, Σ over pairs are
    all exact BIGINT sums — no fixed-point masking needed anywhere; the
    ACF itself is then a handful of IEEE ops on identical scalars.

    Scale shape: one shuffle to hourly buckets (tiny output: one row
    per hour — 8.8k/year), then the lag joins run on the already-tiny
    series (broadcast), global moments are a single-row agg. At 100 TB
    the only data-sized stage is the first partial-agg scan."""
    t = load_tables(spark, sf_dir, ("events",))
    hourly = (
        t["events"]
        .select(F.expr(f"unix_micros(ts) div {_US_PER_HOUR}").alias("h"))
        .groupBy("h")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    hourly = materialize_once(hourly)
    tot = hourly.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("ss"),
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    x = hourly.select(F.col("h").alias("hx"), F.col("cnt").alias("x"))
    y = hourly.select(F.col("h").alias("hy"), F.col("cnt").alias("y"))
    pairs = (
        lags.crossJoin(F.broadcast(x))
        .join(
            F.broadcast(y),
            F.col("hy") == F.col("hx") + F.col("lag"),
        )
        .groupBy("lag")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
        )
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    num = (
        F.col("sxy").cast("double")
        - mean * (F.col("sx") + F.col("sy")).cast("double")
        + F.col("n_pairs").cast("double") * mean * mean
    )
    den = F.col("ss").cast("double") - F.col("n").cast("double") * mean * mean
    return pairs.crossJoin(F.broadcast(tot)).select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").alias("n_hours"),
        F.col("n_pairs"),
        (num / den).alias("acf"),
    )


@query(
    "events_burstiness",
    oracle=f"""
    WITH hourly AS MATERIALIZED (
      SELECT event_type, epoch_us(ts) // {_US_PER_HOUR} AS h,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             CAST(MAX(h) - MIN(h) + 1 AS BIGINT) AS n_hours,
             CAST(SUM(cnt) AS BIGINT) AS s0,
             CAST(SUM(cnt * cnt) AS BIGINT) AS ss
      FROM hourly GROUP BY event_type
    )
    SELECT event_type, n_hours, s0 AS n_events,
           floor(((CAST(ss AS DOUBLE)
                   - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
                     / CAST(n_hours AS DOUBLE))
                  / CAST(n_hours AS DOUBLE))
                 / (CAST(s0 AS DOUBLE) / CAST(n_hours AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS fano,
           floor(sqrt((CAST(ss AS DOUBLE)
                       - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
                         / CAST(n_hours AS DOUBLE))
                      / CAST(n_hours AS DOUBLE))
                 / (CAST(s0 AS DOUBLE) / CAST(n_hours AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS cv
    FROM s
    """,
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion, var/mean) + coefficient of
    variation of the hourly arrival series per event type — the
    burstiness gauge that separates Poisson-like traffic (F ~ 1) from
    bursty (F >> 1) and clocklike (F << 1) types. events_autocorr says
    WHERE in time the structure is; this says HOW FAR from-random the
    dispersion is — together the arrival-process health panel.

    Convention: the series spans every hour from the type's first to
    last event (missing hours are true zero-count buckets — they
    contribute 0 to both moment sums, so only the span enters). All
    moments are exact BIGINT sums over integer counts; population
    variance; fano/cv are IEEE arithmetic + sqrt on identical scalars,
    6dp-masked at the boundary.

    Scale shape: one partial-agg shuffle to (type, hour) buckets (the
    only data-sized stage), then a type-keyed single-pass agg over the
    tiny bucket table. No windows, no driver traffic."""
    t = load_tables(spark, sf_dir, ("events",))
    hourly = (
        t["events"]
        .select(
            "event_type",
            F.expr(f"unix_micros(ts) div {_US_PER_HOUR}").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    s = hourly.groupBy("event_type").agg(
        (F.max("h") - F.min("h") + F.lit(1)).cast("long").alias("n_hours"),
        F.sum("cnt").cast("long").alias("s0"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("ss"),
    )
    nd = F.col("n_hours").cast("double")
    mean = F.col("s0").cast("double") / nd
    var = (
        F.col("ss").cast("double")
        - F.col("s0").cast("double") * F.col("s0").cast("double") / nd
    ) / nd

    def mask6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    return s.select(
        "event_type",
        "n_hours",
        F.col("s0").alias("n_events"),
        mask6(var / mean).alias("fano"),
        mask6(F.sqrt(var) / mean).alias("cv"),
    )


@query(
    "theil_sen_trend",
    oracle=f"""
    WITH daily AS MATERIALIZED (
      SELECT event_type,
             CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day_idx,
             {o_dsum('value')} / CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.event_type,
             (b.x - a.x) / CAST(b.day_idx - a.day_idx AS DOUBLE) AS m
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.day_idx > a.day_idx
    ),
    fit AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             quantile_cont(m, 0.5) AS slope
      FROM slopes GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           MIN(f.n_pairs) AS n_pairs,
           MIN(f.slope) AS slope,
           quantile_cont(d.x - f.slope * CAST(d.day_idx AS DOUBLE), 0.5)
             AS intercept
    FROM daily d JOIN fit f ON f.event_type = d.event_type
    GROUP BY d.event_type
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type: the slope is the MEDIAN
    of all pairwise slopes of the daily-mean series, the intercept the
    median residual offset — the outlier-resistant trend line (one
    corrupted day moves OLS arbitrarily, moves Theil–Sen not at all up
    to ~29% contamination). Completes the trend corner of the drift
    family: ewma_daily smooths, cusum_changepoint locates a break,
    this one ESTIMATES the drift rate robustly.

    Exactness: daily means are fixed-point sums / exact counts (both
    engines see identical doubles); each pairwise slope is one IEEE
    division on identical operands; Spark `percentile` and DuckDB
    `quantile_cont` share the lower+(upper-lower)*frac interpolation
    (the value_quartiles finding), so medians match bit-for-bit, and
    the intercept pass reuses the identical slope scalar.

    Scale shape: the raw scan collapses to types x days FIRST (one
    bounded-key shuffle); the O(days^2) pair join and both medians run
    on that tiny aggregate — at unbounded history, bound the trend
    window (trailing 90 days) exactly like ewma's decay horizon."""
    t = load_tables(spark, sf_dir, ("events",))
    from sql_flow_spark.registry import davg

    daily = (
        t["events"]
        .select(
            "event_type",
            (F.unix_micros("ts") / F.lit(_US_PER_DAY)).cast("long").alias(
                "day_idx"
            ),
            "value",
        )
        .groupBy("event_type", "day_idx")
        .agg(davg("value").alias("x"))
    )
    daily = materialize_once(daily)
    b = daily.select(
        F.col("event_type").alias("e2"),
        F.col("day_idx").alias("d2"),
        F.col("x").alias("x2"),
    )
    slopes = daily.join(
        b,
        (F.col("e2") == F.col("event_type")) & (F.col("d2") > F.col("day_idx")),
    ).select(
        "event_type",
        (
            (F.col("x2") - F.col("x"))
            / (F.col("d2") - F.col("day_idx")).cast("double")
        ).alias("m"),
    )
    fit = slopes.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.percentile("m", 0.5).alias("slope"),
    )
    return (
        daily.join(F.broadcast(fit), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.min("n_pairs").alias("n_pairs"),
            F.min("slope").alias("slope"),
            F.percentile(
                F.col("x") - F.col("slope") * F.col("day_idx").cast("double"),
                0.5,
            ).alias("intercept"),
        )
    )


@query(
    "mann_kendall_trend",
    oracle=f"""
    WITH daily AS MATERIALIZED (
      SELECT event_type,
             CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day_idx,
             {o_dsum('value')} / CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.day_idx > a.day_idx
      GROUP BY a.event_type
    ),
    nn AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM daily
      GROUP BY event_type
    ),
    ties AS (
      SELECT event_type,
             CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_adj
      FROM (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t
        FROM daily GROUP BY event_type, x
      ) WHERE t > 1 GROUP BY event_type
    ),
    z AS (
      SELECT nn.event_type, nn.n, s.s_stat,
             (nn.n * (nn.n - 1) * (2 * nn.n + 5)
              - COALESCE(t.tie_adj, 0)) AS var18
      FROM nn JOIN s ON s.event_type = nn.event_type
      LEFT JOIN ties t ON t.event_type = nn.event_type
    )
    SELECT event_type, n AS n_days, s_stat,
           CASE WHEN s_stat > 0 THEN
                  CAST(s_stat - 1 AS DOUBLE)
                    / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                WHEN s_stat < 0 THEN
                  CAST(s_stat + 1 AS DOUBLE)
                    / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                ELSE 0.0 END AS z,
           CASE WHEN s_stat > 0 AND CAST(s_stat - 1 AS DOUBLE)
                    / sqrt(CAST(var18 AS DOUBLE) / 18.0) > 1.959964
                  THEN 'increasing'
                WHEN s_stat < 0 AND CAST(s_stat + 1 AS DOUBLE)
                    / sqrt(CAST(var18 AS DOUBLE) / 18.0) < -1.959964
                  THEN 'decreasing'
                ELSE 'none' END AS trend
    FROM z
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test per event type: S = sum of
    pairwise signs of the daily-mean series, tie-corrected normal
    approximation, two-sided verdict at alpha=0.05 — the
    distribution-free IS-there-a-trend test beside theil_sen_trend's
    HOW-steep estimate (the classic pairing in environmental/SLA
    monitoring).

    Exactness: S and the tie-corrected variance*18 are exact BIGINT
    arithmetic on fixed-point-identical daily means; z is IEEE
    division/sqrt on identical scalars; the 1.959964 cut is a shared
    literal, so verdicts can't flip between engines.

    Scale shape: same as theil_sen_trend — types x days collapse
    first, O(days^2) sign join on the tiny aggregate, single-row
    moments per type. Bound the window at unbounded history."""
    t = load_tables(spark, sf_dir, ("events",))
    from sql_flow_spark.registry import davg

    daily = (
        t["events"]
        .select(
            "event_type",
            (F.unix_micros("ts") / F.lit(_US_PER_DAY)).cast("long").alias(
                "day_idx"
            ),
            "value",
        )
        .groupBy("event_type", "day_idx")
        .agg(davg("value").alias("x"))
    )
    daily = materialize_once(daily)
    b = daily.select(
        F.col("event_type").alias("e2"),
        F.col("day_idx").alias("d2"),
        F.col("x").alias("x2"),
    )
    s = (
        daily.join(
            b,
            (F.col("e2") == F.col("event_type"))
            & (F.col("d2") > F.col("day_idx")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("x2") > F.col("x"), 1)
                .when(F.col("x2") < F.col("x"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    nn = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    ties = (
        daily.groupBy("event_type", "x")
        .agg(F.count("*").cast("long").alias("t"))
        .where(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_adj")
        )
    )
    z = (
        nn.join(s, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            "n",
            "s_stat",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce(F.col("tie_adj"), F.lit(0))
            ).alias("var18"),
        )
    )
    sd = F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    zval = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1).cast("double") / sd)
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1).cast("double") / sd)
        .otherwise(F.lit(0.0))
    )
    return z.select(
        "event_type",
        F.col("n").alias("n_days"),
        "s_stat",
        zval.alias("z"),
        F.when((F.col("s_stat") > 0) & (zval > 1.959964), "increasing")
        .when((F.col("s_stat") < 0) & (zval < -1.959964), "decreasing")
        .otherwise("none")
        .alias("trend"),
    )


_KM_OUT_SCALE = 1_000_000.0  # 6dp rounding of the survival double


def _km_risk(spark: SparkSession, sf_dir: str):
    """Integer life-table for the repeat-purchase KM estimator: one
    row per distinct time-to-event value t with exact BIGINT columns
    (t, d events, c censorings, n_risk at-risk count). Days derive
    via pure integer date arithmetic (datediff from the epoch date —
    zero floats, zero timezone surface). The r10 diagnostic twins
    that preserved the legacy float-epoch/ln-fixed-point paths were
    retired in r13 after their green r12 driver rows closed the
    r8/r9 hash investigation (VERDICT r12 item 3).

    Scale shape: one shuffle onto o_custkey (bounded per-customer
    distinct-day sets), then everything runs on DISTINCT t values —
    calendar-bounded (a few thousand) regardless of fact-table size,
    so the unpartitioned cumulative window is over a calendar-sized
    table and cannot grow with data volume."""
    t = load_tables(spark, sf_dir, ("orders",))
    day = F.datediff(
        F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
    )
    od = t["orders"].select("o_custkey", day.cast("long").alias("day"))
    cust = od.groupBy("o_custkey").agg(
        F.array_sort(F.collect_set("day")).alias("ds")
    )
    g = od.agg(F.max("day").alias("gmax"))
    tot = cust.agg(F.count("*").cast("long").alias("n"))
    second = F.element_at("ds", 2) - F.element_at("ds", 1)
    censored = F.col("gmax") - F.element_at("ds", 1)
    obs = cust.crossJoin(F.broadcast(g)).select(
        F.when(F.size("ds") >= 2, second).otherwise(censored).alias("t"),
        F.when(F.size("ds") >= 2, 1).otherwise(0).alias("e"),
    )
    times = obs.groupBy("t").agg(
        F.sum("e").cast("long").alias("d"),
        F.sum(F.lit(1) - F.col("e")).cast("long").alias("c"),
    )
    w_prior = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    return times.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        "c",
        (
            F.col("n")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prior), F.lit(0)
            )
        ).alias("n_risk"),
    )


def _km_core_sql(day_expr: str) -> str:
    """DuckDB CTE chain mirroring _km_risk (shared by the production
    oracle; the day derivation is a parameter)."""
    return f"""
    od AS (
      SELECT o_custkey, {day_expr} AS day
      FROM orders
    ),
    cust AS (
      SELECT o_custkey, list_sort(list(DISTINCT day)) AS ds
      FROM od GROUP BY o_custkey
    ),
    g AS (SELECT MAX(day) AS gmax FROM od),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cust),
    obs AS (
      SELECT CASE WHEN len(ds) >= 2 THEN ds[2] - ds[1]
                  ELSE g.gmax - ds[1] END AS t,
             CASE WHEN len(ds) >= 2 THEN 1 ELSE 0 END AS e
      FROM cust CROSS JOIN g
    ),
    times AS (
      SELECT t, CAST(SUM(e) AS BIGINT) AS d,
             CAST(SUM(1 - e) AS BIGINT) AS c
      FROM obs GROUP BY t
    ),
    risk AS (
      SELECT t, d, c,
             CAST(tot.n - COALESCE(SUM(d + c) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
      FROM times CROSS JOIN tot
    )"""


_KM_DAY_DATEDIFF = (
    "CAST(datediff('day', DATE '1970-01-01',"
    " CAST(o_orderdate AS DATE)) AS BIGINT)"
)
@query(
    "kaplan_meier_retention",
    oracle=f"""
    WITH RECURSIVE {_km_core_sql(_KM_DAY_DATEDIFF)},
    idx AS (
      SELECT t, d, c, n_risk, ROW_NUMBER() OVER (ORDER BY t) AS i
      FROM risk
    ),
    rec AS (
      SELECT i, t, d, c, n_risk,
             CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS s
      FROM idx WHERE i = 1
      UNION ALL
      SELECT idx.i, idx.t, idx.d, idx.c, idx.n_risk,
             rec.s * (CAST(idx.n_risk - idx.d AS DOUBLE)
                      / CAST(idx.n_risk AS DOUBLE))
      FROM rec JOIN idx ON idx.i = rec.i + 1
    )
    SELECT t AS t_days, n_risk, d AS n_events, c AS n_censored,
           floor(s * {_KM_OUT_SCALE} + 0.5) / {_KM_OUT_SCALE} AS survival
    FROM rec WHERE d > 0
    """,
)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier repeat-purchase curve: per customer the event is
    the SECOND distinct order day (time-to-repeat, in days from the
    first order); customers who never reorder are right-censored at
    the corpus's last order day. S(t) = Π_{{t_i ≤ t}} (1 - d_i/n_i)
    with the standard convention that same-day censorings stay in the
    risk set for that day's events — the churn/retention estimator a
    subscription or repeat-purchase analysis starts from, robust to
    the fact that recent first-time customers simply haven't had time
    to reorder yet (censoring, not churn).

    Exactness (r10 redesign — the hashed contract is now 100%
    transcendental-free): order days come from PURE INTEGER date
    arithmetic (datediff vs the epoch date — no epoch_us float
    division, no timezone surface), all d/n counts are exact BIGINTs,
    and the survival product is the literal sequential IEEE
    recurrence S_k = S_{{k-1}} · (n_k − d_k)/n_k — one correctly
    rounded division and one correctly rounded multiplication per
    step, bit-identical in any IEEE-754 environment and independent
    of every libm (no ln, no exp anywhere; the r8 and r9 driver hash
    FAILs both lived in ln/exp-bearing columns). The recurrence runs
    where the series lives: ONE applyInPandas task over the
    calendar-bounded life table (the holt_linear_forecast pattern,
    bit-for-bit green in r8), against a DuckDB RECURSIVE CTE
    unrolling the identical expression sequence. Extinction (d = n)
    needs no special case: the factor is exactly 0.0 and the product
    stays 0.0. Output rounding floor(s·1e6+0.5)/1e6 uses IEEE ops
    only on bit-identical inputs. (The r10 diagnostic twins that
    bisected the historical r8/r9 divergence were retired in r13
    after landing green driver rows in r12.)

    Scale shape: see _km_risk — one custkey shuffle, then all later
    stages (including the grouped-map recurrence) operate on distinct
    time values, bounded by the study horizon in days regardless of
    row count."""
    import math

    import pandas as pd

    risk = _km_risk(spark, sf_dir)

    def _surv(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t").reset_index(drop=True)
        s = 1.0
        out = []
        for n, d in zip(pdf["n_risk"].tolist(), pdf["d"].tolist()):
            s = s * (float(n - d) / float(n))
            out.append(
                math.floor(s * _KM_OUT_SCALE + 0.5) / _KM_OUT_SCALE
            )
        pdf["survival"] = out
        keep = pdf[pdf["d"] > 0]
        return pd.DataFrame(
            {
                "t_days": keep["t"],
                "n_risk": keep["n_risk"],
                "n_events": keep["d"],
                "n_censored": keep["c"],
                "survival": keep["survival"],
            }
        )

    return risk.groupBy(F.lit(1).alias("g")).applyInPandas(
        _surv,
        schema=(
            "t_days long, n_risk long, n_events long, n_censored long,"
            " survival double"
        ),
    )


@query(
    "skyline_parts",
    oracle="""
    WITH s AS (
      SELECT p_size, MIN(p_retailprice) AS bp FROM part GROUP BY p_size
    ),
    best AS (
      SELECT p.p_size, s.bp, CAST(COUNT(*) AS BIGINT) AS n_at_best,
             MIN(p.p_partkey) AS example_partkey
      FROM part p JOIN s ON p.p_size = s.p_size AND p.p_retailprice = s.bp
      GROUP BY p.p_size, s.bp
    )
    SELECT p_size, bp AS best_price, n_at_best, example_partkey
    FROM best b
    WHERE NOT EXISTS (
      SELECT 1 FROM s WHERE s.p_size < b.p_size AND s.bp <= b.bp
    )
    """,
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query: the parts not dominated on
    (size ↓, price ↓) — no other part is both no-larger AND no-pricier
    with at least one strict improvement. The multi-criteria
    shortlist shape ("show me the efficient frontier") that no
    single ORDER BY can answer; classic operator from the skyline
    literature (Börzsönyi et al.).

    The oracle states the DEFINITION (quadratic NOT EXISTS
    domination); the Spark plan exploits 2D structure instead: reduce
    to the per-size minimum price (one bounded-key shuffle with
    map-side partials — domination within a size class is just MIN),
    then a point survives iff its price is strictly below the running
    minimum over all smaller sizes. Equality comparisons are on raw
    parquet doubles (identical bits both engines), so the frontier
    membership cannot diverge.

    Scale shape: one groupBy onto the ~50-value size domain, a
    broadcast join back for the tie census, and a window over ≤50
    rows (bounded by the size DOMAIN, not the part count — the
    frontier reduction is what makes skyline tractable at 100 TB)."""
    t = load_tables(spark, sf_dir, ("part",))
    p = t["part"].select("p_partkey", "p_size", "p_retailprice")
    s = (
        p.groupBy("p_size")
        .agg(F.min("p_retailprice").alias("bp"))
        .select(F.col("p_size").alias("s_size"), "bp")
    )
    best = (
        p.join(
            F.broadcast(s),
            (F.col("p_size") == F.col("s_size"))
            & (F.col("p_retailprice") == F.col("bp")),
        )
        .groupBy(F.col("p_size").alias("sz"), "bp")
        .agg(
            F.count("*").cast("long").alias("n_at_best"),
            F.min("p_partkey").alias("example_partkey"),
        )
    )
    # strict running min over smaller sizes: ≤ size-domain rows
    w = Window.orderBy("sz").rowsBetween(Window.unboundedPreceding, -1)
    return (
        best.withColumn("prior_min", F.min("bp").over(w))
        .where(F.col("prior_min").isNull() | (F.col("bp") < F.col("prior_min")))
        .select(
            F.col("sz").alias("p_size"),
            F.col("bp").alias("best_price"),
            "n_at_best",
            "example_partkey",
        )
    )


_AB_Z_CRIT = 1.959964  # two-sided 5%, same literal as mann_kendall


@query(
    "conversion_ab_test",
    oracle=f"""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events
      GROUP BY user_id
    ),
    arms AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN arm = 'A' THEN converted ELSE 0 END) AS BIGINT)
          AS c_a,
        CAST(SUM(CASE WHEN arm = 'B' THEN converted ELSE 0 END) AS BIGINT)
          AS c_b
      FROM assign
    )
    SELECT n_a, n_b,
           CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS conv_a,
           CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS conv_b,
           CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN 0.0 ELSE
             floor((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                    - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
               / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 - CAST(c_a + c_b AS DOUBLE)
                     / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
               * 1000000.0 + 0.5) / 1000000.0
           END AS z_score,
           CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN FALSE ELSE
             abs((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                  - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
               / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 - CAST(c_a + c_b AS DOUBLE)
                     / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))))
               > {_AB_Z_CRIT}
           END AS significant
    FROM arms
    """,
)
def conversion_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on purchase conversion between a
    deterministic 50/50 user split (user_id parity — the stable
    assignment train_val_split established; a real experiment hashes
    the unit id) — the experimentation primitive: pooled-variance z
    and a two-sided 5% verdict, same 1.959964 critical literal as
    mann_kendall_trend so verdicts can't flip between engines.

    Exactness: per-arm user and converter counts are exact BIGINTs
    from one per-user collapse; the z statistic is a single IEEE
    expression over those integers, 6dp-rounded.

    Scale shape: one shuffle onto user_id (per-user converted flag
    with map-side partial MAX), then a single-row global aggregate of
    map-side partials. Nothing downstream grows with data."""
    t = load_tables(spark, sf_dir, ("events",))
    assign = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
        .select(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
            "converted",
        )
    )
    arms = assign.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == "A", F.col("converted")).otherwise(0))
        .cast("long")
        .alias("c_a"),
        F.sum(F.when(F.col("arm") == "B", F.col("converted")).otherwise(0))
        .cast("long")
        .alias("c_b"),
    )
    conv_a = F.col("c_a").cast("double") / F.col("n_a").cast("double")
    conv_b = F.col("c_b").cast("double") / F.col("n_b").cast("double")
    pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    # degenerate experiment (everyone or no one converts): se = 0, the
    # z statistic is undefined -> report 0 / not significant, exactly
    # as the oracle does (ANSI mode would otherwise hard-fail the
    # division; DuckDB would return inf/nan -- both wrong answers)
    degen = (F.col("c_a") + F.col("c_b") == 0) | (
        F.col("c_a") + F.col("c_b") == F.col("n_a") + F.col("n_b")
    )
    z = F.when(degen, F.lit(0.0)).otherwise((conv_a - conv_b) / se)
    return arms.select(
        "n_a",
        "n_b",
        conv_a.alias("conv_a"),
        conv_b.alias("conv_b"),
        (F.floor(z * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)).alias(
            "z_score"
        ),
        (~degen & (F.abs(z) > F.lit(_AB_Z_CRIT))).alias("significant"),
    )
