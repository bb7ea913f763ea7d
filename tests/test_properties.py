"""Property-based tests (hypothesis) for the pure-python pieces, plus a
seeded cross-engine determinism check for the fixed-point summation
core (the engine's central correctness trick)."""

import math
from decimal import Decimal

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sql_flow_spark.functions.multimodal import fake_decode_features
from sql_flow_spark.udf import parse_domain


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_parse_domain_total(s):
    # never raises, always returns a string
    assert isinstance(parse_domain(s), str)


@given(st.from_regex(r"https?://([a-z0-9\-]{1,10}\.){1,4}[a-z]{2,6}(/[a-z0-9]{0,8})?", fullmatch=True))
@settings(max_examples=200, deadline=None)
def test_parse_domain_is_suffix_of_host(url):
    dom = parse_domain(url)
    host = url.split("://", 1)[1].split("/", 1)[0]
    assert dom == "" or host.endswith(dom)
    if dom:
        assert 2 <= dom.count(".") + 1 <= 3  # registered domain has 2-3 labels


@given(st.binary(max_size=4096))
@settings(max_examples=200, deadline=None)
def test_fake_decode_features_total(payload):
    blen, frames, first = fake_decode_features(payload)
    assert blen == len(payload)
    assert frames == len(payload) // 256
    assert first == (payload[0] if payload else 0)


def _fixed_point_sum(values, scale=4):
    m = 10**scale
    return float(sum(Decimal(math.floor(v * m + 0.5)) for v in values)) / m


def test_fixed_point_sum_matches_engines(spark):
    """The determinism contract itself: spark dsum == duckdb o_dsum ==
    python reference, on adversarial values (many near rounding
    boundaries)."""
    from sql_flow_spark.registry import dsum, o_dsum

    rng = np.random.RandomState(7)
    vals = np.concatenate([
        rng.uniform(-1e5, 1e5, 3000),
        np.round(rng.uniform(0, 100, 3000), 4) + 5e-5,  # boundary-adjacent
        rng.uniform(0, 1, 3000) * 1e-3,
    ])
    pdf_vals = [float(v) for v in vals]

    sdf = spark.createDataFrame([(v,) for v in pdf_vals], "v double")
    got_spark = sdf.agg(dsum("v").alias("s")).first().s

    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in pdf_vals])
    got_duck = con.execute(f"SELECT {o_dsum('v')} FROM t").fetchone()[0]

    got_py = _fixed_point_sum(pdf_vals)
    assert got_spark == got_duck == pytest.approx(got_py, abs=0)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_connected_components_matches_union_find(spark):
    """Randomized + adversarial graphs vs a brute-force union-find:
    random sparse graphs, a 12-node chain (forces ~11 propagation
    iterations — the existing fixed tests only cover diameter <= 3),
    a clique, and disjoint stars."""
    from sql_flow_spark.functions.curation import connected_components

    rng = np.random.RandomState(11)
    graphs = [
        [(int(a), int(b)) for a, b in rng.randint(0, 30, (25, 2)) if a != b],
        [(i, i + 1) for i in range(12)],                     # chain
        [(a, b) for a in range(6) for b in range(a + 1, 6)], # clique
        [(0, k) for k in range(1, 5)] + [(100, 100 + k) for k in range(1, 5)],
        [(int(a), int(b)) for a, b in rng.randint(0, 60, (40, 2)) if a != b],
    ]
    for edges in graphs:
        expected = _union_find_components(edges)
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r.doc_id: r.cluster_id
            for r in connected_components(df, max_iters=25).collect()
        }
        assert got == expected, f"mismatch on graph {edges[:5]}..."


# ---------------------------------------- temporal join randomized sweeps
#
# 200 seeded-random scenarios PACKED INTO ONE DataFrame each (scenario
# id rides the join key), so the whole sweep is two Spark jobs, not
# 400. References are brute-force python over the same tuples.


def _temporal_cases(seed, n_scen):
    rng = np.random.RandomState(seed)
    cases = []
    for sid in range(n_scen):
        nl, nr = rng.randint(0, 6), rng.randint(0, 6)
        # small ts range forces boundary collisions (equal ts, exact
        # window edges) far more often than uniform reals would
        left = [(sid, int(t)) for t in rng.randint(0, 40, nl)]
        right = [(sid, int(t), float(v)) for t, v in zip(rng.randint(0, 40, nr), rng.randint(0, 100, nr))]
        cases.append((left, right))
    return cases


def test_asof_join_matches_bruteforce_sweep(spark):
    from sql_flow_spark.operators.asof import asof_join

    cases = _temporal_cases(7, 200)
    lrows = [(sid, ts, i) for c in cases for i, (sid, ts) in enumerate(c[0])]
    # collapse right to unique (key, ts) keeping max v — the operator's
    # documented uniqueness contract
    rmap = {}
    for c in cases:
        for sid, ts, v in c[1]:
            rmap[(sid, ts)] = max(rmap.get((sid, ts), -1.0), v)
    rrows = [(sid, ts, v) for (sid, ts), v in rmap.items()]
    left = spark.createDataFrame(lrows, "k int, ts int, lid int")
    right = spark.createDataFrame(rrows, "k int, ts int, payload double")
    got = {
        (r["k"], r["ts"], r["lid"]): (r["payload"], r["asof_ts"])
        for r in asof_join(left, right, ["k"], "ts", ["payload"]).collect()
    }
    assert len(got) == len(lrows)
    for sid, ts, lid in lrows:
        prior = [(t, v) for (s, t), v in rmap.items() if s == sid and t <= ts]
        want = max(prior) if prior else None
        if want is None:
            assert got[(sid, ts, lid)] == (None, None)
        else:
            assert got[(sid, ts, lid)] == (want[1], want[0])


def test_range_join_matches_bruteforce_sweep(spark):
    from sql_flow_spark.operators.temporal import range_join

    W = 10
    cases = _temporal_cases(11, 200)
    lrows = [
        (sid, ts, i) for c in cases for i, (sid, ts) in enumerate(c[0])
    ]
    rrows = [
        (sid, ts, j)
        for c in cases
        for j, (sid, ts, _v) in enumerate(c[1])
    ]
    left = spark.createDataFrame(lrows, "k int, lus long, lid int")
    right = spark.createDataFrame(rrows, "k int, rus long, rid int")
    got = sorted(
        (r["k"], r["lid"], r["rid"])
        for r in range_join(left, right, ["k"], "lus", "rus", W).collect()
    )
    want = sorted(
        (sid, lid, rid)
        for (sid, lts, lid) in lrows
        for (rid_sid, rts, rid) in rrows
        if rid_sid == sid and lts <= rts <= lts + W
    )
    assert got == want


def test_merge_pair_fold_matches_python_sweep(spark):
    """The BPE merge fold (Catalyst aggregate HOF) vs the plain-python
    greedy scan on 300 random symbol arrays from a 2-letter alphabet
    (maximizing adjacent/overlapping merge collisions like 'aaaa')."""
    from pyspark.sql import functions as F

    from sql_flow_spark.functions.bpe import _merge_pair

    rng = np.random.RandomState(5)
    arrays = [
        [str(c) for c in rng.choice(["a", "b"], rng.randint(0, 9))]
        for _ in range(300)
    ]

    def py_merge(syms, a, b):
        out = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    df = spark.createDataFrame(
        [(i, arr) for i, arr in enumerate(arrays)], "i int, syms array<string>"
    )
    for a, b in (("a", "a"), ("a", "b"), ("b", "a")):
        got = {
            r["i"]: list(r["m"])
            for r in df.select(
                "i", _merge_pair(F.col("syms"), F.lit(a), F.lit(b)).alias("m")
            ).collect()
        }
        for i, arr in enumerate(arrays):
            assert got[i] == py_merge(arr, a, b), (a, b, arr)


def _adversarial_texts():
    """Deterministic corpus of edge-case documents for the shared
    text-signal helpers: empties, whitespace runs, unicode, digit/punct
    walls, regex metacharacters, repeats. Two characters are excluded
    on purpose, each a pinned engine-dialect boundary this fuzz itself
    surfaced or confirmed: \\x0b (java.util.regex and RE2 class \\s
    genuinely disagree — the documented tokenizer edge) and U+0130
    'İ' (JVM/Python lower() emits i + combining dot U+0307, DuckDB's
    utf8proc emits plain i, so lowercased fingerprints split). Both
    only matter for cross-ENGINE hash parity — within one engine the
    fingerprints stay self-consistent, which is all dedup needs at
    scale. Everything else must match exactly, including NaNs."""
    rng = np.random.RandomState(12)
    words = ["the", "cat", "über", "naïve", "data", "x1", "#!?", "émü",
             "汉字", "🦆", "a" * 40, "-", "3.14", "foo@bar.com"]
    texts = [
        "",
        " ",
        "   \t\n  ",
        "word",
        "the the the the the the",
        "1234 5678 $$$ %%% ^^^",
        ".*+?()[]{}|\\^$",
        "a\tb\nc  d\r\ne",
        "ﬁnancial ŒUVRE ẞharp istanbul",  # İ excluded: see docstring
        "🦆🦆🦆 emoji only 🦆",
        ("repeat me " * 30).strip(),
    ]
    for _ in range(60):
        n = rng.randint(1, 25)
        texts.append(" ".join(words[i] for i in rng.randint(0, len(words), n)))
    return texts


def test_text_signal_helpers_match_duckdb_on_adversarial_corpus(spark):
    """Cross-engine fuzz of the shared curation signal helpers
    (quality_score / with_repetition_2gram / prefix_fingerprint /
    fingerprint) against their DuckDB oracle twins on texts far
    outside the synthetic corpus's distribution. The oracle sweep
    proves the pair on well-behaved generator text; this proves the
    CONSTRUCTIONS agree on empties, unicode, regex metachars and
    pathological repeats — exactly where regex-dialect or
    null-semantics drift would hide."""
    from sql_flow_spark.functions.curation import (
        _O_QUALITY,
        LEAK_PREFIX_TOKENS,
        prefix_fingerprint,
        quality_score,
        with_repetition_2gram,
    )
    from sql_flow_spark.functions.dedup import O_NGRAMS, O_TOKENS
    from sql_flow_spark.functions.textops import O_NORMALIZE, fingerprint

    texts = _adversarial_texts()
    rows = list(enumerate(texts))
    sdf = with_repetition_2gram(
        spark.createDataFrame(rows, "doc_id long, text string"), "text"
    ).select(
        "doc_id",
        quality_score("text").alias("q"),
        "rep_2gram",
        prefix_fingerprint("text").alias("pfp"),
        fingerprint("text").alias("fp"),
    )
    got = {r.doc_id: (repr(r.q), repr(r.rep_2gram), r.pfp, r.fp)
           for r in sdf.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    sql = f"""
    WITH q AS ({_O_QUALITY}),
    rep AS (
      SELECT doc_id,
        CASE WHEN len(g2) = 0 THEN 0.0
             ELSE CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)
                  / CAST(len(g2) AS DOUBLE) END AS rep_2gram
      FROM (
        SELECT doc_id,
               list_transform(generate_series(1, len({O_TOKENS}) - 1),
                 i -> {O_TOKENS}[i] || ' ' || {O_TOKENS}[i+1]) AS g2
        FROM documents
      )
    )
    SELECT d.doc_id, q.q, rep.rep_2gram,
           md5(array_to_string(
             list_slice(regexp_split_to_array(trim(lower(d.text)), '\\s+'),
                        1, {LEAK_PREFIX_TOKENS}), ' ')) AS pfp,
           md5({O_NORMALIZE.format(expr='d.text')}) AS fp
    FROM documents d JOIN q USING (doc_id) JOIN rep USING (doc_id)
    """
    want = {r[0]: (repr(r[1]), repr(r[2]), r[3], r[4])
            for r in con.execute(sql).fetchall()}

    assert set(got) == set(want)
    mismatches = {
        i: (got[i], want[i], texts[i][:40])
        for i in got if got[i] != want[i]
    }
    assert not mismatches, f"{len(mismatches)} divergent docs: {mismatches}"
