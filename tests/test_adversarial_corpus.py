"""Adversarial-corpus sweep: every oracle-backed key that scans the
``documents`` table runs against a pathological documents set (empty
docs, whitespace-only, unicode, regex metacharacters, pathological
repeats) and must BOTH survive ANSI Spark and still hash-match its
DuckDB oracle. The synthetic generator corpus never exercises these
rows, which is exactly how the quality_score 0/0 ANSI crash hid until
the r12 text fuzz (test_properties.py) caught it — this sweep closes
the same gap for every other documents operator in one shot.

Marked `full`: it is a corpus-robustness gate, not an inner-loop test.

Corpus notes: doc_id stays contiguous-from-0 (several keys seed or
split on it); lang values stay within the lang-model set; the two
pinned engine-dialect characters (\\x0b tokenizer class, U+0130 lower)
are excluded — see test_properties.py for why those two diverge by
engine design rather than by bug.
"""

import os
import shutil

import duckdb
import pytest

import __spark_entry__ as entrymod
from sql_flow_spark.tables import TABLE_NAMES

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

BASE_SF = "/root/testdata/sf0.001"

TEXTS = [
    "",  # empty: the ANSI 0/0 class
    " ",
    "   \t\n  \r\n ",
    "word",
    "the the the the the the the the",
    "1234 5678 $$$ %%% ^^^ 0000 ....",
    ".*+?()[]{}|\\^$ .*+?()[]{}|\\^$",
    "a\tb\nc  d\r\ne f",
    "ﬁnancial ŒUVRE ẞharp istanbul émü über",
    "🦆🦆🦆 emoji only 🦆 汉字 漢字",
    ("repeat me " * 40).strip(),
    "one",
    "the quick brown fox jumps over the lazy dog again and again",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "x" * 300,
]


def _docs_key_names():
    """Oracle-backed keys whose builder source mentions the documents
    table (load_tables or the shared helpers over it)."""
    import inspect

    names = []
    for name, fn in QUERIES.items():
        if name not in ORACLES:
            continue
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            continue
        if '"documents"' in src or "'documents'" in src:
            names.append(name)
    return sorted(names)


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    """sf0.001 with documents replaced by the adversarial corpus (all
    other tables copied so any key can load them). Written with
    pyarrow as a single file to match the testdata layout (a Spark
    write would produce a directory DuckDB's single-file views and
    load_tables don't expect)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("adv_sf")
    for t in TABLE_NAMES:
        if t != "documents":
            shutil.copy(
                os.path.join(BASE_SF, f"{t}.parquet"),
                os.path.join(root, f"{t}.parquet"),
            )
    langs = ["en", "es", "de", "fr", "it"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
            "lang": pa.array(
                [langs[i % len(langs)] for i in range(len(TEXTS))]
            ),
            "source": pa.array([f"src{i % 4}" for i in range(len(TEXTS))]),
            "n_chars": pa.array([len(t) for t in TEXTS], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(str(root), "documents.parquet"))
    return str(root)


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{adv_dir}/{t}.parquet'"
        )
    return con


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(r[i]) for i in order) for r in rows)


@pytest.mark.full
@pytest.mark.parametrize("name", _docs_key_names())
def test_documents_key_survives_adversarial_corpus(
    name, spark, adv_dir, adv_duck
):
    sdf = QUERIES[name](spark, adv_dir)
    srows = [tuple(r) for r in sdf.collect()]  # must not raise (ANSI)
    res = adv_duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    assert sorted(sdf.columns) == sorted(dcols)
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


# ------------------------------------------- adversarial embeddings

def _adversarial_embeddings():
    """Pathological embedding corpus: zero vectors (a failed embedding
    job's classic output — norm 0 makes every cosine a 0/0), duplicate
    vectors, near-zero magnitudes, one-hot axes, and ordinary random
    vectors so top-k/cluster paths have real work. Deliberately NOT
    included: huge magnitudes (1e30-scale components) — the engine's
    exact fixed-point dot/variance machinery documents a unit-ish
    component domain (real embedding models emit normalized-ish
    vectors; see similarity.py's overflow-bound notes), so extreme
    magnitudes are a documented domain limit, not a robustness bug.
    Values are float32-exact (generated at 1e-? scales representable
    in f32) so the parquet FLOAT[] column loses nothing. 40 vectors,
    64 dims, vec_id contiguous from 0 (seed/split conventions)."""
    import numpy as np

    rng = np.random.RandomState(3)
    dim = 64
    vecs = []
    vecs.append(np.zeros(dim))                       # all-zero
    vecs.append(np.zeros(dim))                       # duplicate zero
    one_hot = np.zeros(dim); one_hot[0] = 1.0
    vecs.append(one_hot)                             # axis vector
    vecs.append(one_hot * 1e-30)                     # tiny magnitude
    vecs.append(-one_hot)                            # antipodal
    same = rng.uniform(-1, 1, dim).round(3)
    vecs.append(same.copy())                         # exact duplicate a
    vecs.append(same.copy())                         # exact duplicate b
    for _ in range(32):
        vecs.append(rng.uniform(-1, 1, dim).round(3))
    return [np.asarray(v, dtype=np.float32) for v in vecs]


def _emb_key_names():
    import inspect

    names = []
    for name, fn in QUERIES.items():
        if name not in ORACLES:
            continue
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            continue
        if '"embeddings"' in src or "'embeddings'" in src:
            names.append(name)
    return sorted(names)


@pytest.fixture(scope="module")
def adv_emb_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("adv_emb_sf")
    for t in TABLE_NAMES:
        if t != "embeddings":
            shutil.copy(
                os.path.join(BASE_SF, f"{t}.parquet"),
                os.path.join(root, f"{t}.parquet"),
            )
    vecs = _adversarial_embeddings()
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(
                [i % 10 for i in range(len(vecs))], pa.int32()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(str(root), "embeddings.parquet"))
    return str(root)


@pytest.fixture(scope="module")
def adv_emb_duck(adv_emb_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{adv_emb_dir}/{t}.parquet'"
        )
    return con


@pytest.mark.full
@pytest.mark.parametrize("name", _emb_key_names())
def test_embedding_key_survives_adversarial_corpus(
    name, spark, adv_emb_dir, adv_emb_duck
):
    sdf = QUERIES[name](spark, adv_emb_dir)
    srows = [tuple(r) for r in sdf.collect()]  # must not raise (ANSI)
    res = adv_emb_duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    assert sorted(sdf.columns) == sorted(dcols)
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)
