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
