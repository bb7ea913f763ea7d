"""Second-decade scale probe: sf0.1 -> 10x-replicated sf0.1.

The 10x probes recorded in SCALING.md measure sf0.01 -> sf0.1 (one
decade of real generator growth). This script measures the NEXT decade
for the heaviest document-corpus operators by materializing a
10x-replicated sf0.1 `documents` table on disk and timing the same
registry callables against it — proving the linearity claims hold over
two orders of magnitude, not one.

Replication protocol (deterministic, documented so the numbers are
reproducible):

- replica i of N re-keys ``doc_id' = doc_id + i * max_id`` so exact
  dedup keys stay unique;
- every word whose ``crc32(word) % 4 == i % 4`` gets a ``_r{i}``
  suffix (i=0 keeps the original corpus byte-identical). Changing
  ~25% of words per replica drops cross-replica Jaccard well below
  the near-dup thresholds (0.7-0.8), so replicas behave like NEW
  documents from the same length/vocabulary distribution rather than
  like 10-way duplicate families. A plain re-keyed union would make
  every doc a 10-way near-dup cluster — that measures a duplication
  pathology (quadratic candidate pairs inside every LSH bucket), not
  data growth, which is what this probe is for.
- all other tables are copied unchanged (the probed keys only scan
  ``documents``; copying keeps load_tables working for any key).

Graph mode (``--mode graph``, r8 — second decade for the co-purchase
graph family): replicates ``lineitem`` instead, re-keying
``l_orderkey' = l_orderkey + i * max_orderkey`` and leaving
``l_partkey`` UNCHANGED — 10x the baskets over the same part catalog,
the realistic growth model (transactions outgrow the catalog). Nodes
stay fixed while the edge set densifies toward saturation, which is
exactly the regime where triangle_count's O(E^1.5) wedge work bites
and the w>=2 sparsification lever is supposed to pay — this probe
measures both sides of that A/B. A partkey re-key would instead make
10 disjoint graph copies (embarrassingly parallel, trivially linear)
and prove nothing.

Timing: one warm JVM, each (key, dir) run twice, best-of-2 — the same
protocol as the SCALING.md 10x tables.

Usage:
    python scripts/scale_probe.py                  # default 5 heavy keys
    python scripts/scale_probe.py --keys chunk_dedup,bpe_apply
    python scripts/scale_probe.py --replicas 10 --base /root/testdata/sf0.1
    python scripts/scale_probe.py --mode graph     # graph family keys
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_KEYS = (
    "dedup_clusters_lsh",
    "bpe_apply",
    "bpe_learn_merges",
    "chunk_dedup",
    "boilerplate_flag",
)

GRAPH_KEYS = (
    "triangle_count_sparse",
    "triangle_count",
    "degree_assortativity",
    "pagerank_copurchase",
)


def build_replica_dir(base: str, replicas: int, out: str) -> str:
    """Materialize the 10x dir: copied tables + replicated documents."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    for f in os.listdir(base):
        if f.endswith(".parquet") and f != "documents.parquet":
            dst = os.path.join(out, f)
            if not os.path.exists(dst):
                shutil.copyfile(os.path.join(base, f), dst)

    dst_docs = os.path.join(out, "documents.parquet")
    marker = os.path.join(out, f".replicas_{replicas}")
    if os.path.exists(dst_docs) and os.path.exists(marker):
        return out

    table = pq.read_table(os.path.join(base, "documents.parquet"))
    n = table.num_rows
    max_id = pc.max(table.column("doc_id")).as_py() + 1
    texts = table.column("text").to_pylist()

    def perturb(text: str, i: int) -> str:
        if i == 0 or text is None:
            return text
        words = text.split(" ")
        tag = i % 4
        sfx = f"_r{i}"
        return " ".join(
            w + sfx if zlib.crc32(w.encode()) % 4 == tag else w
            for w in words
        )

    chunks = []
    for i in range(replicas):
        ptexts = [perturb(t, i) for t in texts]
        chunk = table.set_column(
            table.schema.get_field_index("text"), "text",
            pa.array(ptexts, type=pa.string()),
        )
        ids = pc.add(table.column("doc_id"), i * max_id)
        chunk = chunk.set_column(
            table.schema.get_field_index("doc_id"), "doc_id", ids
        )
        # keep n_chars consistent with the perturbed text
        nchars = pa.array(
            [len(t) if t is not None else None for t in ptexts],
            type=pa.int64(),
        )
        chunk = chunk.set_column(
            table.schema.get_field_index("n_chars"), "n_chars", nchars
        )
        chunks.append(chunk)
    big = pa.concat_tables(chunks)
    pq.write_table(big, dst_docs)
    with open(marker, "w") as f:
        f.write(str(big.num_rows))
    print(f"replica dir {out}: documents {n} -> {big.num_rows} rows",
          file=sys.stderr)
    return out


def build_graph_replica_dir(base: str, replicas: int, out: str) -> str:
    """Graph-mode 10x dir: copied tables + replicated lineitem
    (orderkeys re-keyed per replica, partkeys untouched — basket
    growth over a fixed catalog; see module docstring)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    for f in os.listdir(base):
        if f.endswith(".parquet") and f != "lineitem.parquet":
            dst = os.path.join(out, f)
            if not os.path.exists(dst):
                shutil.copyfile(os.path.join(base, f), dst)

    dst_li = os.path.join(out, "lineitem.parquet")
    marker = os.path.join(out, f".li_replicas_{replicas}")
    if os.path.exists(dst_li) and os.path.exists(marker):
        return out

    table = pq.read_table(os.path.join(base, "lineitem.parquet"))
    max_ok = pc.max(table.column("l_orderkey")).as_py() + 1
    ok_idx = table.schema.get_field_index("l_orderkey")
    chunks = []
    for i in range(replicas):
        ids = pc.add(table.column("l_orderkey"), i * max_ok)
        chunks.append(table.set_column(ok_idx, "l_orderkey", ids))
    big = pa.concat_tables(chunks)
    pq.write_table(big, dst_li)
    with open(marker, "w") as f:
        f.write(str(big.num_rows))
    print(
        f"graph replica dir {out}: lineitem {table.num_rows} -> "
        f"{big.num_rows} rows",
        file=sys.stderr,
    )
    return out


def time_key(fn, spark, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--keys", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--mode", choices=("docs", "graph"), default="docs")
    args = ap.parse_args()

    from sql_flow_spark.operators import QUERIES
    from sql_flow_spark.session import get_spark

    default_keys = GRAPH_KEYS if args.mode == "graph" else DEFAULT_KEYS
    keys = [
        k.strip()
        for k in (args.keys or ",".join(default_keys)).split(",")
        if k.strip()
    ]
    unknown = [k for k in keys if k not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")

    out = args.out or (
        "/tmp/sfs_probe_10x_graph" if args.mode == "graph"
        else "/tmp/sfs_probe_10x"
    )
    if args.mode == "graph":
        replica = build_graph_replica_dir(args.base, args.replicas, out)
    else:
        replica = build_replica_dir(args.base, args.replicas, out)
    spark = get_spark()

    results = {}
    for k in keys:
        fn = QUERIES[k]
        base_s = time_key(fn, spark, args.base)
        big_s = time_key(fn, spark, replica)
        ratio = big_s / base_s if base_s > 0 else float("inf")
        results[k] = {
            "sf0.1_s": round(base_s, 2),
            f"x{args.replicas}_s": round(big_s, 2),
            "ratio": round(ratio, 2),
        }
        print(f"{k}: {base_s:.2f}s -> {big_s:.2f}s  ratio {ratio:.2f}x",
              file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
