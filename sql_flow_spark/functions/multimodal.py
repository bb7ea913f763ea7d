"""Multimodal column plumbing (SURVEY.md §2 row 33).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side machinery here is real and tested — schema, Arrow batch
shape, mapInPandas signature, partitioning — while the actual media
decode is STUBBED (this container has no image/audio libs): see
``decode_image``, which raises NotImplementedError, and
``fake_decode_features``, the deterministic stand-in the pipeline uses.

At 100 TB: binary payloads dominate partition size, so the operator
keeps ``spark.sql.files.maxPartitionBytes``-sized inputs, never
collects, and emits only small typed features.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from sql_flow_spark.registry import query
from sql_flow_spark.tables import load_tables

FRAME_BYTES = 256  # fake frame size for the deterministic stub

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("n_frames", LongType()),
        StructField("first_byte", IntegerType()),
    ]
)


def decode_image(payload: bytes):
    """STUB: real image decode (PIL/opencv are not in this container).
    The Spark plumbing around it is real; swap this for a library call
    in a full deployment."""
    raise NotImplementedError(
        "media decode is stubbed in this environment; use fake_decode_features"
    )


def fake_decode_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode + feature extraction."""
    return len(payload), len(payload) // FRAME_BYTES, payload[0] if payload else 0


def extract_features(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over a binary column. Arrow
    delivers the payload batches; output is the small typed schema."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode_features(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": pd.Series([f[0] for f in feats], dtype="int64"),
                    "n_frames": pd.Series([f[1] for f in feats], dtype="int64"),
                    "first_byte": pd.Series([f[2] for f in feats], dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_extract, FEATURE_SCHEMA)


@query(
    "multimodal_features",
    # first_byte must be the first UTF-8 *byte* of the payload (what the
    # stub reads from the binary column), not the Unicode code point —
    # derive the UTF-8 lead byte from the code point in pure SQL so
    # non-ASCII leading chars agree with Spark (e.g. 'é' -> 195, not 233).
    oracle=f"""
    SELECT
      doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      CAST(octet_length(encode(text)) // {FRAME_BYTES} AS BIGINT) AS n_frames,
      CAST(CASE
        WHEN octet_length(encode(text)) = 0 THEN 0
        WHEN ascii(text) < 128 THEN ascii(text)
        WHEN ascii(text) < 2048 THEN 192 + ascii(text) // 64
        WHEN ascii(text) < 65536 THEN 224 + ascii(text) // 4096
        ELSE 240 + ascii(text) // 262144
      END AS INTEGER) AS first_byte
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction end-to-end: documents.text is
    encoded to a binary payload (standing in for stored media bytes),
    then features are extracted via mapInPandas. The oracle recomputes
    the deterministic stub's outputs in SQL."""
    t = load_tables(spark, sf_dir, ("documents",))
    payloads = t["documents"].select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return extract_features(payloads)


# ------------------------------------------------------ frame sampling

SAMPLE_EVERY = 4  # keep every 4th frame

SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_off", LongType()),
        StructField("frame_len", LongType()),
    ]
)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every: int = SAMPLE_EVERY,
) -> DataFrame:
    """Frame sampling over a binary column: one output row per kept
    frame (every ``every``-th FRAME_BYTES-wide slice, trailing partial
    frame included). The mapInPandas stage SLICES THE REAL BYTES and
    reports the slice's true length — the decode of the slice is the
    stubbed step, the addressing/explode plumbing is not.

    At 100 TB this is the fan-out stage ahead of a (real) per-frame
    decoder: payload bytes never shuffle (rows explode in place), and
    the output is narrow typed rows sized ~n_frames/every per doc."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens = [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                bl = len(payload)
                n_total = (bl + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_total, every):
                    frame = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    ids.append(int(did))
                    idxs.append(i)
                    offs.append(i * FRAME_BYTES)
                    lens.append(len(frame))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_off": pd.Series(offs, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_sample, SAMPLE_SCHEMA)


@query(
    "media_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(i AS BIGINT) AS frame_idx,
           CAST(i * {FRAME_BYTES} AS BIGINT) AS frame_off,
           CAST(LEAST({FRAME_BYTES}, bl - i * {FRAME_BYTES}) AS BIGINT)
             AS frame_len
    FROM (
      SELECT doc_id, bl,
             unnest(range(0, CAST((bl + {FRAME_BYTES} - 1) // {FRAME_BYTES}
                                  AS BIGINT), {SAMPLE_EVERY})) AS i
      FROM (SELECT doc_id, octet_length(encode(text)) AS bl FROM documents)
    )
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling over the encoded documents payloads
    (standing in for video bytes): the oracle recomputes the frame
    addressing arithmetic in SQL, proving the mapInPandas explode
    addresses exactly the bytes it claims to."""
    t = load_tables(spark, sf_dir, ("documents",))
    payloads = t["documents"].select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return sample_frames(payloads)


# --------------------------------------------- perceptual-hash near-dup

# dHash geometry: an (GRID x GRID+1) brightness grid differenced along
# rows gives GRID*GRID bits — 8x8 -> 64-bit signature, the standard
# perceptual-hash size.
PHASH_GRID = 8


def phash64(payload: bytes) -> int:
    """Pure-Python reference difference-hash for one payload (the test
    pin; the distributed path below is the vectorized twin).

    Real dHash resizes the decoded image to a (GRID+1) x GRID grayscale
    grid and sets bit (r, c) when cell (r, c+1) is brighter than
    (r, c). The decode-to-grayscale step is the STUB here (no image
    libs in this container): the payload bytes are blocked into
    GRID*(GRID+1) equal slices whose mean byte value stands in for
    cell brightness. The blocking, differencing, banding and join
    machinery — everything a real deployment keeps when it swaps in a
    library decode — operates on the REAL bytes."""
    n_cells = PHASH_GRID * (PHASH_GRID + 1)
    n = len(payload)
    means = []
    for i in range(n_cells):
        block = payload[i * n // n_cells : (i + 1) * n // n_cells]
        means.append(sum(block) / len(block) if block else 0.0)
    sig = 0
    for r in range(PHASH_GRID):
        for c in range(PHASH_GRID):
            if means[r * (PHASH_GRID + 1) + c + 1] > means[r * (PHASH_GRID + 1) + c]:
                sig |= 1 << (r * PHASH_GRID + c)
    # int64 wraparound: bit 63 makes the signature negative, which the
    # band extraction handles via shiftrightunsigned
    return sig - (1 << 64) if sig >= 1 << 63 else sig


def _phash_batch(payloads) -> "pd.Series":
    """Vectorized difference-hash over one Arrow batch: per payload,
    np.add.reduceat computes the block means in one pass (O(bytes)),
    then the 64 difference bits assemble without a Python per-bit
    loop over rows."""
    import numpy as np

    n_cells = PHASH_GRID * (PHASH_GRID + 1)
    out = np.zeros(len(payloads), dtype=np.uint64)
    for row, payload in enumerate(payloads):
        n = len(payload) if payload is not None else 0
        if n == 0:
            continue
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        starts = (np.arange(n_cells, dtype=np.int64) * n) // n_cells
        widths = np.diff(np.append(starts, n)).astype(np.float64)
        sums = np.add.reduceat(arr, np.minimum(starts, n - 1))
        means = np.where(widths > 0, sums / np.maximum(widths, 1), 0.0)
        grid = means.reshape(PHASH_GRID, PHASH_GRID + 1)
        bits = (grid[:, 1:] > grid[:, :-1]).reshape(-1)
        out[row] = np.packbits(bits[::-1]).view(">u8")[0]
    return pd.Series(out.view(np.int64))


_phash_udf = None


def _get_phash_udf():
    global _phash_udf
    if _phash_udf is None:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf(LongType())
        def _udf(payload: pd.Series) -> pd.Series:
            return _phash_batch(payload)

        _phash_udf = _udf
    return _phash_udf


@query("dedup_phash")  # hash-function specific -> rows-only check
def dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup via perceptual hash: blockwise difference-hash
    over the binary payloads (Arrow-batched pandas UDF) -> 16-bit band
    join (pigeonhole guarantees recall at hamming<=3) -> exact hamming
    verify via bit_count(xor). Reuses the SimHash banding machinery
    (hamming_band_pairs) — the signature source is the only new part.

    Scale shape: one narrow map computes 8 bytes per image, payload
    bytes never shuffle; candidate generation is a capped bucket join,
    never all-pairs. At 100 TB of images only the 64-bit signatures
    flow into the join.

    On the text-as-bytes stand-in corpus this typically finds only
    byte-identical payloads: dHash is positionally sensitive (the
    right behavior for images, where near-dups are re-encodes of the
    same pixel grid), while the synthetic documents' near-dups are
    text EDITS that shift every subsequent byte (measured hamming
    19-37 across minhash-confirmed near-dup pairs — correctly above
    threshold). Recall/soundness semantics are pinned in
    test_approx_quality.py on synthetic near-identical payloads."""
    from sql_flow_spark.functions.dedup import hamming_band_pairs

    t = load_tables(spark, sf_dir, ("documents",))
    sigs = t["documents"].select(
        "doc_id",
        _get_phash_udf()(F.encode("text", "utf-8")).alias("sig"),
    )
    return hamming_band_pairs(sigs)
