"""[EXT] Multimodal column support (BASELINE.json north star;
SURVEY.md §2.3).

Model: media payloads are opaque ``binary`` columns with a typed
metadata struct alongside (mime, n_bytes, checksum). Decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` — the Spark
plumbing (schema, batch iteration, partition-preserving map, no
shuffle) is real and tested; the actual image/audio decode is stubbed
(the decode libs are not in this container) behind
``NotImplementedError`` with a deterministic fake-feature fallback so
the pipeline shape is exercisable end-to-end.

At 100 TB: payloads live in parquet binary columns (or are pointers to
object-store blobs resolved inside the batch fn); ``mapInPandas`` keeps
them executor-local — no shuffle, no driver transfer — and Arrow moves
bytes zero-copy between JVM and Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_table

FEATURE_SCHEMA = "doc_id long, n_bytes int, first_byte int, checksum int"


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: encode the text as a binary payload
    plus a typed metadata struct — the schema shape real media columns
    use."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).alias("n_bytes"),
        ),
    )


def decode_media(payload: bytes, mime: str) -> bytes:
    """Real decode entry point — STUB: media codecs (PIL/ffmpeg/etc.)
    are not available in this environment."""
    raise NotImplementedError(
        f"media decode for {mime!r} requires codec libraries not present; "
        "extract_features uses the deterministic byte-level fallback"
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    Per batch (pandas DataFrame in/out — the real decode would replace
    the byte-level stats with codec output): n_bytes, first byte, and a
    mod-256 checksum. Deterministic, so the SQL oracle can verify the
    full mapInPandas plumbing."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "checksum": payloads.map(lambda b: int(sum(b)) % 256).astype("int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(_batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, thumb binary, thumb_w int, thumb_h int"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_byte int"


def resize_media(df: DataFrame, width: int = 8, height: int = 8, id_col: str = "doc_id") -> DataFrame:
    """Thumbnail/resize stage. STUB decode: the deterministic fake
    "thumbnail" is the first width×height payload bytes (a real
    implementation calls the codec inside the same batch fn). The
    Spark-side contract — binary in, binary out, partition-preserving,
    no shuffle — is the real thing."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "thumb": pdf["payload"].map(lambda b: bytes(b[:n])),
                    "thumb_w": width,
                    "thumb_h": height,
                }
            )

    return df.select(id_col, "payload").mapInPandas(_batches, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 50, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling stage (video analog): emit every Nth payload byte
    as a "frame" row — a 1→N batch output through mapInPandas, the shape
    a real frame extractor uses. Deterministic, so SQL-verifiable."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, vals = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                for frame_idx, pos in enumerate(range(0, len(payload), every_n)):
                    ids.append(doc_id)
                    idxs.append(frame_idx)
                    vals.append(payload[pos])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_byte": vals})

    return df.select(id_col, "payload").mapInPandas(_batches, FRAME_SCHEMA)


# --- driver-contract query forms -------------------------------------------


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata projection from the payload struct (pure JVM)."""
    docs = attach_payload(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )


ORACLE_META = """
SELECT doc_id, 'text/plain' AS mime, octet_length(encode(text)) AS n_bytes
FROM documents
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas byte-feature extraction — oracled in SQL, which
    verifies the Arrow batch path end-to-end."""
    docs = attach_payload(load_table(spark, sf_dir, "documents"))
    return extract_features(docs)


ORACLE_FEATURES = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       ascii(text[1]) AS first_byte,
       CAST(list_aggregate(list_transform(generate_series(1, length(text)),
                                          i -> ascii(text[i])), 'sum') % 256 AS INTEGER) AS checksum
FROM documents
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-50th-byte frame sampling through mapInPandas (1→N rows)."""
    docs = attach_payload(load_table(spark, sf_dir, "documents"))
    return sample_frames(docs, every_n=50)


ORACLE_FRAMES = """
SELECT doc_id,
       CAST(i AS INTEGER) AS frame_idx,
       ascii(text[i * 50 + 1]) AS frame_byte
FROM documents,
     LATERAL (SELECT unnest(generate_series(0, CAST(floor((length(text) - 1) / 50) AS BIGINT))) AS i)
"""


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
}

ORACLES = {
    "multimodal_meta": ORACLE_META,
    "multimodal_features": ORACLE_FEATURES,
    "multimodal_frame_sample": ORACLE_FRAMES,
}
