"""Multimodal-column plumbing (BASELINE.json north star: treat image/audio/
video as opaque `binary` columns with typed metadata; decode/feature-extract
as Pandas UDFs over Arrow batches).

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub (`decode_image` raises NotImplementedError; the
deterministic fake from `make_fake_decoder` stands in), while everything
Spark-side is real and tested: the binary column itself (`encode(text)` —
real bytes), the schema, the `mapInPandas` Arrow batch shape, and the
partition-parallel execution.

`multimodal_decode_features` is oracle-checked: the fake features (byte
count, first byte, byte checksum) are recomputed by DuckDB from the text's
ASCII codes — an independent check that the Pandas-UDF path transforms every
byte of every row correctly.

Scale notes: mapInPandas streams Arrow record batches per partition —
constant memory per task regardless of corpus size; binary payloads never
hit the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_toolbox_spark.session import load_table

FEATURE_SCHEMA = "doc_id bigint, n_bytes int, first_byte int, checksum bigint"


def decode_image(payload: bytes) -> object:
    """Real decode hook — requires an image library not present in this
    container. The Spark-side plumbing (schema/batching/partitioning) is
    exercised through `make_fake_decoder` instead."""
    raise NotImplementedError(
        "image/audio decode requires PIL/ffmpeg; not available in this "
        "environment — plug a real decoder in here"
    )


def make_fake_decoder():
    """Deterministic stand-in for decode+feature-extract: byte-level stats
    computed from the binary payload (vectorized per Arrow batch).

    Returned as a locally-defined function so cloudpickle serializes it BY
    VALUE — module-level functions pickle by reference and would require
    this package on every Python worker's sys.path."""

    def fake_decode_features(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        payloads = pdf["payload"]
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": payloads.map(len).astype("int32"),
                "first_byte": payloads.map(
                    lambda b: b[0] if len(b) else -1
                ).astype("int32"),
                "checksum": payloads.map(
                    lambda b: int(np.frombuffer(b, dtype=np.uint8).sum()) % 65536
                ).astype("int64"),
            }
        )

    return fake_decode_features


def with_binary_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal table shape: (doc_id, payload binary, metadata)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary → features through mapInPandas (the real multimodal path)."""
    binary = with_binary_payload(spark, sf_dir).select("doc_id", "payload")
    decode = make_fake_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode(pdf)

    return binary.mapInPandas(run, schema=FEATURE_SCHEMA).orderBy("doc_id")


def binary_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata aggregation over the binary column, per source —
    pure JVM-side (octet_length on binary), no Python."""
    return (
        with_binary_payload(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.min(F.octet_length("payload")).alias("min_bytes"),
            F.max(F.octet_length("payload")).alias("max_bytes"),
        )
        .orderBy("source")
    )


def frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for chunked payloads (video-style): split the
    payload into 32-byte frames, keep every 4th — pure SQL projection
    (sequence/transform), no Python, no shuffle."""
    load_table(spark, sf_dir, "documents")
    return spark.sql("""
        WITH b AS (
            SELECT doc_id, octet_length(encode(text, 'UTF-8')) AS n_bytes
            FROM documents
        )
        SELECT doc_id, frame_idx,
               least(32, n_bytes - (frame_idx - 1) * 32) AS frame_len
        FROM b
        LATERAL VIEW explode(
            filter(sequence(1, CAST(ceil(n_bytes / 32e0) AS INT)),
                   i -> (i - 1) % 4 = 0)
        ) AS frame_idx
        ORDER BY doc_id, frame_idx
    """)


QUERIES = {
    "multimodal_decode_features": multimodal_decode_features,
    "binary_meta_stats": binary_meta_stats,
    "frame_samples": frame_samples,
}

ORACLE = {
    # independent byte-level recomputation from ASCII codes (text is ASCII)
    "multimodal_decode_features": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               ascii(substr(text, 1, 1))               AS first_byte,
               CAST(list_aggregate(list_transform(range(1, length(text) + 1),
                        i -> ascii(substr(text, i, 1))), 'sum') % 65536
                    AS BIGINT)                         AS checksum
        FROM documents ORDER BY doc_id
    """,
    "binary_meta_stats": """
        SELECT source,
               count(*)                                   AS n_docs,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(min(octet_length(encode(text))) AS INT)    AS min_bytes,
               CAST(max(octet_length(encode(text))) AS INT)    AS max_bytes
        FROM documents GROUP BY source ORDER BY source
    """,
    "frame_samples": """
        WITH b AS (
            SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes
            FROM documents
        )
        SELECT doc_id, CAST(f.frame_idx AS INT) AS frame_idx,
               least(32, n_bytes - (f.frame_idx - 1) * 32) AS frame_len
        FROM b, LATERAL (
            SELECT unnest(list_filter(range(1, CAST(ceil(n_bytes / 32e0) AS INT) + 1),
                          i -> (i - 1) % 4 = 0)) AS frame_idx
        ) f
        ORDER BY doc_id, frame_idx
    """,
}
