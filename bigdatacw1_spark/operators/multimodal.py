"""Multimodal column plumbing (north-star extension, SURVEY.md §2.11).

Media (image/audio/video) are opaque ``binary`` columns plus a typed
metadata struct. The Spark-side plumbing — schemas, partition-sized Arrow
batches through ``mapInPandas``, deterministic pass-through of keys — is
real and tested; the actual codec step is STUBBED (decode libraries are
not in this container): ``decode_image`` raises NotImplementedError, and
``fake_features`` is the deterministic stand-in used by tests so the
batch shape, schema, and partitioning behavior are exercised end to end.

Scale notes: mapInPandas streams Arrow record batches (no per-row Python
cost, bounded memory via spark.sql.execution.arrow.maxRecordsPerBatch);
feature extraction parallelizes per input partition — repartition by a
key (e.g. doc_id) upstream if the source files skew.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pandas only needed executor-side inside the UDF
    import pandas as pd

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize an opaque binary column + typed metadata from a source
    column — the ingestion shape for media tables. (Here the payload is
    the utf-8 encoded text; for real media it would be the file bytes
    loaded via ``spark.read.format('binaryFile')``.)"""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("media_meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real codec step — STUB. Image/audio decode libraries are not
    available in this environment; at deployment, swap in PIL/ffmpeg/etc.
    The Spark plumbing around this function is real and tested."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this environment"
    )


def _fake_feature_vec(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: simple
    byte statistics, stable across runs/partitions."""
    n = len(payload)
    if n == 0:
        return [0.0] * dim
    step = max(1, n // dim)
    feats = []
    for i in range(dim):
        chunk = payload[i * step : (i + 1) * step] or payload[-step:]
        feats.append(round(sum(chunk) / (255.0 * max(1, len(chunk))), 6))
    return feats


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame; the
    output iterator yields frames matching FEATURE_SCHEMA. This is the
    (b)-tier custom-operator pattern from the build contract — used when
    no built-in expression can express the computation."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # executor-side import

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": pdf["payload"].map(lambda b: _fake_feature_vec(bytes(b), dim)),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)
