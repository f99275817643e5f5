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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def resize_media(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Binary→binary media transform (the resize shape): 1 row in, 1 row
    out, payload rewritten, metadata updated with the target dimensions.
    The codec is STUBBED deterministically (payload truncated/cycled to
    width*height bytes standing in for a decoded-resized-reencoded
    image); the Arrow batch plumbing and schema evolution are real."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        target = width * height

        def fake_resize(b: bytes) -> bytes:
            b = bytes(b)
            if not b:
                return bytes(target)
            reps = (target // len(b)) + 1
            return (b * reps)[:target]

        for pdf in it:
            out = pdf["payload"].map(fake_resize)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "media_meta": [
                        {"mime": "image/raw", "n_bytes": len(p), "width": width, "height": height}
                        for p in out
                    ],
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling (the 1→N video shape): each payload expands to
    ``n_frames`` output rows. The decode is STUBBED (payload split into
    equal chunks standing in for decoded frames); what is real — and what
    matters at scale — is the row-expanding mapInPandas plumbing: output
    cardinality is decided inside the UDF, batches stay Arrow-sized, and
    downstream operators see ordinary (doc_id, frame_idx) rows."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * step : (i + 1) * step] or b[-step:])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame_payload": frames}
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


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


EMBED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _stub_embedding_model(dim: int = 16):
    """Deterministic stand-in for an expensive-to-load embedding model:
    'loading' returns a callable mapping text → unit-normalized vector
    from md5 bytes. Real deployments load ONNX/torch weights here —
    seconds of cost, which is exactly what batch_embed amortizes."""
    import hashlib

    def embed(text: str) -> list[float]:
        h = hashlib.md5(text.encode()).digest()
        raw = [(h[i % 16] - 127.5) / 127.5 for i in range(dim)]
        norm = sum(x * x for x in raw) ** 0.5 or 1.0
        return [float(x / norm) for x in raw]

    return embed


def batch_embed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 16,
    model_loader=None,
    load_counter=None,
) -> DataFrame:
    """Batched model inference over documents — the pattern that turns
    'run an embedding model over 100 TB of text' into a Spark map stage:

      - the model loads ONCE per task (inside the mapInPandas iterator,
        before the batch loop), amortizing seconds of weight-loading
        across every Arrow batch that task processes — NOT once per
        batch, and never per row;
      - data flows as Arrow record batches sized by
        spark.sql.execution.arrow.maxRecordsPerBatch, so executor
        memory is bounded no matter the partition size;
      - output is ordinary (doc_id, embedding) rows feeding the
        similarity/dedup operators (operators/similarity.py) directly.

    ``model_loader`` defaults to the deterministic stub (md5-derived
    unit vectors); ``load_counter`` is a test hook (Spark accumulator)
    incremented once per model load.
    """
    loader = model_loader or (lambda: _stub_embedding_model(dim))

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        model = loader()  # once per task — the amortization point
        if load_counter is not None:
            load_counter.add(1)
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "embedding": pdf[text_col].map(model),
                }
            )

    return df.select(id_col, text_col).mapInPandas(batches, schema=EMBED_SCHEMA)
