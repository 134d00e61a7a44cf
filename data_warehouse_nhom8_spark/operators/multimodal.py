"""Multimodal column support (SURVEY.md §2k X4).

Images/audio/video are opaque BinaryType payloads with a typed
metadata struct; compute-heavy per-item work (decode, resize,
feature-extract, frame-sample) runs as Arrow-batched `mapInPandas`
over the binary column — the Spark-side plumbing (schema,
partitioning, batch shape) is real; the codec itself is STUBBED
because image/audio libraries are not in this environment. Each stub
is a deterministic fake clearly marked below, so the distributed
pipeline (schema in → batches → schema out) is fully testable.

100 TB notes: binary payloads dominate row size → keep
`spark.sql.files.maxPartitionBytes` small enough that a batch of rows
fits executor memory; metadata-only queries must never read the
binary column (columnar pruning gives this for free — verified in
tests via the scan's ReadSchema).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("source_uri", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha1 string, feature array<float>"
)


def _fake_decode_features(payload: bytes, n: int = 8) -> list[float]:
    """DETERMINISTIC FAKE of a decoder+featurizer: derives n floats
    from the sha1 of the payload. Replace with a real codec (PIL /
    torchaudio / pyav) where available — the Spark plumbing around it
    does not change."""
    if payload is None:
        return [0.0] * n
    h = hashlib.sha1(payload).digest()
    return [b / 255.0 for b in h[:n]]


def extract_features(df: DataFrame, batch_feature_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Repartitions first: a codec is compute-per-byte-heavy, and the
    scan's task count (bounded by file/row-group splits) would
    otherwise cap how many Python workers run — one single-row-group
    input file means ONE Arrow worker no matter the cluster size."""
    from data_warehouse_nhom8_spark.session import repartition_for_compute

    df = repartition_for_compute(df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                    "sha1": pdf["payload"].map(
                        lambda p: "" if p is None else hashlib.sha1(p).hexdigest()
                    ),
                    "feature": pdf["payload"].map(
                        lambda p: _fake_decode_features(p, batch_feature_dim)
                    ),
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator — STUB. The mapInPandas shell is the real
    distributed shape; the codec raises until a real image library is
    wired in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "plug PIL/opencv into this mapInPandas body"
        )
        yield  # pragma: no cover

    return df.mapInPandas(run, schema=df.schema)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — STUB returning deterministic frame
    offsets from metadata only (no decode): one row per sampled
    offset. Real decoding plugs into the same explode-then-decode
    shape."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ms"))
    )


def metadata_profile(df: DataFrame) -> DataFrame:
    """Metadata-only rollup — must not touch `payload` (column-pruned
    scan; asserted in tests)."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.col("meta.width")).alias("max_width"),
        F.round(F.avg(F.coalesce(F.col("meta.duration_ms"), F.lit(0))), 2).alias(
            "avg_duration_ms"
        ),
    )
