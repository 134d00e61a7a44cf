"""Multimodal column support (SURVEY.md §2k X4).

Images/audio/video are opaque BinaryType payloads with a typed
metadata struct; compute-heavy per-item work (decode, resize,
feature-extract, frame-sample) runs as Arrow-batched `mapInPandas`
over the binary column. `resize_images` carries a real pure-python
codec for the formats decodable without external libraries (binary
PPM, uncompressed BMP); compressed formats raise until PIL/opencv is
plugged into `_decode_image`. The featurizer and frame sampler use
deterministic fakes (clearly marked below) since no audio/video
codec exists in this environment — the distributed pipeline (schema
in → batches → schema out) is fully real and tested either way.

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


def _decode_image(payload: bytes):
    """Decode an uncompressed image payload to an (h, w, 3) uint8 array.

    Pure-Python/numpy codec for the two formats decodable without an
    external image library: binary PPM (P6) and 24/32-bit uncompressed
    BMP. Compressed formats (PNG/JPEG/...) need a real codec (PIL /
    opencv) and raise NotImplementedError — the distributed shape
    around this function does not change when one is plugged in."""
    import numpy as np

    if payload.startswith(b"P6"):
        # P6 header: magic, whitespace-separated width/height/maxval
        # with optional '#' comment lines, then a single whitespace
        # byte before the raw RGB triples.
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                pos = payload.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = fields
        if maxval > 255:
            raise NotImplementedError("16-bit PPM not supported")
        return np.frombuffer(payload, np.uint8, h * w * 3, pos).reshape(h, w, 3)
    if payload.startswith(b"BM"):
        off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if compression != 0 or bpp not in (24, 32):
            raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
        nch = bpp // 8
        stride = (w * nch + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(payload, np.uint8, abs(h) * stride, off)
        rows = rows.reshape(abs(h), stride)[:, : w * nch].reshape(abs(h), w, nch)
        bgr = rows if h < 0 else rows[::-1]  # positive height = bottom-up
        return bgr[:, :, 2::-1]  # BGR(A) -> RGB
    raise NotImplementedError(
        "compressed/unknown image format; plug PIL/opencv into _decode_image"
    )


def _encode_ppm(arr) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype("uint8").tobytes()


def _resize_nearest(arr, width: int, height: int):
    """Nearest-neighbor resample via numpy index maps (vectorized)."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return arr[ys[:, None], xs[None, :]]


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Distributed image resize over the binary payload column.

    Arrow-batched mapInPandas: decode (PPM/BMP pure-python codec, see
    `_decode_image`), nearest-neighbor resample to (width, height),
    re-encode as canonical binary PPM, and rewrite meta.width/height
    and meta.mime to match. Non-image rows and null payloads pass
    through untouched. Same 100 TB notes as `extract_features`:
    compute-per-byte-heavy, so repartition first rather than letting
    the input's split count cap Python-worker parallelism."""
    from data_warehouse_nhom8_spark.session import repartition_for_compute

    df = repartition_for_compute(df)

    def one(kind, payload, meta):
        if kind != "image" or payload is None:
            return payload, meta
        resized = _resize_nearest(_decode_image(bytes(payload)), width, height)
        meta = dict(meta or {})
        meta.update(mime="image/x-portable-pixmap", width=width, height=height)
        return _encode_ppm(resized), meta

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                one(k, p, m)
                for k, p, m in zip(pdf["kind"], pdf["payload"], pdf["meta"])
            ]
            pdf = pdf.assign(
                payload=pd.Series([p for p, _ in out], index=pdf.index, dtype=object),
                meta=pd.Series([m for _, m in out], index=pdf.index, dtype=object),
            )
            yield pdf

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
