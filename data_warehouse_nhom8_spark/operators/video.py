"""Video column support (SURVEY.md §2k X4 — the video face of the
multimodal pipeline).

Real pure-python MJPEG-in-AVI container handling: an AVI is a RIFF
tree (hdrl with avih/strh/strf headers, a movi LIST of '..dc' frame
chunks, an optional idx1 index) and MJPEG frames are ordinary JPEG
payloads — which `operators.jpeg` already decodes, baseline AND
progressive. So the full chain DEMUX → FRAME-SAMPLE → DECODE →
FEATURIZE runs with no external libraries, replacing the metadata
stub (`multimodal.sample_frames`) with actual pixels. The muxer is
the fixture twin (tests build AVIs from encoder-generated JPEGs and
check the decoded frames bit-identically against the source images).

Non-MJPEG codecs raise NotImplementedError at demux (the fourCC is in
strh/strf); malformed containers raise ValueError.

Spark shape: demux+decode is compute-per-byte-heavy Arrow-batched
`mapInPandas` (the sanctioned vectorized-Python lane), one output row
per SAMPLED frame — the explode happens inside the worker, so a
1000-frame clip sampled at every_n=100 ships 10 rows, not 1000.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FRAME_FEATURE_SCHEMA = (
    "media_id long, frame_idx int, frame_ms long, width int, height int, "
    "luma_mean double, luma_std double"
)


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(jpeg_frames: list[bytes], fps: int, width: int, height: int) -> bytes:
    """Mux JPEG payloads into a minimal-but-well-formed MJPEG AVI
    (avih + vids strh/strf BITMAPINFOHEADER + movi 00dc chunks +
    idx1). The fixture twin of `demux_avi_mjpeg`."""
    if fps <= 0:
        raise ValueError("fps must be positive")
    n = len(jpeg_frames)
    usec = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec, 0, 0, 0x10, n, 0, 1, 0, width, height, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"MJPG"
        # flags, prio, lang, initialFrames, scale, rate, start, length,
        # suggestedBufferSize, quality, sampleSize
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0)
        + struct.pack("<HHHH", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_frames = b"".join(_chunk(b"00dc", f) for f in jpeg_frames)
    movi = _list(b"movi", movi_frames)
    # idx1: offsets are relative to the start of 'movi' (the kind tag)
    idx, off = b"", 4
    for f in jpeg_frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def demux_avi_mjpeg(payload: bytes) -> tuple[list[bytes], int, int, int]:
    """Parse an MJPEG AVI → (jpeg_frames, fps, width, height).
    Walks the RIFF tree; skips unknown chunks; verifies the video
    stream's codec is MJPG (anything else: NotImplementedError)."""
    d = payload
    if len(d) < 12 or d[:4] != b"RIFF" or d[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI header)")
    frames: list[bytes] = []
    fps = width = height = 0
    codec_seen = None

    def walk(pos: int, end: int) -> None:
        nonlocal fps, width, height, codec_seen
        while pos + 8 <= end:
            cid = d[pos : pos + 4]
            (ln,) = struct.unpack("<I", d[pos + 4 : pos + 8])
            body_start, body_end = pos + 8, pos + 8 + ln
            if body_end > len(d):
                raise ValueError("malformed AVI: chunk overruns container")
            if cid == b"LIST":
                walk(body_start + 4, body_end)
            elif cid == b"avih":
                vals = struct.unpack("<IIIIIIIIII", d[body_start : body_start + 40])
                if vals[0]:
                    fps = round(1_000_000 / vals[0])
                width, height = vals[8], vals[9]
            elif cid == b"strh":
                if d[body_start : body_start + 4] == b"vids":
                    codec_seen = d[body_start + 4 : body_start + 8]
            elif cid[2:4] == b"dc":
                frames.append(d[body_start:body_end])
            pos = body_end + (ln & 1)

    walk(12, len(d))
    if codec_seen is None:
        raise ValueError("malformed AVI: no video stream header")
    if codec_seen not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(f"AVI codec {codec_seen!r} (only MJPG)")
    if not frames:
        raise ValueError("malformed AVI: no frame chunks")
    return frames, fps, width, height


def sample_frames_decoded(df: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL frame sampling over MEDIA_SCHEMA rows with kind ==
    'video': demux the AVI, take every `every_n`-th frame, decode the
    JPEG (baseline or progressive) with `operators.jpeg`, and emit one
    feature row per sampled frame (luma statistics — the cheap
    quality/dup signals a video corpus pipeline filters on).

    Replaces the metadata-only stub for MJPEG/AVI payloads; other
    containers still need an external codec and fail loud."""
    from pyspark.sql import functions as F

    from data_warehouse_nhom8_spark.operators.jpeg import decode_jpeg
    from data_warehouse_nhom8_spark.session import repartition_for_compute

    vids = repartition_for_compute(
        df.filter(F.col("kind") == "video").select("media_id", "payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "frame_idx", "frame_ms", "width", "height",
            "luma_mean", "luma_std",
        ]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                frames, fps, _w, _h = demux_avi_mjpeg(bytes(payload))
                ms_per = 1000.0 / fps if fps else 0.0
                for i in range(0, len(frames), max(1, every_n)):
                    rgb = decode_jpeg(frames[i]).astype(np.float64)
                    luma = rgb @ [0.299, 0.587, 0.114]
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_ms": int(round(i * ms_per)),
                            "width": rgb.shape[1],
                            "height": rgb.shape[0],
                            "luma_mean": float(luma.mean()),
                            "luma_std": float(luma.std()),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return vids.mapInPandas(run, schema=FRAME_FEATURE_SCHEMA)
