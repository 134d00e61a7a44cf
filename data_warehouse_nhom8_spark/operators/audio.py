"""Audio column support (SURVEY.md §2k X4 — the audio face of the
multimodal pipeline).

Real pure-python/numpy WAV (RIFF/PCM) codec — no external audio libs
exist in this environment, but PCM WAV needs none: the container is a
RIFF chunk walk and the samples are raw integers. Decoder handles
8-bit unsigned / 16-bit signed LE PCM, any channel count and rate,
and skips unknown chunks (LIST/fact/cue — real-world WAVs carry
them). The encoder is the fixture twin (tests generate every decoder
path). Non-PCM (float, ADPCM, mu-law) raises NotImplementedError;
malformed containers raise ValueError — same contract as the image
codecs.

Features are the standard cheap acoustic descriptors a corpus
pipeline filters on: duration, RMS loudness, peak, zero-crossing
rate, and dominant frequency (rFFT over a bounded window — compute
per item stays O(64k) regardless of clip length).

Spark shape: Arrow-batched `mapInPandas` over the binary payload
column, exactly like the image featurizer (`operators.multimodal`);
compute-per-byte-heavy, so the input is repartitioned to full-core
parallelism first. Metadata-only queries never touch the payload
(columnar pruning).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_ms long, rms double, peak double, zcr_hz double, "
    "dominant_hz double"
)


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Encode float samples in [-1, 1] (shape (n,) or (n, channels))
    as a PCM WAV. bits ∈ {8, 16}: 8-bit is unsigned (the WAV
    convention), 16-bit signed little-endian."""
    arr = np.asarray(samples, np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    clipped = np.clip(arr, -1.0, 1.0)
    if bits == 16:
        pcm = np.round(clipped * 32767.0).astype("<i2").tobytes()
    elif bits == 8:
        pcm = (np.round(clipped * 127.0) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    block = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * block, block, bits
    )  # PCM, channels, rate, byterate, blockalign, bits
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV to (float64 samples in [-1, 1] of shape
    (n, channels), sample_rate). Unknown chunks are skipped; a
    missing fmt/data chunk or a non-PCM format tag fails loud."""
    d = payload
    if len(d) < 12 or d[:4] != b"RIFF" or d[8:12] != b"WAVE":
        raise ValueError("not a WAV (missing RIFF/WAVE header)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(d):
        cid = d[pos : pos + 4]
        (ln,) = struct.unpack("<I", d[pos + 4 : pos + 8])
        body = d[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError("malformed WAV: short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("malformed WAV: missing fmt or data chunk")
    tag, ch, rate, _br, _ba, bits = fmt
    if tag != 1:
        raise NotImplementedError(f"non-PCM WAV (format tag {tag})")
    if bits == 16:
        raw = np.frombuffer(data, "<i2")
        vals = raw.astype(np.float64) / 32767.0
    elif bits == 8:
        raw = np.frombuffer(data, np.uint8)
        vals = (raw.astype(np.float64) - 128.0) / 127.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    if ch < 1:
        raise ValueError("malformed WAV: zero channels")
    n = len(vals) // ch
    return vals[: n * ch].reshape(n, ch), rate


def wav_features(payload: bytes, fft_window: int = 65536) -> dict:
    """Acoustic descriptors of one clip. Dominant frequency comes from
    an rFFT over at most `fft_window` samples of the mono mix (DC
    excluded), so per-item compute is bounded no matter the length."""
    samples, rate = decode_wav(payload)
    mono = samples.mean(axis=1)
    n = len(mono)
    if n == 0:
        return {
            "sample_rate": rate, "n_channels": samples.shape[1],
            "n_samples": 0, "duration_ms": 0, "rms": 0.0, "peak": 0.0,
            "zcr_hz": 0.0, "dominant_hz": 0.0,
        }
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.abs(mono).max())
    crossings = int(np.count_nonzero(np.diff(np.signbit(mono))))
    zcr_hz = crossings / (n / rate) / 2.0  # crossings-per-period pairs
    win = mono[: min(n, fft_window)]
    spec = np.abs(np.fft.rfft(win))
    spec[0] = 0.0  # DC is not a pitch
    dominant = float(np.argmax(spec) * rate / len(win)) if len(win) > 1 else 0.0
    return {
        "sample_rate": rate,
        "n_channels": samples.shape[1],
        "n_samples": n,
        "duration_ms": int(round(1000.0 * n / rate)),
        "rms": rms,
        "peak": peak,
        "zcr_hz": zcr_hz,
        "dominant_hz": dominant,
    }


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Distributed audio featurization over MEDIA_SCHEMA rows with
    kind == 'audio': Arrow-batched mapInPandas, one feature row per
    clip. Null payloads are dropped (no silent fake features)."""
    from pyspark.sql import functions as F

    from data_warehouse_nhom8_spark.session import repartition_for_compute

    audio = repartition_for_compute(
        df.filter(F.col("kind") == "audio").select("media_id", "payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                rows.append({"media_id": mid, **wav_features(bytes(payload))})
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_channels", "n_samples",
                    "duration_ms", "rms", "peak", "zcr_hz", "dominant_hz",
                ],
            )

    return audio.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)
