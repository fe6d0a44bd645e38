"""Multimodal column plumbing: opaque binary media + typed metadata.

North-star surface for a training-data pipeline: image/audio/video
travel as ``binary`` columns with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas``.

The real decode step needs codec libraries (PIL / ffmpeg / torchaudio)
that are NOT in this environment — it is stubbed behind an import-try
with a clearly-marked NotImplementedError, and a deterministic fake
decoder stands in so the Spark-side plumbing (schema, partitioning,
UDF signature, Arrow batch shape) is real and tested end-to-end.

Scale notes: media bytes never pass through a Python row loop — they
move as Arrow buffers batch-at-a-time; feature extraction is
embarrassingly parallel (no shuffle); downstream joins happen on the
small extracted-feature table, not the media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import fan_out, load_table

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "head_hex string, byte_mean double, width int, height int"
)

try:  # real image decoding is unavailable in this environment
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def decode_image(data: bytes) -> tuple[int, int]:
    """Decode media bytes to (width, height).

    With PIL installed this is the real decode; payloads PIL cannot
    parse (this container's synthetic media is text bytes) fall through
    to the deterministic fake, which derives a plausible size from the
    byte length so downstream plumbing is exercised with stable values
    either way.  Real audio/video would swap in ffmpeg/torchaudio here
    — the Arrow-batched plumbing around this function doesn't change.
    """
    if _HAVE_PIL:
        import io

        try:
            with PIL.Image.open(io.BytesIO(data)) as img:
                return img.size
        except Exception:  # noqa: BLE001 — undecodable payload -> fake
            pass
    # deterministic fake: pretend 64-pixel rows of 3-byte pixels
    w = max(1, min(1024, len(data) // 64))
    h = max(1, len(data) // max(1, 3 * w))
    return w, h


def make_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table: documents' text bytes as the opaque
    payload (binary), with typed metadata — the schema a real pipeline
    would carry for images/audio."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("media"),
        F.lit("text/plain;fake-image").alias("media_type"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").alias("orig_size"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    One mapInPandas pass: per batch, vectorized byte stats + (stubbed)
    decode.  Output is a narrow typed feature table.
    """
    from ..session import ensure_package_on_executors

    # the closure references module-level decode_image (pickled by
    # reference) — ship the package for foreign-cwd driver processes.
    ensure_package_on_executors(media.sparkSession)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media_bytes = pdf["media"]
            wh = [decode_image(b) for b in media_bytes]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(b) for b in media_bytes],
                    "head_hex": [b[:8].hex().upper() for b in media_bytes],
                    "byte_mean": [
                        (sum(b) / len(b)) if len(b) else 0.0 for b in media_bytes
                    ],
                    "width": [w for w, _ in wh],
                    "height": [h for _, h in wh],
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable slice of the feature extraction: byte length and
    head bytes are engine-independent facts about the payload (the
    decode-dependent width/height stay Spark-side, rows-only)."""
    feats = extract_features(make_media_table(spark, sf_dir))
    return feats.select("doc_id", "n_bytes", "head_hex")


RESIZED_SCHEMA = "doc_id long, media binary, width int, height int"


def resize_media(media: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Resize pass over binary media — the bytes-in/bytes-out transform
    shape (same plumbing a real thumbnailer would use).

    Arrow-batched mapInPandas: payloads stay in Arrow buffers, one batch
    per call, no shuffle (embarrassingly parallel like all per-media
    transforms).  STUB resample: real pixel resampling needs PIL/ffmpeg
    (absent here; see ``decode_image``) — the deterministic fake strides
    the payload down to ``3 * target_w * target_h`` bytes so output
    sizes, schema, and batch shape are real and testable.
    """
    from ..session import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)
    n_out = 3 * target_w * target_h

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf["media"]:
                if len(b) <= n_out:
                    out.append(bytes(b))
                else:
                    step = len(b) // n_out
                    out.append(bytes(b[:: step])[:n_out])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": out,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 100) -> DataFrame:
    """Frame-sampling stand-in: emit one row per sampled offset of each
    media payload (1→N, the video-frame explode shape), entirely via
    built-in functions — no Python in the hot path."""
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.octet_length("media") - 1, F.lit(0)), F.lit(every_n_bytes))
        ).alias("frame_offset"),
    )


# Audio analysis-window geometry: 256-sample windows at 50% overlap —
# the standard STFT framing a real feature extractor (torchaudio /
# librosa) uses; only the per-window transform is stubbed.
AUDIO_WINDOW = 256
AUDIO_HOP = 128


def audio_windows(media: DataFrame) -> DataFrame:
    """Audio-modality plumbing: payload bytes → int16-LE PCM (the
    deterministic fake decode — torchaudio/ffmpeg would decode real
    containers here, the Arrow plumbing is unchanged) → hop-windowed
    RMS energy per analysis window, the 1→N explode shape every
    spectral feature pipeline starts with.

    Scale: one mapInPandas pass, windows computed vectorized in numpy
    per Arrow batch; output rows are |samples|/HOP per doc — linear in
    payload bytes, no shuffle at all (the window explode happens
    map-side inside the UDF).  Trailing partial windows are dropped,
    mirroring standard STFT center=False framing.  Verified against a
    pure-numpy reference in tests/test_multimodal.py.
    """
    from ..session import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)

    def _win(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out_doc, out_idx, out_rms = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                pcm = np.frombuffer(
                    payload[: len(payload) // 2 * 2], dtype="<i2"
                ).astype(np.float64)
                n_win = (
                    (len(pcm) - AUDIO_WINDOW) // AUDIO_HOP + 1
                    if len(pcm) >= AUDIO_WINDOW
                    else 0
                )
                for w in range(n_win):
                    seg = pcm[w * AUDIO_HOP : w * AUDIO_HOP + AUDIO_WINDOW]
                    out_doc.append(doc_id)
                    out_idx.append(w)
                    out_rms.append(round(float(np.sqrt(np.mean(seg * seg))), 6))
            yield pd.DataFrame(
                {"doc_id": out_doc, "win_idx": out_idx, "rms": out_rms}
            )

    return media.mapInPandas(
        _win, schema="doc_id long, win_idx long, rms double"
    )


def audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: hop-windowed RMS energy over the media table's
    payloads (see audio_windows)."""
    return audio_windows(make_media_table(spark, sf_dir))
