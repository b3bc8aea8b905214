"""Multimodal columns: opaque binary payloads + typed metadata.

Convention (schemas.MULTIMODAL_SCHEMA): one row per asset with
``content: binary`` as the only large column, ``modality`` discriminating
image/audio/video/text, and a string metadata map. Queries that never touch
``content`` stay cheap via column pruning; decode/feature-extraction runs in
Arrow-batched ``mapInPandas`` so payload bytes cross into Python once per
batch, not per row.

PNG/BMP/WAV payloads decode FOR REAL via the pure-stdlib decoders in
``operators/media_decode.py`` (r4: zlib inflate + scanline unfilter /
header+pixels / the stdlib wave module), yielding honest dims, duration,
and luminance-histogram / RMS-envelope features. Payloads of other
formats (jpeg, mp4, ...) fall back to the clearly-marked deterministic
stub (pseudo-features from the payload digest) until PIL/ffmpeg-class
decoders are importable; the Spark plumbing - schema, batch iteration,
fan-out of feature rows, partition behavior - is identical on every
path.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_data_ingestion_spark.operators.media_decode import decode_media

FEATURE_DIM = 8

FEATURE_SCHEMA = (
    "asset_id bigint, modality string, n_bytes int, "
    f"feature array<double>, width int, height int, duration_ms int"
)


def _stub_decode(content: bytes, modality: str) -> dict:
    """DETERMINISTIC STUB for image/audio/video decoding (the decode
    libraries are not installed here). Derives reproducible pseudo-features
    and dimensions from the payload digest so downstream plumbing is
    exercised with realistic shapes. Replace with PIL/ffmpeg decoders in a
    full environment."""
    digest = hashlib.sha256(content or b"").digest()
    feature = [digest[i] / 255.0 for i in range(FEATURE_DIM)]
    width = 64 + digest[8] % 192 if modality in ("image", "video") else None
    height = 64 + digest[9] % 192 if modality in ("image", "video") else None
    duration = (
        1000 + int.from_bytes(digest[10:12], "big") % 60000
        if modality in ("audio", "video")
        else None
    )
    return {
        "feature": feature,
        "width": width,
        "height": height,
        "duration_ms": duration,
    }


def extract_features(assets: DataFrame) -> DataFrame:
    """Decode + featurize binary assets (mapInPandas: one Python crossing
    per Arrow batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            # zip over the columns, not iterrows: decode is CPU-bound and
            # iterrows constructs a pandas Series per row (measurably slower
            # on wide Arrow batches)
            for asset_id, modality, content in zip(
                pdf["asset_id"], pdf["modality"], pdf["content"]
            ):
                payload = bytes(content) if content is not None else b""
                # r4: REAL stdlib decode for PNG/BMP/WAV payloads (magic
                # sniffed) — honest dims/duration + luminance-histogram /
                # RMS-envelope features; everything else keeps the stub
                try:
                    meta = decode_media(payload)
                except ValueError:
                    meta = None  # recognized magic, unsupported variant
                if meta is None:
                    meta = _stub_decode(payload, modality)
                out.append(
                    {
                        "asset_id": asset_id,
                        "modality": modality,
                        "n_bytes": len(payload),
                        **meta,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id",
                    "modality",
                    "n_bytes",
                    "feature",
                    "width",
                    "height",
                    "duration_ms",
                ],
            )

    return assets.select("asset_id", "modality", "content").mapInPandas(
        run, FEATURE_SCHEMA
    )


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Deterministic multimodal fixture: document text becomes the binary
    payload; modality cycles by doc_id."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3).cast("int") + 1,
    )
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.create_map(F.lit("source"), F.col("source")).alias("metadata"),
    )


def media_time_segments(
    features: DataFrame, segment_ms: int = 5000
) -> DataFrame:
    """Fixed-length time segments for timed media (audio/video): one row
    per ``segment_ms`` window — the chunking step before per-segment
    transcription/embedding. Pure array expressions over the metadata
    (``duration_ms``); the binary payload is never touched, so the plan is
    a narrow codegen'd projection that column-prunes content away."""
    timed = features.filter(
        F.col("duration_ms").isNotNull() & (F.col("duration_ms") > 0)
    )
    starts = F.sequence(
        F.lit(0), F.col("duration_ms") - 1, F.lit(segment_ms)
    )
    return timed.select(
        "asset_id",
        "modality",
        "duration_ms",
        F.posexplode(starts).alias("seg_idx", "start_ms"),
    ).select(
        "asset_id",
        "modality",
        "seg_idx",
        "start_ms",
        F.least(
            F.col("start_ms") + F.lit(segment_ms), F.col("duration_ms")
        ).alias("end_ms"),
    )


def sample_frames(features: DataFrame, n_frames: int = 4) -> DataFrame:
    """Uniform midpoint frame sampling for video: ``n_frames`` timestamps
    at ``duration * (2i+1) / (2n)`` — the deterministic frame-selection
    plan a clip-embedding pipeline feeds to the (environment-gated) frame
    decoder. Metadata-only, like :func:`media_time_segments`."""
    vids = features.filter(
        (F.col("modality") == "video") & F.col("duration_ms").isNotNull()
    )
    idxs = F.sequence(F.lit(0), F.lit(n_frames - 1))
    return vids.select(
        "asset_id",
        "modality",
        F.posexplode(idxs).alias("frame_idx", "__i"),
        "duration_ms",
    ).select(
        "asset_id",
        "modality",
        "frame_idx",
        F.floor(
            F.col("duration_ms") * (2 * F.col("__i") + 1) / F.lit(2 * n_frames)
        )
        .cast("long")
        .alias("frame_ts_ms"),
    )
