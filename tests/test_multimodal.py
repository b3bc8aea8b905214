"""Multimodal columns: binary payload plumbing + stubbed feature extraction."""

from pyspark.sql import functions as F

from vectordb_data_ingestion_spark.operators.multimodal import (
    FEATURE_DIM,
    documents_as_assets,
    extract_features,
)
from vectordb_data_ingestion_spark.session import load_tables
from tests.conftest import SF_SMALL


def test_assets_shape(spark):
    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    assets = documents_as_assets(docs)
    row = assets.filter(F.col("asset_id") == 3).collect()[0]
    assert row["modality"] == "image"  # 3 % 3 == 0 -> first entry
    assert bytes(row["content"]).decode("utf-8")  # payload is real bytes
    assert row["metadata"]["source"].startswith("src")


def test_extract_features_deterministic(spark):
    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"].limit(30)
    feats = extract_features(documents_as_assets(docs))
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert len(rows) == 30
    for r in rows.values():
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
        if r["modality"] in ("image", "video"):
            assert 64 <= r["width"] <= 255 and 64 <= r["height"] <= 255
        else:
            assert r["width"] is None
        if r["modality"] in ("audio", "video"):
            assert r["duration_ms"] >= 1000
    # rerun -> identical features (stub is deterministic)
    again = {r["asset_id"]: r["feature"] for r in
             extract_features(documents_as_assets(docs)).collect()}
    assert all(again[k] == rows[k]["feature"] for k in again)


def test_media_time_segments_cover_duration(spark):
    from vectordb_data_ingestion_spark.operators.multimodal import (
        media_time_segments,
    )

    feats = spark.createDataFrame(
        [
            (1, "audio", 12_000),
            (2, "video", 5_000),   # exactly one segment
            (3, "image", None),    # untimed -> excluded
        ],
        "asset_id long, modality string, duration_ms int",
    )
    rows = media_time_segments(feats, segment_ms=5000).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r)
    assert set(by_asset) == {1, 2}
    a1 = sorted(by_asset[1], key=lambda r: r["seg_idx"])
    assert [(r["start_ms"], r["end_ms"]) for r in a1] == [
        (0, 5000), (5000, 10000), (10000, 12000),
    ]
    assert [(r["start_ms"], r["end_ms"]) for r in by_asset[2]] == [(0, 5000)]


def test_sample_frames_midpoints(spark):
    from vectordb_data_ingestion_spark.operators.multimodal import sample_frames

    feats = spark.createDataFrame(
        [(1, "video", 8000), (2, "audio", 8000)],
        "asset_id long, modality string, duration_ms int",
    )
    rows = sample_frames(feats, n_frames=4).collect()
    assert all(r["asset_id"] == 1 for r in rows)  # audio excluded
    assert [r["frame_ts_ms"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [
        1000, 3000, 5000, 7000,
    ]


def test_media_sampling_prunes_content_column(spark):
    from tests.conftest import SF_SMALL
    from vectordb_data_ingestion_spark import queries_catalog as qc
    from vectordb_data_ingestion_spark.plans import scan_columns

    df = qc.SPARK_QUERIES["media_sampling_plan"](spark, SF_SMALL)
    # metadata-only plan: the documents scan must not read more than
    # (doc_id, text) — and text only because the fixture derives the
    # payload from it; a real asset table would scan metadata columns only
    assert all(set(c) <= {"doc_id", "text"} for c in scan_columns(df))
