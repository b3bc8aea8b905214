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
