"""Structured Streaming operators (incremental refresh, windowed rollups)."""
