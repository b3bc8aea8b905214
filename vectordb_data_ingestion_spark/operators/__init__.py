"""DataFrame -> DataFrame operators (catalog, dedup, similarity, text
analysis, chunk/enrich pipeline)."""
