"""File/binary ingestion and catalog listing connectors."""
