"""Vector-store sinks."""
