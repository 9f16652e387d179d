"""Data sources: deterministic synthetic corpus, image codecs, and the
Iceberg-emulated snapshot catalog."""
