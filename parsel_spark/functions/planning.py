"""Shared planning helpers for iterative DataFrame loops."""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def static_planning(spark):
    """AQE OFF for the scope of an iterative loop's plan construction
    and its eager pins — the same rationale as
    ``CrawlRun._static_planning``: a fixed-round loop is a handful of
    DEPENDENT stages over known row counts with explicit partitioning,
    and AQE's per-stage shuffle materialization + driver replanning
    serializes them (measured ~1.3-1.5x wall on the pagerank and
    label-propagation loops at local[32]; values are unaffected — AQE
    never changes results).  Restores the previous setting on exit so
    surrounding queries keep their configuration."""
    conf = spark.conf
    prev = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        conf.set("spark.sql.adaptive.enabled", prev)
