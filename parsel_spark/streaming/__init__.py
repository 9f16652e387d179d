"""Structured Streaming variants of the crawl operators."""
