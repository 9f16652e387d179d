"""Crawl-wave planner and the single-process oracle crawler."""
