"""Distributed operators: bloom/cuckoo seen-sets, frontier politeness,
dedup and similarity."""
