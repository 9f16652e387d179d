"""Distributed operators: bloom/cuckoo seen-sets, frontier politeness,
dedup/clustering, similarity, multimodal and sequence packing."""
