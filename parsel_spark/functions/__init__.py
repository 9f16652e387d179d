"""Vectorized column functions: selector UDFs, URL canonicalization and
Spark-compatible hashing."""

from .canonical import canonicalize_udf, canonicalize_url, resolve_udf, resolve_url
from .hashing import murmur3_32, shard_of, xxhash64
from .sampling import hash_sample, hash_sample_strata, hash_split, unit_hash
from .robots import parse_robots_txt, robots_rules, robots_table_from_txt
from .udfs import (
    attrib_map,
    compile_css,
    css_getall,
    extract_images,
    extract_links,
    extract_struct,
    jmespath_getall,
    re_extract,
    select_getall,
    xpath_getall,
)

__all__ = [
    "canonicalize_url",
    "canonicalize_udf",
    "resolve_url",
    "resolve_udf",
    "murmur3_32",
    "unit_hash",
    "hash_sample",
    "hash_sample_strata",
    "hash_split",
    "xxhash64",
    "shard_of",
    "parse_robots_txt",
    "robots_rules",
    "robots_table_from_txt",
    "xpath_getall",
    "css_getall",
    "select_getall",
    "re_extract",
    "attrib_map",
    "jmespath_getall",
    "extract_struct",
    "extract_links",
    "extract_images",
    "compile_css",
]
