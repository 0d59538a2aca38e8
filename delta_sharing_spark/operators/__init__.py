"""Large-scale data-pipeline operators: deduplication, similarity search,
as-of joins, multimodal column plumbing.

These are the north-star additions beyond the reference's own surface
(BASELINE.json): each is built from DataFrame primitives (no Python UDFs in
hot paths) and designed around partitioning/shuffle behavior at 100 TB.
"""
