"""LLM-training-data pipeline operators (beyond-reference surface,
BASELINE.json north_star): deduplication, similarity search, text analysis,
multimodal column plumbing.

Design rule: everything that can be a built-in Spark SQL expression IS one —
whole-stage-codegen'd, Arrow-free, and bit-reproducible against the DuckDB
oracle.  Python UDFs appear only where semantics genuinely need them
(multimodal decode stubs).
"""
