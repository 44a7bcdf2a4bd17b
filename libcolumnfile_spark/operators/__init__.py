"""Operator library: LLM-training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) built Spark-first —
Catalyst expressions in the hot path, Arrow-batched pandas UDFs only where
built-ins can't express the semantics.
"""
