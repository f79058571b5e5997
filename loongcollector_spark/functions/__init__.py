"""Scalar + training-data functions.

Beyond the reference's operator set, these are the operations a large-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal plumbing) — built Spark-first: JVM column expressions where
possible, Arrow-vectorized pandas UDFs where not, never per-row Python.
"""
