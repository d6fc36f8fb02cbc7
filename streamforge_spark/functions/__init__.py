"""Scalar/column function library: text analysis, document dedup
signatures, vector similarity — the LLM-training-data-pipeline surface
(BASELINE.json north star). All pure column algebra / higher-order
functions; no Python UDFs in the hot path.
"""
