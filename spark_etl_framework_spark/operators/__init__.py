"""Operator library: reusable DataFrame → DataFrame transformations.

Reference-parity operators (SQL transform, validators, partitioner — SURVEY.md
§2.A) live beside the large-scale training-data-pipeline operators (dedup,
similarity, text analysis, multimodal) that the reference lacks. Everything is
built on pyspark.sql built-ins (JVM codegen) — Python UDFs appear only where
semantics genuinely require them (COMP-3 decode, multimodal decode stubs).
"""
