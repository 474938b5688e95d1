"""Scalar function surface (text tokenization, vector math).

All built on pyspark.sql.functions so expressions stay inside
whole-stage codegen — no Python UDFs in any hot path.
"""
