"""Scalar function layer: pure-Python text normalization (shared by the
Spark UDFs and the test oracle), the posting-list codec, and the pandas/Arrow
UDF wrappers."""
