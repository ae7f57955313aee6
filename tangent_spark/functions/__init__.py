"""Scalar / text functions: tokenizers, Porter stemmer, text statistics.

These are the engine's documented UDF surface (SURVEY.md §2.7): the
pure-Python versions double as the oracle implementations in tests.
"""
