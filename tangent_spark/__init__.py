"""tangent_spark — a PySpark-native full-text + math-formula index/search engine.

A from-scratch rebuild of the capabilities of Tangent 0.3.1
(openthinklabs/Tangent, reference at /root/reference) on idiomatic
Spark: DataFrame/SQL plans, vectorized pandas/Arrow UDFs, explicit
partitioning for the postings shuffle, delta-gap+varint compressed
posting lists with block-max metadata, BM25 (k1=1.2, b=0.75) top-k
with block-max pruning, and Tangent-style symbol-pair-tuple terms for
formula search.

Nothing here is a port: the reference is a single-node C++/Python
engine; see SURVEY.md for the operator-by-operator mapping.
"""

__version__ = "0.1.0"
