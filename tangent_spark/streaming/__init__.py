"""Structured-Streaming wrappers: incremental index append."""
