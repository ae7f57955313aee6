"""Custom operators: SLT parsing, pair-tuple expansion, dedup family,
similarity search, multimodal column plumbing."""
