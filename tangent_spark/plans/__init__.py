"""Query/build plans: index construction, BM25 search, formula rerank."""
