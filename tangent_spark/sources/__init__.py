"""Sources & sinks: the parquet-backed index store, page-corpus reader,
and HTML text/math extraction UDFs."""
