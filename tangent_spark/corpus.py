"""Deterministic synthetic web-page corpus (FIXTURES.md §1).

Generates the exact input_hint shape: (url, warc_ts, html, text, lang).
Bit-for-bit reproducible from (n, seed) regardless of partitioning:
every row is a pure function of its row id (per-row random.Random
seeded from (seed, i)), no wall clock, no global RNG state.

A fixed fraction of pages embeds MathML formulas whose shapes model
the reference test corpus (fractions, scripts, radicals, matrices,
wildcards — /root/reference/tangent_code/tangent/testing/test_data).
`text` is stored as the extractor's own output so the per-url
byte-identity invariant is assertable end-to-end.
"""

from __future__ import annotations

import datetime as dt
import random
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from tangent_spark.sources.extract import extract_text

# Zipf-ish vocabulary: rank r gets weight 1/r.
_VOCAB = [
    "the", "of", "and", "to", "in", "is", "for", "with", "on", "as",
    "theorem", "proof", "matrix", "vector", "integral", "function", "prime",
    "graph", "algebra", "tensor", "limit", "series", "convergence", "norm",
    "measure", "topology", "group", "ring", "field", "ideal", "module",
    "spark", "index", "query", "search", "ranking", "partition", "shuffle",
    "posting", "compress", "block", "formula", "symbol", "layout", "tree",
    "crawl", "web", "page", "document", "corpus", "token", "stemming",
    "latency", "throughput", "scaling", "cluster", "executor", "driver",
    "gradient", "descent", "entropy", "kernel", "manifold", "operator",
]
_WEIGHTS = [1.0 / (r + 1) for r in range(len(_VOCAB))]
_LANGS = ["en"] * 17 + ["de", "id", "fr"]
_SYMS = ["x", "y", "z", "a", "b", "n", "k", "t", "u", "v"]
_OPS = ["+", "-", "=", "&lt;", "&gt;"]
_EPOCH = dt.datetime(2024, 1, 1)


def _mathml(rng: random.Random) -> str:
    """One deterministic MathML block; shapes modeled on the reference
    smoke corpus (fraction, sub/sup, sqrt, 2x2 matrix, plain run)."""
    s = lambda: rng.choice(_SYMS)
    n = lambda: str(rng.randint(0, 9))
    kind = rng.randrange(6)
    if kind == 0:
        return (
            f"<math><mfrac><mi>{s()}</mi><mrow><mi>{s()}</mi>"
            f"<mo>+</mo><mn>{n()}</mn></mrow></mfrac></math>"
        )
    if kind == 1:
        return (
            f"<math><mrow><msup><mi>{s()}</mi><mn>{n()}</mn></msup>"
            f"<mo>=</mo><mi>{s()}</mi></mrow></math>"
        )
    if kind == 2:
        return (
            f"<math><mrow><msub><mi>{s()}</mi><mn>{n()}</mn></msub>"
            f"<mo>+</mo><msqrt><mi>{s()}</mi></msqrt></mrow></math>"
        )
    if kind == 3:
        return (
            "<math><mrow><mo>(</mo><mtable>"
            f"<mtr><mtd><mi>{s()}</mi></mtd><mtd><mn>{n()}</mn></mtd></mtr>"
            f"<mtr><mtd><mn>{n()}</mn></mtd><mtd><mi>{s()}</mi></mtd></mtr>"
            "</mtable><mo>)</mo></mrow></math>"
        )
    if kind == 4:
        return (
            f"<math><mrow><munderover><mo>&#x2211;</mo><mrow><mi>{s()}</mi><mo>=</mo>"
            f"<mn>1</mn></mrow><mi>n</mi></munderover><msub><mi>{s()}</mi>"
            f"<mi>{s()}</mi></msub></mrow></math>"
        )
    return f"<math><mrow><mi>{s()}</mi><mo>{rng.choice(_OPS)}</mo><mn>{n()}</mn></mrow></math>"


def make_page(
    i: int, seed: int = 42, math_fraction: float = 0.3, page_scale: int = 1
) -> dict:
    """page_scale multiplies the word count (1 -> ~100 words, short
    synthetic snippets; 8 -> ~800 words, realistic web-page size for
    throughput benchmarks)."""
    rng = random.Random((seed << 34) ^ (i * 2654435761 % (1 << 61)))
    n_words = rng.randint(20, 160) * page_scale
    words = rng.choices(_VOCAB, weights=_WEIGHTS, k=n_words)
    # sentences of 6-14 words
    parts, j = [], 0
    while j < n_words:
        ln = rng.randint(6, 14)
        parts.append(" ".join(words[j : j + ln]).capitalize() + ".")
        j += ln
    paras = [" ".join(parts[p::3]) for p in range(min(3, len(parts)))]
    maths = (
        [_mathml(rng) for _ in range(rng.randint(1, 4))]
        if rng.random() < math_fraction
        else []
    )
    body = []
    for pi, p in enumerate(paras):
        if p:
            body.append(f"<p>{p}</p>")
        if pi < len(maths):
            body.append(maths[pi])
    if len(maths) > len(paras):
        body.extend(maths[len(paras):])
    html = (
        f"<html><head><title>Doc {i} &amp; friends</title>"
        "<style>body { font: serif }</style>"
        "<script>var skip_me = 1 < 2;</script></head>"
        f"<body><h1>Document {i}</h1>" + "".join(body) +
        "<!-- boilerplate --></body></html>"
    )
    return {
        "url": f"https://example.org/{i:08d}",
        "warc_ts": _EPOCH + dt.timedelta(seconds=(i * 137) % 31_536_000),
        "html": html.encode("utf-8"),
        "text": extract_text(html),
        "lang": _LANGS[rng.randrange(len(_LANGS))],
    }


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def generate_pages(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    math_fraction: float = 0.3,
    partitions: int | None = None,
    page_scale: int = 1,
) -> DataFrame:
    """Distributed deterministic generation: spark.range -> mapInPandas."""
    mf = math_fraction
    ps = page_scale

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([make_page(int(i), seed, mf, ps) for i in pdf["id"]])

    rng_df = spark.range(n, numPartitions=partitions)
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


def pages_with_doc_ids(pages: DataFrame, partitions: int | None = None) -> DataFrame:
    """Assign deterministic dense doc ids = global rank of url
    (reference assigns ids by doc_list line order, index.py:156-175;
    url sort order is our deterministic equivalent). See
    functions/ids.dense_ids for why this is partitioning-independent."""
    from tangent_spark.functions.ids import dense_ids

    return dense_ids(pages, "url", "doc_id", partitions)
