"""Pure-Python reference scorer (no Spark, no numpy tricks) used by the
pytest suite as the rank-identity oracle for both BM25 paths and the
Dice formula scorer.

Formulas match plans/search.py exactly (same op order, float64), and
the Dice measure matches the reference engine: F = 2*cc/(etc+qtc) with
cc = sum over tuples of min(query_count, cand_count)
(reference mathindex.cpp:239-246).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Iterable, Sequence

from tangent_spark.functions.tokenize import tokenize_porter, tokenize_simple


def _tok(text: str, tokenizer: str) -> list[str]:
    return tokenize_porter(text) if tokenizer == "porter" else tokenize_simple(text)


def bm25_rank(
    docs: Sequence[tuple[int, str]],
    query: str,
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
    tokenizer: str = "porter",
) -> list[tuple[int, float]]:
    """Exhaustive BM25 top-k: [(doc_id, score)] sorted (score desc, id asc)."""
    tf: dict[int, Counter] = {}
    dl: dict[int, int] = {}
    for doc_id, text in docs:
        toks = _tok(text, tokenizer)
        if toks:
            tf[doc_id] = Counter(toks)
            dl[doc_id] = len(toks)
    n_with_tokens = len(dl)
    avgdl = sum(dl.values()) / n_with_tokens if n_with_tokens else 1.0
    qts = sorted(set(_tok(query, tokenizer)))
    dfs = {t: sum(1 for c in tf.values() if t in c) for t in qts}
    scores: dict[int, float] = {}
    for doc_id, counts in tf.items():
        s = 0.0
        for t in qts:
            if t in counts and dfs[t] > 0:
                idf = math.log(1.0 + (n_with_tokens - dfs[t] + 0.5) / (dfs[t] + 0.5))
                f = counts[t]
                tfn = f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * dl[doc_id] / avgdl))
                s += idf * tfn
        if s > 0.0:
            scores[doc_id] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def dice_score(query_tuples: Iterable[str], cand_tuples: Iterable[str]) -> float:
    """Tangent's F-measure over tuple multisets (mathindex.cpp:239-246)."""
    q = Counter(query_tuples)
    c = Counter(cand_tuples)
    cc = sum(min(n, c[t]) for t, n in q.items())
    denom = sum(q.values()) + sum(c.values())
    return 2.0 * cc / denom if denom else 0.0


def rank_groups(ranked: list[tuple[int, float]], tol: float = 1e-9) -> list[list[int]]:
    """Collapse a ranking into groups of indistinguishable scores, for
    order-comparisons that must not depend on float ulps."""
    groups: list[list[int]] = []
    last: float | None = None
    for doc, s in ranked:
        if last is None or abs(s - last) > tol:
            groups.append([doc])
        else:
            groups[-1].append(doc)
        last = s
    return [sorted(g) for g in groups]
