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
    query: str | Sequence[str],
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
    tokenizer: str = "porter",
) -> list[tuple[int, float]]:
    """Exhaustive BM25 top-k: [(doc_id, score)] sorted (score desc, id asc).

    `query` is either raw text (analyzed with `tokenizer`) or an
    already-analyzed term list (used verbatim — wildcard/synonym
    expansions are index terms, re-stemming would corrupt them)."""
    tf: dict[int, Counter] = {}
    dl: dict[int, int] = {}
    for doc_id, text in docs:
        toks = _tok(text, tokenizer)
        if toks:
            tf[doc_id] = Counter(toks)
            dl[doc_id] = len(toks)
    n_with_tokens = len(dl)
    avgdl = sum(dl.values()) / n_with_tokens if n_with_tokens else 1.0
    if isinstance(query, str):
        qts = sorted(set(_tok(query, tokenizer)))
    else:
        qts = sorted(set(query))
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


def dice_rank(
    slts: Sequence[str],
    query_mathml: str,
    k: int,
    cfg=None,
) -> list[tuple[int, str, float]]:
    """Exhaustive Dice ranking over unique expressions: returns
    [(expr_id, slt, score)] sorted (score desc, expr_id asc), where
    expr_id = rank of slt in sorted order (matching
    functions/ids.dense_ids). Wildcard query tuples are scored per
    instance with shared per-tuple budgets (plans/formula.wildcard_cc —
    the golden-verified rule)."""
    from tangent_spark.config import IndexConfig
    from tangent_spark.operators.slt import mathml_to_slt, pairs, parse_slt

    cfg = cfg or IndexConfig()
    uniq = sorted(set(slts))
    expr_tuples = []
    for slt in uniq:
        cnt: Counter = Counter()
        for fr, to, rel, _ in pairs(
            parse_slt(slt), cfg.window, cfg.eol_mode, max_pair_len=cfg.max_pair_len
        ):
            cnt[(fr, to, rel)] += 1
        expr_tuples.append(cnt)
    qslt = mathml_to_slt(query_mathml)
    if qslt is None:
        return []
    from tangent_spark.plans.formula import wildcard_cc

    qcnt: Counter = Counter()
    wild: list = []
    qtc = 0
    for fr, to, rel, _ in pairs(
        parse_slt(qslt), cfg.window, cfg.eol_mode, max_pair_len=cfg.max_pair_len
    ):
        fw, tw = fr.startswith("?"), to.startswith("?")
        if fw and tw:
            continue
        qtc += 1
        if fw or tw:
            wild.append((fr, to, rel))
        else:
            qcnt[(fr, to, rel)] += 1
    if qtc == 0:
        return []
    # Index-wide posting sizes (unique expressions per tuple) — the same
    # stats plans/formula.dice_topk_exprs reads off f_postings — so the
    # oracle's wildcard visit order / density gate matches the engine's.
    sizes: Counter = Counter()
    for ec in expr_tuples:
        for t in ec:
            sizes[t] += 1
    n_exprs = len(uniq)
    from tangent_spark.plans.formula import wildcard_dense_flags

    dense = wildcard_dense_flags(wild, dict(sizes), n_exprs)
    out = []
    for expr_id, (slt, ec) in enumerate(zip(uniq, expr_tuples)):
        cc = sum(min(qn, ec.get(t, 0)) for t, qn in qcnt.items())
        if wild:
            cc += wildcard_cc(dict(qcnt), wild, dict(ec), dict(sizes), dense=dense)
        if cc > 0:
            etc = sum(ec.values())
            out.append((expr_id, slt, 2.0 * cc / (etc + qtc)))
    out.sort(key=lambda t: (-t[2], t[0]))
    return out[:k]


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
