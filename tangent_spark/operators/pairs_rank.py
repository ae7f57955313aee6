"""Pair-multiset rerank metrics v00 / v02 / v03 (reference
ranking_functions.py:251-283, 419-480, 541-622), clean-room.

These are the reference's pre-tree-alignment rerank generation
(rerank_results.py metrics 0/2/3), scored over the window-bounded
symbol-pair expansions (operators/slt.pairs with eol='none', which is
byte-identical to the reference's MathSymbol.get_pairs — verified in
tests/test_pairs_rank.py):

  v00: plain count-capped pair f-measure.
  v02: per-symbol instance selection first — for each symbol shared by
       query and candidate, keep only the min(q,c) candidate INSTANCES
       whose pair sets best match the query's pairs for that symbol
       (ties broken by descending location string, like the reference's
       reverse sort) — then v00 over the surviving candidate pairs,
       plus a unique-symbol-overlap f-measure as a second score.
  v03: greedy variable unification first — each (query var, candidate
       var) pair is weighted by the f-measure of their abstracted pair
       contexts (<U>/<V> substitution), best-first 1:1 assignment,
       unified vars rewritten to U!<idx> and all numeric constants
       collapsed to N!U — then v02 on the unified pair lists; score
       vector [unified pair f, original pair f, unified symbol f].
"""

from __future__ import annotations

from collections import Counter
from typing import List, Tuple

Pair = Tuple[str, str, str, str]  # (ancestor, descendant, relpath, location)


def _match_count(pairs_a: List[Pair], pairs_b: List[Pair]) -> int:
    """Count-capped multiset overlap on (ancestor, descendant, relpath)."""
    ca = Counter((a, d, r) for a, d, r, _ in pairs_a)
    cb = Counter((a, d, r) for a, d, r, _ in pairs_b)
    return sum(min(n, cb[k]) for k, n in ca.items())


def _fmeasure(matches: int, na: int, nb: int) -> float:
    if matches == 0 or na == 0 or nb == 0:
        return 0.0
    r, p = matches / na, matches / nb
    return 2.0 * r * p / (r + p)


def _unique_instances(pairs: List[Pair]) -> dict:
    """ancestor -> number of distinct instance locations."""
    locs: dict = {}
    for a, _, _, loc in pairs:
        locs.setdefault(a, set()).add(loc)
    return {a: len(s) for a, s in locs.items()}


def _is_var(tag: str) -> bool:
    return tag.startswith("V!") or tag.startswith("?")


def similarity_v00(pairs_q: List[Pair], pairs_c: List[Pair]) -> tuple:
    if not pairs_q or not pairs_c:
        return (0.0,)
    return (_fmeasure(_match_count(pairs_q, pairs_c), len(pairs_q), len(pairs_c)),)


def similarity_v02(pairs_q: List[Pair], pairs_c: List[Pair]) -> tuple:
    e_q = _unique_instances(pairs_q)
    e_c = _unique_instances(pairs_c)
    by_anc_q: dict = {}
    for p in pairs_q:
        by_anc_q.setdefault(p[0], []).append(p)
    by_anc_c: dict = {}
    for p in pairs_c:
        by_anc_c.setdefault(p[0], []).append(p)

    final_c: List[Pair] = []
    matched_symbols = 0
    for anc, n_q in e_q.items():
        if anc not in e_c:
            continue
        count = min(n_q, e_c[anc])
        matched_symbols += count
        cand_pairs = by_anc_c[anc]
        if count < e_c[anc]:
            per_loc: dict = {}
            for p in cand_pairs:
                per_loc.setdefault(p[3], []).append(p)
            scored = sorted(
                ((_match_count(by_anc_q[anc], ps), loc) for loc, ps in per_loc.items()),
                reverse=True,  # ties: location string DESC, like the reference
            )
            for _, loc in scored[:count]:
                final_c.extend(per_loc[loc])
        else:
            final_c.extend(cand_pairs)

    pair_f = similarity_v00(pairs_q, final_c)[0]
    if matched_symbols > 0:
        rec = matched_symbols / sum(e_q.values())
        prec = matched_symbols / sum(e_c.values())
        elem_f = 2.0 * rec * prec / (rec + prec)
    else:
        elem_f = 0.0
    return (pair_f, elem_f)


def _abstract(pairs: List[Pair]) -> List[Pair]:
    """Variable-context abstraction for unification weighting
    (generate_unification_pairs): ancestor -> <U>; descendant -> <U> if
    equal to the ancestor, <V> if any variable, else kept."""
    out = []
    for a, d, r, loc in pairs:
        if d == a:
            u_d = "<U>"
        elif _is_var(d):
            u_d = "<V>"
        else:
            u_d = d
        out.append(("<U>", u_d, r, loc))
    return out


def _rewrite(pairs: List[Pair], assignment: dict) -> List[Pair]:
    """unify_variables: assigned vars -> U!<idx>; every numeric constant
    -> N!U (constants always unify); unassigned vars stay as-is."""

    def sub(tag: str) -> str:
        if tag in assignment:
            idx = assignment[tag]
            return f"U!{idx}" if idx is not None else tag
        if tag.startswith("N!"):
            return "N!U"
        return tag

    return [(sub(a), sub(d), r, loc) for a, d, r, loc in pairs]


def similarity_v03(pairs_q: List[Pair], pairs_c: List[Pair]) -> tuple:
    by_anc_q: dict = {}
    for p in pairs_q:
        by_anc_q.setdefault(p[0], []).append(p)
    by_anc_c: dict = {}
    for p in pairs_c:
        by_anc_c.setdefault(p[0], []).append(p)
    # NB: like the reference, only symbols appearing as ANCESTORS are
    # unification candidates (count_unique_elements keys on ancestor)
    v_q = {a: None for a in by_anc_q if _is_var(a)}
    v_c = {a: None for a in by_anc_c if _is_var(a)}
    abs_q = {a: _abstract(by_anc_q[a]) for a in v_q}
    abs_c = {a: _abstract(by_anc_c[a]) for a in v_c}

    weights = []
    for qv in v_q:
        for cv in v_c:
            f = _fmeasure(_match_count(abs_q[qv], abs_c[cv]), len(abs_q[qv]), len(abs_c[cv]))
            weights.append(((f, 1.0 if qv == cv else 0.0), qv, cv))
    n_assigned = 0
    for (f, _x), qv, cv in sorted(weights, reverse=True):
        if f > 0.0 and v_q[qv] is None and v_c[cv] is None:
            v_q[qv] = v_c[cv] = n_assigned
            n_assigned += 1

    u_scores = similarity_v02(_rewrite(pairs_q, v_q), _rewrite(pairs_c, v_c))
    o_scores = similarity_v02(pairs_q, pairs_c)
    return (u_scores[0], o_scores[0], u_scores[1])
