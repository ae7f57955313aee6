"""Maximum Subtree Similarity (MSS) — the reference's shipped default
reranker (metric v04; ranking_functions.py:647-1102, constraint
semantics constraint_info.py:36-132). Clean-room reimplementation over
our SLTNode trees.

Semantics (kept faithful):
* every (query node, candidate node) pair that is exactly equal or
  unifiable under the node's constraint is a potential alignment root;
* from each root, the matched subtree grows greedily: a child branch is
  kept only if it improves the potential f-measure of the subtree
  (matches / harmonic of query size and subtree size);
* variables unify via a frequency-greedy 1:1 assignment (qvars and
  plain variables unified separately; unification failures count as
  unmatched);
* score vector = [harmonic mean of unified-symbol recall and
  matched-edge recall, -candidate nodes left unmatched, exact matches],
  compared lexicographically, ties keeping enumeration order;
* constraints: default unifiable; 'E' exact-only; type-restricted
  qvars; numeric ranges for N! nodes (U!>=2 style).

Matrix cells compare positionally (row-major, truncated to the smaller
matrix); 1-D matrices compare as lists.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from tangent_spark.operators.slt import SLTNode, parse_slt

_SCRIPT_EDGES = ("n", "a", "b", "o", "u", "c", "d")


@dataclass
class Constraint:
    unifiable: bool = True
    restricted_type: Optional[str] = None  # for qvars: required tag type char
    min_value: Optional[float] = None
    min_strict: bool = False
    max_value: Optional[float] = None
    max_strict: bool = False

    @staticmethod
    def parse(text: str) -> "Constraint":
        if text == "E":
            return Constraint(unifiable=False)
        c = Constraint(unifiable=True)
        parts = text.split("!")
        if parts[0] == "U":
            for p in parts[1:]:
                if p.startswith(">="):
                    c.min_value, c.min_strict = float(p[2:]), False
                elif p.startswith(">"):
                    c.min_value, c.min_strict = float(p[1:]), True
                elif p.startswith("<="):
                    c.max_value, c.max_strict = float(p[2:]), False
                elif p.startswith("<"):
                    c.max_value, c.max_strict = float(p[1:]), True
        elif parts[0]:
            c.restricted_type = parts[0]
        return c

    def allows(self, q_tag: str, c_tag: str) -> bool:
        if q_tag == c_tag or q_tag.startswith("?"):
            if q_tag.startswith("?") and q_tag != c_tag and self.restricted_type:
                return len(c_tag) > 1 and c_tag[1] == "!" and c_tag[0] == self.restricted_type
            return True
        if not self.unifiable:
            return False
        q_typed = len(q_tag) > 1 and q_tag[1] == "!"
        c_typed = len(c_tag) > 1 and c_tag[1] == "!"
        if not (q_typed and c_typed and q_tag[0] == c_tag[0]):
            return False
        if q_tag[0] == "N":
            try:
                v = float(c_tag.split("!", 1)[1].strip())
            except ValueError:
                return False
            if self.min_value is not None and (
                v < self.min_value or (self.min_strict and v == self.min_value)
            ):
                return False
            if self.max_value is not None and (
                v > self.max_value or (self.max_strict and v == self.max_value)
            ):
                return False
        return True


_DEFAULT = Constraint()


def list_nodes(root: SLTNode) -> List[Tuple[SLTNode, str]]:
    """DFS (n a b o u c d w e order) with edge-path locations; root ''."""
    out: List[Tuple[SLTNode, str]] = []

    def walk(node: SLTNode, loc: str) -> None:
        out.append((node, loc))
        for label, ch in node.edges():
            walk(ch, loc + label)

    walk(root, "")
    return out


def _is_var(tag: str) -> bool:
    return tag.startswith("V!") or tag.startswith("?")


def _matrix_dims(tag: str) -> Tuple[int, int]:
    x = tag.rfind("x")
    if x < 0:
        return (-1, -1)
    cols = int(tag[x + 1 :])
    start = x - 1
    while start > 1 and tag[start - 1].isdigit():
        start -= 1
    return int(tag[start:x]), cols


def _cells(node: SLTNode) -> List[SLTNode]:
    cells = []
    cur = node.w
    while cur is not None:
        cells.append(cur)
        cur = cur.e
    return cells


@dataclass
class _Pair:
    q_tag: str
    c_tag: str
    q_loc: str
    c_loc: str


def _grow(
    q: SLTNode,
    q_loc: str,
    c: SLTNode,
    c_loc: str,
    constraints: Dict[str, Constraint],
    restricted_vars: frozenset,
    q_size: int,
):
    """Greedy subtree growth from an aligned root: returns
    (matched, u_qvars, u_vars, u_const, unmatched)."""
    con = constraints.get(q_loc, _DEFAULT)
    matched: List[_Pair] = []
    u_qvars: List[_Pair] = []
    u_vars: List[_Pair] = []
    u_const: List[_Pair] = []
    unmatched = 0
    here = _Pair(q.tag, c.tag, q_loc, c_loc)

    if q.tag.startswith("?"):
        if con.allows(q.tag, c.tag):
            u_qvars.append(here)
        else:
            unmatched += 1
    elif _is_var(q.tag) and _is_var(c.tag):
        if q.tag in restricted_vars or c.tag in restricted_vars:
            if q.tag == c.tag:
                matched.append(here)
            else:
                unmatched += 1
        else:
            u_vars.append(here)
    elif q.tag == c.tag:
        matched.append(here)
    elif con.allows(q.tag, c.tag):
        u_const.append(here)
    else:
        unmatched += 1

    def fmeasure(m: int, size: int) -> float:
        if m == 0 or q_size == 0 or size == 0:
            return 0.0
        r, p = m / q_size, m / size
        return 2.0 * r * p / (r + p)

    max_matches = len(matched) + len(u_vars) + len(u_const)
    size = 1
    best_f = fmeasure(max_matches, size)

    branches: List[Tuple[SLTNode, SLTNode, str, str]] = []
    for label in _SCRIPT_EDGES:
        qc, cc = getattr(q, label), getattr(c, label)
        if qc is not None and cc is not None:
            branches.append((qc, cc, label, label))
    if q.tag.startswith("M!") and c.tag.startswith("M!"):
        qr, qcols = _matrix_dims(q.tag)
        cr, ccols = _matrix_dims(c.tag)
        q_cells, c_cells = _cells(q), _cells(c)
        if (qr == 1 or qcols == 1) and (cr == 1 or ccols == 1):
            path = "w"
            for i in range(min(len(q_cells), len(c_cells))):
                branches.append((q_cells[i], c_cells[i], path, path))
                path += "e"
        else:
            for r in range(min(qr, cr)):
                for cidx in range(min(qcols, ccols)):
                    i1, i2 = r * qcols + cidx, r * ccols + cidx
                    if i1 < len(q_cells) and i2 < len(c_cells):
                        branches.append(
                            (q_cells[i1], c_cells[i2], "w" + "e" * i1, "w" + "e" * i2)
                        )
    else:
        if q.w is not None and c.w is not None:
            branches.append((q.w, c.w, "w", "w"))

    for qc, cc, rel_q, rel_c in branches:
        res = _grow(qc, q_loc + rel_q, cc, c_loc + rel_c, constraints, restricted_vars, q_size)
        bm, bqv, bv, bc, bu = res
        potential = len(bm) + len(bqv) + len(bv) + len(bc)
        cand_matches = max_matches + potential
        cand_size = size + potential + bu
        f = fmeasure(cand_matches, cand_size)
        if f > best_f:
            matched += bm
            u_qvars += bqv
            u_vars += bv
            u_const += bc
            unmatched += bu
            max_matches, size, best_f = cand_matches, cand_size, f

    return matched, u_qvars, u_vars, u_const, unmatched


def _greedy_unify(pairs: List[_Pair]) -> Tuple[Dict[str, str], Dict[str, str]]:
    freq: Dict[Tuple[str, str], int] = {}
    q_assign: Dict[str, Optional[str]] = {}
    c_assign: Dict[str, Optional[str]] = {}
    for p in pairs:
        freq[(p.q_tag, p.c_tag)] = freq.get((p.q_tag, p.c_tag), 0) + 1
        q_assign.setdefault(p.q_tag, None)
        c_assign.setdefault(p.c_tag, None)
    ranked = sorted(
        ((n, 1 if qt == ct else 0, qt, ct) for (qt, ct), n in freq.items()),
        reverse=True,
    )
    for _n, _x, qt, ct in ranked:
        if q_assign.get(qt) is None and c_assign.get(ct) is None:
            q_assign[qt] = ct
            c_assign[ct] = qt
    return {k: v for k, v in q_assign.items()}, {k: v for k, v in c_assign.items()}


def _matched_edges(locations: List[str]) -> int:
    by_len: Dict[int, set] = {}
    for loc in locations:
        by_len.setdefault(len(loc), set()).add(loc)
    total = 0
    for ln in sorted(by_len, reverse=True):
        if ln - 1 in by_len:
            for loc in by_len[ln]:
                if loc[:-1] in by_len[ln - 1]:
                    total += 1
    return total


def _enumerate_roots(query_slt: str, cand_slt: str, constraints: Dict[str, Constraint]):
    """Shared v04-family setup: parse both trees, list nodes, restricted
    vars, candidate alignment roots in (query DFS x candidate DFS) order."""
    q_root, c_root = parse_slt(query_slt), parse_slt(cand_slt)
    if q_root is None or c_root is None:
        return None
    q_nodes = list_nodes(q_root)
    c_nodes = list_nodes(c_root)
    restricted = frozenset(
        qn.tag
        for (qn, ql) in q_nodes
        if qn.tag.startswith("V!") and not constraints.get(ql, _DEFAULT).unifiable
    )
    roots = [
        (qn, ql, cn, cl)
        for qn, ql in q_nodes
        for cn, cl in c_nodes
        if constraints.get(ql, _DEFAULT).allows(qn.tag, cn.tag)
    ]
    return q_nodes, c_nodes, restricted, roots


def _test_root_v04(qn, ql, cn, cl, constraints, restricted, q_size, c_size, pending):
    """One v04 alignment test (reference test_alignment_unification:
    908-1003): grow, unify, mark covered pairs no longer pending, score.
    Returns (scores, matched, unified, wildcard, match_data) where
    match_data = (unified_matches, matched_edges, unification maps) —
    the inputs similarity_v05's merge loop consumes."""
    matched, u_qvars, u_vars, u_const, unmatched = _grow(
        qn, ql, cn, cl, constraints, restricted, q_size
    )
    unified: List[_Pair] = []
    wildcard: List[_Pair] = []
    if u_qvars:
        qv_q, qv_c = _greedy_unify(u_qvars)
        for p in u_qvars:
            if qv_q.get(p.q_tag) == p.c_tag:
                unified.append(p)
                wildcard.append(p)
    else:
        qv_q, qv_c = {}, {}
    v_q, v_c = _greedy_unify(u_vars)
    for p in u_vars:
        if v_q.get(p.q_tag) == p.c_tag:
            (matched if p.q_tag == p.c_tag else unified).append(p)
    unified.extend(u_const)

    for p in matched + unified:
        pending.discard((p.q_loc, p.c_loc))
    pending.discard((ql, cl))

    n_unified = len(matched) + len(unified)
    edges = _matched_edges([p.c_loc for p in matched + unified])
    sym_rec = n_unified / q_size
    if q_size > 1:
        edge_rec = (edges if edges > 0 else 0.5) / (q_size - 1)
    else:
        edge_rec = 1.0
    f = (
        2.0 * sym_rec * edge_rec / (sym_rec + edge_rec)
        if sym_rec + edge_rec > 0
        else 0.0
    )
    scores = (f, -(c_size - n_unified), len(matched))
    return scores, matched, unified, wildcard, (n_unified, edges, (v_q, v_c, qv_q, qv_c))


def mss_score(
    query_slt: str,
    cand_slt: str,
    constraints: Optional[Dict[str, Constraint]] = None,
) -> Tuple[float, int, int]:
    """Score vector (f, -unmatched_candidate_nodes, exact_matches) of the
    best alignment (reference similarity_v04 top-1 policy)."""
    constraints = constraints or {}
    setup = _enumerate_roots(query_slt, cand_slt, constraints)
    if setup is None:
        return (0.0, 0, 0)
    q_nodes, c_nodes, restricted, roots = setup
    q_size, c_size = len(q_nodes), len(c_nodes)
    pending = {(ql, cl) for _, ql, _, cl in roots}
    best_scores = None
    for qn, ql, cn, cl in roots:
        if (ql, cl) not in pending:
            continue
        scores, *_ = _test_root_v04(
            qn, ql, cn, cl, constraints, restricted, q_size, c_size, pending
        )
        if best_scores is None or scores > best_scores:
            best_scores = scores
    return best_scores if best_scores is not None else (0.0, 0, 0)


def mss_multi_score(
    query_slt: str,
    cand_slt: str,
    constraints: Optional[Dict[str, Constraint]] = None,
) -> Tuple[float, float, float]:
    """v05 (reference similarity_v05:1151-1318): instead of the single
    best alignment, ACCEPT multiple non-overlapping sub-alignments in
    descending score order, merging their variable unifications when
    compatible (conflicting re-mappings invalidate a sub-alignment's
    pairs), and score the union:
        [dice(total unified recall, total edge recall),
         -(candidate nodes not covered), total exact matches].
    Quirk kept: the top alignment's edge count comes from CANDIDATE
    locations; later sub-alignments re-count from QUERY locations
    (reference lines 1174 vs 1283)."""
    constraints = constraints or {}
    setup = _enumerate_roots(query_slt, cand_slt, constraints)
    if setup is None:
        return (0.0, 0.0, 0.0)
    q_nodes, c_nodes, restricted, roots = setup
    q_size, c_size = len(q_nodes), len(c_nodes)
    pending = {(ql, cl) for _, ql, _, cl in roots}
    scored = []
    for qn, ql, cn, cl in roots:
        if (ql, cl) not in pending:
            continue
        scores, matched, unified, wildcard, md = _test_root_v04(
            qn, ql, cn, cl, constraints, restricted, q_size, c_size, pending
        )
        scored.append((scores, matched, unified, wildcard, md))
    scored.sort(key=lambda x: x[0], reverse=True)

    aligned_q: dict = {}
    aligned_c: dict = {}
    uni_q: dict = {}
    uni_c: dict = {}
    qv_q: dict = {}
    qv_c: dict = {}
    accepted = []  # (n_unified, valid_edges, n_exact)
    for idx, (scores, matched, unified, wildcard, md) in enumerate(scored):
        a_unified, a_edges, (a_q, a_c, a_qv_q, a_qv_c) = md
        if idx == 0:
            valid_m, valid_u = list(matched), list(unified)
            valid_edges = a_edges
            uni_q, uni_c = dict(a_q), dict(a_c)
            qv_q, qv_c = dict(a_qv_q), dict(a_qv_c)
        else:
            tempo_q, tempo_c = dict(uni_q), dict(uni_c)
            tempo_qv_q, tempo_qv_c = dict(qv_q), dict(qv_c)
            maps_changed = qv_changed = False
            invalid: dict = {}
            for var_q, var_c in a_q.items():
                if (
                    var_c is not None
                    and tempo_c.get(var_c) is None
                    and tempo_q.get(var_q) is None
                ):
                    maps_changed = True
                    tempo_q[var_q] = var_c
                    tempo_c[var_c] = var_q
                elif var_c is not None and var_q in tempo_q and tempo_q[var_q] != var_c:
                    invalid[var_q] = var_c
            for var_q, var_c in a_qv_q.items():
                if (
                    var_c is not None
                    and tempo_qv_c.get(var_c) is None
                    and tempo_qv_q.get(var_q) is None
                ):
                    qv_changed = True
                    tempo_qv_q[var_q] = var_c
                    tempo_qv_c[var_c] = var_q
                elif var_c is not None and var_q in tempo_qv_q and tempo_qv_q[var_q] != var_c:
                    invalid[var_q] = var_c

            valid_m, valid_u = [], []
            subloc = []
            for p in matched:
                if p.q_loc not in aligned_q and p.c_loc not in aligned_c and p.q_tag not in invalid:
                    valid_m.append(p)
                    subloc.append(p.q_loc)
            for p in unified:
                if p.q_loc not in aligned_q and p.c_loc not in aligned_c and p.q_tag not in invalid:
                    valid_u.append(p)
                    subloc.append(p.q_loc)
            if not (valid_m or valid_u):
                continue
            if maps_changed:
                uni_q, uni_c = tempo_q, tempo_c
            if qv_changed:
                qv_q, qv_c = tempo_qv_q, tempo_qv_c
            valid_edges = _matched_edges(subloc)
        for p in valid_m + valid_u:
            aligned_q[p.q_loc] = True
            aligned_c[p.c_loc] = True
        accepted.append((len(valid_m) + len(valid_u), valid_edges, len(valid_m)))

    if not accepted:
        return (0.0, 0.0, 0.0)
    total_unified = sum(n for n, _, _ in accepted)
    total_edges = sum(e for _, e, _ in accepted)
    total_exact = sum(x for _, _, x in accepted)
    u_sym_rec = total_unified / q_size
    if q_size > 1:
        u_edge_rec = (total_edges if total_edges > 0 else 0.5) / (q_size - 1)
    else:
        u_edge_rec = 1.0
    f = (
        2.0 * u_sym_rec * u_edge_rec / (u_sym_rec + u_edge_rec)
        if u_sym_rec + u_edge_rec > 0
        else 0.0
    )
    return (f, float(-(c_size - total_unified)), float(total_exact))
