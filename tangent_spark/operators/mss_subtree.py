"""Subtree-unification similarity — the reference's v06 metric family
(ranking_functions.py:1370-2070), clean-room over our SLTNode trees.

This is the matcher behind the shipped NTCIR-12 reranked result files:
`similarity_v11` = this matching + the m4 score vector, and reproduces
results/Wikipedia/Task_FormulaBrowing/reranked_output/
reranked_paper_m4_w0_e2.tsv with zero score mismatches over all 3,940
unique (query, candidate) pairs (tests/test_golden_rerank.py).
`similarity_v06` = same matching + the m6 score vector (the "MSS" mode
of utility/comp_query.py:124-126).

Differences from the v04 matcher (operators/mss.py):
  * NO greedy f-measure gating — the aligned subtree is the full common
    structure reachable from the alignment root;
  * query wildcards (?x) capture entire candidate SUBTREES: scripts the
    wildcard lacks are swallowed into the captured tree, and a leaf
    wildcard expands horizontally along the candidate baseline until the
    query's next symbol is found (exact first, then unifiable)
    (reference align_trees_subtree_unification:1370-1619);
  * a wildcard that roots the whole alignment and sits at the end of a
    baseline also expands LEFT, absorbing everything before it on that
    baseline (root_wildcard_left_expansion:1694-1739);
  * repeated wildcards must capture identical subtrees — the largest
    capture wins and only captures with the same canonical string stay
    valid (greedy_subtree_unification:1636-1662).

Score vectors (compared lexicographically, best alignment wins):
  m4 (= v11): [dice(unified-symbol recall, matched-edge recall),
               -(candidate nodes not covered), exact matches]
  m6 (= v06): [dice(exact+wildcard recall, unified dice), -(uncovered),
               -wildcard-captured nodes, leftmost-match vector (3),
               -stdev of capture sizes]
  m7 (= v07): edge-recall dice, exact+wildcard only (unification
              disabled via all-'E' constraints)
  m8 (= v08): edge-recall dice incl. unified edges
  m9 (= v09): ancestor-triplet dice, exact+wildcard only (window 0)
  m10 (= v10): ancestor-triplet dice incl. unified

All six verified score-vector-identical against the reference
implementation (tests/test_golden_rerank.py::test_live_vector_parity).
"""

from __future__ import annotations

import statistics
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from tangent_spark.operators.mss import (
    Constraint,
    _DEFAULT,
    _greedy_unify,
    _matched_edges,
    _matrix_dims,
    _Pair,
    _is_var,
    list_nodes,
)
from tangent_spark.operators.slt import ALL_EDGES, SLTNode, parse_slt, to_string

_SCRIPTS = ("a", "b", "o", "u", "c", "d")  # non-baseline script edges


def _copy(node: Optional[SLTNode]) -> Optional[SLTNode]:
    if node is None:
        return None
    out = SLTNode(node.tag)
    for s in ALL_EDGES:
        setattr(out, s, _copy(getattr(node, s)))
    return out


def _subtree_size(node: Optional[SLTNode]) -> int:
    if node is None:
        return 0
    return 1 + sum(_subtree_size(getattr(node, s)) for s in ALL_EDGES)


def _is_wmat(node: SLTNode) -> bool:
    """A 1x1 matrix whose only cell is a lone wildcard matches any matrix
    exactly (reference check_is_wildcard_matrix:1360-1366)."""
    if not node.tag.startswith("M!"):
        return False
    r, c = _matrix_dims(node.tag)
    return (
        r == 1 and c == 1 and node.w is not None
        and node.w.tag.startswith("?") and node.w.n is None
    )


def _cells(node: SLTNode) -> List[SLTNode]:
    out, cur = [], node.w
    while cur is not None:
        out.append(cur)
        cur = cur.e
    return out


@dataclass
class _Capture:
    """One wildcard -> candidate-subtree capture (the reference's
    WildcardAlignment). size is frozen at capture time; left expansion
    mutates tree/c_loc only — exactly the reference's behavior."""
    q_tag: str
    q_loc: str
    tree: SLTNode
    c_loc: str
    size: int = 0

    def __post_init__(self):
        self.size = _subtree_size(self.tree)


def _align(
    q: SLTNode, q_loc: str, c: SLTNode, c_loc: str,
    cons: Dict[str, Constraint], restricted: frozenset,
    matched: List[_Pair], captures: List[_Capture],
    u_vars: List[_Pair], u_const: List[_Pair],
) -> None:
    """Walk the common structure from an aligned root, classifying every
    co-located node pair; wildcards swallow unpaired candidate structure
    into a _Capture. No pruning — all reachable pairs accumulate."""
    here = _Pair(q.tag, c.tag, q_loc, c_loc)
    children: List[Tuple[SLTNode, SLTNode, str, str]] = []

    if q.tag.startswith("?"):
        cap = SLTNode(c.tag)
        if c.n is not None:
            # horizontal expansion allowed only for script-free wildcards
            expandable = all(getattr(q, s) is None for s in _SCRIPTS)
            if q.n is not None:
                if expandable:
                    cap.n = _copy(c.n)
                    # eat candidate symbols until the query's next symbol
                    # appears: exact tag first, then first unifiable
                    found = False
                    tempo, rel = cap, "n"
                    while tempo.n is not None:
                        if tempo.n.tag == q.n.tag:
                            children.append((q.n, tempo.n, q_loc + "n", c_loc + rel))
                            tempo.n = None
                            found = True
                            break
                        tempo, rel = tempo.n, rel + "n"
                    if not found:
                        ncon = cons.get(q_loc + "n", _DEFAULT)
                        tempo, rel = cap, "n"
                        while tempo.n is not None:
                            if ncon.allows(q.n.tag, tempo.n.tag):
                                children.append((q.n, tempo.n, q_loc + "n", c_loc + rel))
                                tempo.n = None
                                break
                            tempo, rel = tempo.n, rel + "n"
                else:
                    children.append((q.n, c.n, q_loc + "n", c_loc + "n"))
            elif expandable:
                cap.n = _copy(c.n)
        for s in _SCRIPTS:
            cc = getattr(c, s)
            if cc is not None:
                qc = getattr(q, s)
                if qc is not None:
                    children.append((qc, cc, q_loc + s, c_loc + s))
                else:
                    setattr(cap, s, _copy(cc))
        cap.w = _copy(c.w)
        captures.append(_Capture(q.tag, q_loc, cap, c_loc))
    elif _is_var(q.tag) and _is_var(c.tag):
        if q.tag in restricted or c.tag in restricted:
            if q.tag == c.tag:
                matched.append(here)
        else:
            u_vars.append(here)
    elif _is_wmat(q) and c.tag.startswith("M!"):
        matched.append(here)
    elif q.tag == c.tag:
        matched.append(here)
    elif cons.get(q_loc, _DEFAULT).allows(q.tag, c.tag):
        u_const.append(here)

    if not q.tag.startswith("?"):
        for s in ("n",) + _SCRIPTS:
            qc, cc = getattr(q, s), getattr(c, s)
            if qc is not None and cc is not None:
                children.append((qc, cc, q_loc + s, c_loc + s))

    if q.tag.startswith("M!") and c.tag.startswith("M!"):
        if _is_wmat(q):
            captures.append(
                _Capture(q.w.tag, q_loc + "w", _copy(c.w), c_loc + "w")
            )
        else:
            qr, qc_ = _matrix_dims(q.tag)
            cr, cc_ = _matrix_dims(c.tag)
            q_cells, c_cells = _cells(q), _cells(c)
            if (qr == 1 or qc_ == 1) and (cr == 1 or cc_ == 1):
                path = "w"
                for i in range(min(len(q_cells), len(c_cells))):
                    children.append((q_cells[i], c_cells[i], q_loc + path, c_loc + path))
                    path += "e"
            else:
                for r in range(min(qr, cr)):
                    for col in range(min(qc_, cc_)):
                        i1, i2 = r * qc_ + col, r * cc_ + col
                        if i1 < len(q_cells) and i2 < len(c_cells):
                            children.append((
                                q_cells[i1], c_cells[i2],
                                q_loc + "w" + "e" * i1, c_loc + "w" + "e" * i2,
                            ))
    elif q.w is not None and c.w is not None:
        children.append((q.w, c.w, q_loc + "w", c_loc + "w"))

    for qc, cc, ql, cl in children:
        _align(qc, ql, cc, cl, cons, restricted, matched, captures, u_vars, u_const)


def _node_at(root: SLTNode, loc: str) -> Optional[SLTNode]:
    cur: Optional[SLTNode] = root
    for ch in loc:
        if cur is None:
            return None
        cur = getattr(cur, ch)
    return cur


def _expand_left(c_root: SLTNode, cap: _Capture) -> None:
    """Absorb everything left of a unique baseline-final root wildcard:
    each step wraps the capture in a copy of the preceding candidate
    symbol (scripts + within copied; 'element' starts a new baseline so
    it is NOT inherited). Mutates tree/c_loc; size stays frozen."""
    while cap.c_loc and cap.c_loc[-1] == "n":
        parent = _node_at(c_root, cap.c_loc[:-1])
        wrapper = SLTNode(parent.tag)
        wrapper.n = cap.tree
        for s in _SCRIPTS + ("w",):
            src = getattr(parent, s)
            if src is not None:
                setattr(wrapper, s, _copy(src))
        cap.c_loc = cap.c_loc[:-1]
        cap.tree = wrapper


def _test_root(
    qn: SLTNode, ql: str, cn: SLTNode, cl: str,
    cons: Dict[str, Constraint], restricted: frozenset,
    c_root: SLTNode, pending: set,
):
    """Align from one root, unify, validate wildcard captures, and mark
    everything covered as no longer pending (reference
    test_alignment_subtree_unification:1784-1888)."""
    matched: List[_Pair] = []
    captures: List[_Capture] = []
    u_vars: List[_Pair] = []
    u_const: List[_Pair] = []
    _align(qn, ql, cn, cl, cons, restricted, matched, captures, u_vars, u_const)

    by_var: Dict[str, List[_Capture]] = {}
    for cap in captures:
        by_var.setdefault(cap.q_tag, []).append(cap)

    if qn.tag.startswith("?"):
        unique = len(by_var[qn.tag]) == 1
        expandable = all(getattr(qn, s) is None for s in _SCRIPTS)
        if cl and cl[-1] == "n" and unique and expandable:
            root_cap = next((c for c in captures if c.c_loc == cl), None)
            if root_cap is not None:
                _expand_left(c_root, root_cap)

    unified: List[_Pair] = []
    q_uni, _ = _greedy_unify(u_vars)
    for p in u_vars:
        if q_uni.get(p.q_tag) == p.c_tag:
            (matched if p.q_tag == p.c_tag else unified).append(p)
    unified.extend(u_const)

    # repeated wildcards: keep only captures matching the largest one
    valid_caps: List[_Capture] = []
    for name, caps in by_var.items():
        if len(caps) >= 2:
            longest = caps[0]
            for c in caps[1:]:
                if c.size > longest.size:
                    longest = c
            want = to_string(longest.tree)
            valid_caps.extend(c for c in caps if to_string(c.tree) == want)
        else:
            valid_caps.append(caps[0])

    cap_children: List[_Pair] = []
    for cap in valid_caps:
        for node, loc in list_nodes(cap.tree):
            cap_children.append(_Pair(cap.q_tag, node.tag, cap.q_loc, cap.c_loc + loc))

    for p in matched:
        pending.discard((p.q_loc, p.c_loc))
    for p in unified:
        pending.discard((p.q_loc, p.c_loc))
    for cap in valid_caps:
        pending.discard((cap.q_loc, cap.c_loc))
    pending.discard((ql, cl))

    return matched, unified, valid_caps, cap_children


# --- score vectors -----------------------------------------------------------

def _edge_recall(edges: int, q_size: int) -> float:
    if q_size > 1:
        return (edges if edges > 0 else 0.5) / (q_size - 1)
    return 1.0


def _dice(a: float, b: float) -> float:
    return 2.0 * a * b / (a + b) if a + b > 0 else 0.0


def _scores_m4(matched, unified, valid_caps, cap_children, q_size, c_size, q_root, c_root):
    """[unified dice, -(uncovered candidate nodes), exact matches]
    (reference scoring_m4:2240-2249)."""
    q_hits = matched + unified + valid_caps
    edges = _matched_edges([p.q_loc for p in q_hits])
    f = _dice(len(q_hits) / q_size, _edge_recall(edges, q_size))
    covered = len(matched) + len(unified) + len(cap_children)
    return (f, -(c_size - covered), len(matched))


_NEG_INF = float("-inf")


def _leftmost(matched, unified, cap_children, max_depth: int):
    """Max over alignments of a per-location leftness vector: earlier on
    the baseline and exact-before-wildcard-before-unified wins
    (reference compute_leftmost_scores/leftmost_match_scores:1733-1765)."""
    best = None
    for c_type, group in ((0, matched), (1, cap_children), (2, unified)):
        for p in group:
            loc = p.c_loc
            vec = [0] * max_depth
            depth = pos = i = 0
            while i < len(loc) and depth < max_depth:
                if loc[i] == "n":
                    pos += 1
                else:
                    vec[depth] = -(pos * 4 + 3)
                    pos = 0
                    depth += 1
                i += 1
            if depth < max_depth:
                vec[depth] = -(pos * 4 + c_type)
            if best is None or best < vec:
                best = vec
    return best if best is not None else [_NEG_INF] * max_depth


def _scores_m6(matched, unified, valid_caps, cap_children, q_size, c_size, q_root, c_root):
    """m6 vector (reference scoring_m6:2251-2270): exact+wildcard recall
    diced with the unified structure dice, then uncovered / capture-size
    / leftness / capture-spread tie-breaks."""
    ew = matched + valid_caps
    q_hits = matched + unified + valid_caps
    edges = _matched_edges([p.q_loc for p in q_hits])
    unified_dice = _dice(len(q_hits) / q_size, _edge_recall(edges, q_size))
    score1 = _dice(unified_dice, len(ew) / q_size)
    covered = len(matched) + len(unified) + len(cap_children)
    per_loc: Dict[str, int] = {}
    for p in cap_children:
        per_loc[p.q_loc] = per_loc.get(p.q_loc, 0) + 1
    spread = statistics.stdev(per_loc.values()) if len(per_loc) >= 2 else 0.0
    left = _leftmost(matched, unified, cap_children, 3)
    return tuple(
        [score1, -(c_size - covered), -len(cap_children)] + left + [-spread]
    )


def _matched_edges_multi(locs: List[str]) -> int:
    """matched_edges_from_locations with OCCURRENCE multiplicity kept
    (reference ranking_functions.py:829-864 iterates lists): every
    occurrence of a location counts once if a location one char shorter
    is its prefix. Needed for m7/m8, where wildcard-captured children
    all carry the same (wildcard) q_location."""
    by_len_list: Dict[int, List[str]] = {}
    by_len_set: Dict[int, set] = {}
    for loc in locs:
        by_len_list.setdefault(len(loc), []).append(loc)
        by_len_set.setdefault(len(loc), set()).add(loc)
    total = 0
    for ln, group in by_len_list.items():
        prev = by_len_set.get(ln - 1)
        if prev:
            total += sum(1 for loc in group if loc[:-1] in prev)
    return total


def _matched_triplets(locs: List[str]) -> int:
    """matched_triplets_from_locations with window=0 (all ancestor
    depths; reference:1940-1980): each location occurrence counts once
    per shorter location that is a strict prefix of it."""
    if not locs:
        return 0
    by_len_list: Dict[int, List[str]] = {}
    by_len_set: Dict[int, set] = {}
    for loc in locs:
        by_len_list.setdefault(len(loc), []).append(loc)
        by_len_set.setdefault(len(loc), set()).add(loc)
    mn = min(by_len_list)
    total = 0
    for cur, group in by_len_list.items():
        for anc_len in range(mn, cur):
            prev = by_len_set.get(anc_len)
            if prev:
                total += sum(1 for loc in group if loc[:anc_len] in prev)
    return total


def _count_triplets(node: SLTNode, depth: int = 0) -> int:
    """count_triplets with window=0: every node contributes its ancestor
    count (reference:1984-2024)."""
    total = depth
    for _, ch in node.edges():
        total += _count_triplets(ch, depth + 1)
    return total


def _scores_m7(matched, unified, valid_caps, cap_children, q_size, c_size, q_root, c_root):
    """m7 (reference scoring_m7 -> score_DC_edges_w_wild_no_unif:2149-2164):
    edge-recall dice over exact+wildcard matches. Faithfully keeps the
    reference's use of q_location on the CANDIDATE side too."""
    q_edges = _matched_edges_multi([p.q_loc for p in matched + valid_caps])
    c_edges = _matched_edges_multi([p.q_loc for p in matched + cap_children])
    rec = (q_edges + 1.0) / q_size
    prec = (c_edges + 1.0) / c_size
    return (2.0 * rec * prec / (rec + prec), q_edges, c_edges, q_size, c_size)


def _scores_m8(matched, unified, valid_caps, cap_children, q_size, c_size, q_root, c_root):
    """m8 (score_DC_Edges_w_wild_w_unif:2167-2189): adds unified edges."""
    q_ew = _matched_edges_multi([p.q_loc for p in matched + valid_caps])
    q_u = _matched_edges_multi([p.q_loc for p in matched + unified + valid_caps])
    c_ew = _matched_edges_multi([p.q_loc for p in matched + cap_children])
    c_u = _matched_edges_multi([p.q_loc for p in matched + unified + cap_children])
    rec = (q_ew + q_u + 2.0) / (2 * q_size)
    prec = (c_ew + c_u + 2.0) / (2 * c_size)
    return (2.0 * rec * prec / (rec + prec), rec, prec, q_ew, q_u, c_ew, c_u)


def _wild_tiebreaks(matched, unified, cap_children):
    per_loc: Dict[str, int] = {}
    for p in cap_children:
        per_loc[p.q_loc] = per_loc.get(p.q_loc, 0) + 1
    spread = statistics.stdev(per_loc.values()) if len(per_loc) >= 2 else 0.0
    left = _leftmost(matched, unified, cap_children, 2)
    return [-len(cap_children), -spread] + left


def _scores_m9(matched, unified, valid_caps, cap_children, q_size, c_size, q_root, c_root):
    """m9 (score_DC_triplets_w_wild_no_unif:2192-2211 + scoring_m9):
    ancestor-triplet dice, exact+wildcard only, window=0."""
    q_tr = _matched_triplets([p.q_loc for p in matched + valid_caps])
    c_tr = _matched_triplets([p.c_loc for p in matched + cap_children])
    rec = (q_tr + 1.0) / (_count_triplets(q_root) + 1.0)
    prec = (c_tr + 1.0) / (_count_triplets(c_root) + 1.0)
    return tuple(
        [2.0 * rec * prec / (rec + prec)] + _wild_tiebreaks(matched, unified, cap_children)
    )


def _scores_m10(matched, unified, valid_caps, cap_children, q_size, c_size, q_root, c_root):
    """m10 (score_DC_triplets_w_wild_w_unif:2214-2238): adds unified."""
    q_trip = _count_triplets(q_root) + 1.0
    c_trip = _count_triplets(c_root) + 1.0
    q_ew = _matched_triplets([p.q_loc for p in matched + valid_caps])
    q_u = _matched_triplets([p.q_loc for p in matched + unified + valid_caps])
    c_ew = _matched_triplets([p.c_loc for p in matched + cap_children])
    c_u = _matched_triplets([p.c_loc for p in matched + unified + cap_children])
    rec = (q_ew + q_u + 2.0) / (2 * q_trip)
    prec = (c_ew + c_u + 2.0) / (2 * c_trip)
    return tuple(
        [2.0 * rec * prec / (rec + prec)] + _wild_tiebreaks(matched, unified, cap_children)
    )


# m7/m9 (= v07/v09) disable unification: the reference overrides the
# constraint tree with all-'E' (similarity_v07/v09:2034-2054)
_SCORERS = {"m4": _scores_m4, "m6": _scores_m6, "m7": _scores_m7,
            "m8": _scores_m8, "m9": _scores_m9, "m10": _scores_m10}
_EXACT_ONLY = {"m7", "m9"}


def subtree_similarity(
    query_slt: str,
    cand_slt: str,
    constraints: Optional[Dict[str, Constraint]] = None,
    scoring: str = "m4",
) -> tuple:
    """Best-alignment score vector. scoring='m4' is the reference's
    similarity_v11 (the NTCIR-12 submission metric); 'm6' is
    similarity_v06. Greedy covering: alignment roots are enumerated in
    (query DFS x candidate DFS) order and a root already covered by an
    earlier alignment is skipped (reference matching_v06:1890-1911)."""
    q_root, c_root = parse_slt(query_slt), parse_slt(cand_slt)
    scorer = _SCORERS[scoring]
    if q_root is None or c_root is None:
        return (0.0, 0, 0)
    constraints = constraints or {}
    q_nodes = list_nodes(q_root)
    c_nodes = list_nodes(c_root)
    q_size, c_size = len(q_nodes), len(c_nodes)

    if scoring in _EXACT_ONLY:
        exact = Constraint(unifiable=False)
        constraints = {loc: exact for _, loc in q_nodes}
    restricted = frozenset(
        n.tag for n, loc in q_nodes
        if n.tag.startswith("V!") and not constraints.get(loc, _DEFAULT).unifiable
    )
    roots = [
        (qn, ql, cn, cl)
        for qn, ql in q_nodes
        for cn, cl in c_nodes
        if constraints.get(ql, _DEFAULT).allows(qn.tag, cn.tag)
    ]
    pending = {(ql, cl) for _, ql, _, cl in roots}

    best = None
    for qn, ql, cn, cl in roots:
        if (ql, cl) not in pending:
            continue
        matched, unified, caps, children = _test_root(
            qn, ql, cn, cl, constraints, restricted, c_root, pending
        )
        scores = scorer(matched, unified, caps, children, q_size, c_size, q_root, c_root)
        if best is None or scores > best:
            best = scores
    # reference choose_best_match returns [0.0, 0, 0] whenever no
    # alignment exists, regardless of metric (ranking_functions.py:1913)
    if best is None:
        return (0.0, 0, 0)
    return best
