"""Symbol Layout Trees: MathML -> SLT -> canonical string -> symbol-pair
tuples. Clean-room reimplementation of the Tangent 0.3.1 semantics
(reference: math/mathsymbol.py:267-708 for the parser/canonicalizer,
mathindexmid.h:18-75 for the authoritative index-time tuple expansion,
math/mathml.py:4-39 for the element vocabulary). Pure Python, no
third-party parser — runs inside pandas UDFs and doubles as the test
oracle, so distributed and single-process outputs are identical by
construction.

Node tag conventions (reference mathsymbol.py:374-386,564-684):
  N!x number,  V!x identifier,  T!x text,  M!<fences>RxC matrix/fenced
  group, R! radical, F! fraction, W! whitespace/empty, E!x conversion
  error, ?x query wildcard (qvar), bare string = operator.
Edge labels: n(ext) a(bove) b(elow) o(ver) u(nder) c=pre-above
  d=pre-below w(ithin) e(lement).

Tuple expansion follows the C++ engine (index-time authority): rel is
the raw edge-label path ancestor->descendant (NOT run-length encoded —
mathindexmid.h:35 applies runl only to loc), loc is the edge path
root->ancestor ('-' for the root), RLE'd when longer than 5 chars.
Window counts edges (path length <= window; 0 = unbounded). EOL tuples
(tag, '0!', 'n') are emitted for every node lacking an 'n' child when
the mode enables them: 'all' always, 'small' only for trees of height
<= 1, 'none' never (mathindex.cpp:13-19; shipped default 'small').
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Iterator, List, Optional, Tuple

# edge slots in canonical order: 'n' is serialized inline, the rest as
# ,<label>[...] groups (reference build_str, mathsymbol.py:688-703)
EDGE_ORDER = ("a", "b", "o", "u", "c", "d", "w", "e")
ALL_EDGES = ("n",) + EDGE_ORDER

_CLEAN_MAP = {9: r"\t", 10: r"\n", 13: r"\r", 63: "&quest;", 44: "&comma;",
              91: "&lsqb;", 93: "&rsqb;"}
_INVISIBLE = {"⁡", "⁢", "⁣", "⁤"}

OPEN_FENCES = "({|∥"
CLOSE_FENCES = ")}|∥"


class SLTNode:
    """One symbol; 9 typed child links."""

    __slots__ = ("tag", "n", "a", "b", "o", "u", "c", "d", "w", "e")

    def __init__(self, tag: str):
        self.tag = tag
        for s in ALL_EDGES:
            setattr(self, s, None)

    def edges(self) -> Iterator[Tuple[str, "SLTNode"]]:
        for s in ALL_EDGES:
            ch = getattr(self, s)
            if ch is not None:
                yield s, ch

    def is_leaf_like(self) -> bool:
        return all(getattr(self, s) is None for s in ALL_EDGES)


def _clean(text: Optional[str]) -> str:
    if not text:
        return ""
    t = text.strip().translate(_CLEAN_MAP)
    if t in _INVISIBLE:
        return ""
    return t


def _is_ignorable(node: Optional[SLTNode]) -> bool:
    """W!/'' leaves are dropped from rows (reference ignore_tag,
    mathsymbol.py:277-287)."""
    if node is None:
        return True
    return node.tag in ("W!", "") and node.is_leaf_like()


def _chain(nodes: List[SLTNode], merge: bool = False) -> Optional[SLTNode]:
    """Link a list via 'n' edges; merge=True additionally merges
    abutting same-height matrices (only mrow/mpadded chaining does —
    reference mathsymbol.py:338-348)."""
    if not nodes:
        return None
    head = nodes[0]
    cur = head
    for nxt in nodes[1:]:
        if merge and cur.tag.startswith("M!") and nxt.tag.startswith("M!"):
            merged = _matrix_merge(cur, nxt)
            if merged is not None:
                cur = merged
                continue
        while cur.n is not None:
            cur = cur.n
        cur.n = nxt
        cur = nxt
    return head


def _matrix_merge(m1: SLTNode, m2: SLTNode) -> Optional[SLTNode]:
    """Column-wise merge of two unfenced matrices with equal row count
    (reference matrixMerge, mathsymbol.py:198-234); None -> caller
    falls back to 'n' chaining."""
    r1, x1, c1 = m1.tag[2:].partition("x")
    r2, x2, c2 = m2.tag[2:].partition("x")
    if not (r1.isdecimal() and r1 == r2 and x1 and x2):
        return None
    rows, cols1, cols2 = int(r1), int(c1), int(c2)
    p1, p2 = m1.w, m2.w
    for _ in range(rows):
        for _ in range(cols1 - 1):
            p1 = p1.e
        row2_next = None
        q = p2
        for _ in range(cols2 - 1):
            q = q.e
        next1 = p1.e
        next2 = q.e
        p1.e = p2
        q.e = next1
        p1, p2 = next1, next2
    m1.tag = f"M!{rows}x{cols1 + cols2}"
    return m1


def _make_matrix(rows: List[Optional[SLTNode]], tag_fences: str = "") -> SLTNode:
    """rows (each an 'e'-linked cell chain) -> M!RxC node with all cells
    on one within->element chain, row-major (reference make_matrix,
    mathsymbol.py:237-265)."""
    n_rows = len(rows)
    n_cols = 0
    if n_rows > 0 and rows[0] is not None:
        n_cols = 1
        p = rows[0]
        while p.e is not None:
            n_cols += 1
            p = p.e
    root = SLTNode(f"M!{tag_fences}{n_rows}x{n_cols}")
    if n_rows > 0:
        first = rows[0] if (rows[0] is not None or n_rows == 1) else SLTNode("W!")
        root.w = first
        tail = first
        for r in rows[1:]:
            while tail is not None and tail.e is not None:
                tail = tail.e
            if tail is not None:
                tail.e = r
                if r is not None:
                    tail = r
    return root


def _localname(tag: str) -> str:
    if tag.startswith("{"):
        return tag.rsplit("}", 1)[1]
    if ":" in tag:
        return tag.rsplit(":", 1)[1]
    return tag


# --- element handlers --------------------------------------------------------

def _parse(elem) -> Optional[SLTNode]:
    name = _localname(elem.tag)
    fn = _DISPATCH.get(name)
    if fn is None:
        raise ValueError(f"unknown MathML element <{name}>")
    return fn(elem)


def _parse_children(elem) -> List[Optional[SLTNode]]:
    return [_parse(ch) for ch in elem]


def _row_fallback(elem) -> Optional[SLTNode]:
    """Chain all non-ignorable children via 'n' (the reference's lenient
    handling of malformed script elements)."""
    kids = [k for k in _parse_children(elem) if not _is_ignorable(k)]
    return _chain(kids) if kids else None


def _h_container_first(elem):
    kids = list(elem)
    if not kids:
        return None
    return _parse(kids[0])


def _h_math(elem):
    kids = list(elem)
    if not kids:
        return None
    if len(kids) == 1:
        return _parse(kids[0])
    # reference raises on math with >1 child (mathsymbol.py:314); we treat
    # it as an implicit mrow (modern MathML semantics) — divergence noted.
    return _h_mrow(elem)


def _separates(tag: str, separators) -> bool:
    return tag in separators or (tag == "&comma;" and "," in separators)


def _list_to_matrix(children: List[SLTNode], separators, ) -> SLTNode:
    """Fenced row -> 1xN pseudo-matrix (reference list2matrix,
    mathsymbol.py:100-196). children include the fence nodes."""

    def invisible_matrix(node: SLTNode) -> bool:
        if not node.tag.startswith("M!"):
            return False
        if len(node.tag) > 2 and node.tag[2] in "({|&∥":
            return False
        return all(getattr(node, s) is None for s in ("n", "a", "b", "o", "u", "c", "d"))

    if len(children) < 4 and len(children) > 1 and invisible_matrix(children[1]):
        fence = children[0].tag
        if len(children) == 3:
            fence += children[2].tag
        inner = children[1]
        inner.tag = "M!" + fence + inner.tag[2:]
        return inner

    mnode = SLTNode("M!")
    num_args = 1
    if len(children) > 2:
        if not _separates(children[1].tag, separators):
            mnode.w = children[1]
        else:
            mnode.w = SLTNode("W!")
            if len(children) == 3:
                mnode.w.n = children[1]
            else:
                children = [children[0], None] + children[1:]
        elem = mnode.w
        expr = elem
        if len(children) == 3:  # (fence, linked-row, fence): split on separators
            while expr is not None and expr.n is not None:
                if _separates(expr.n.tag, separators):
                    num_args += 1
                    elem.e = expr.n.n
                    expr.n.n = None
                    elem = elem.e
                    expr = elem
                else:
                    expr = expr.n
        else:  # (fence, expr, expr, ..., fence)
            for k in range(2, len(children) - 1):
                ck = children[k]
                if _separates(ck.tag, separators):
                    num_args += 1
                    while expr.n is not None:
                        expr = expr.n
                    expr.n = ck
                    expr = expr.n
                else:
                    if _separates(expr.tag, separators):
                        elem.e = ck
                        elem = elem.e
                        expr = elem
                    else:
                        while expr.n is not None:
                            expr = expr.n
                        expr.n = ck
        mnode.tag = f"M!{children[0].tag}{children[-1].tag}1x{num_args}"
    else:
        closing = children[-1].tag if len(children) > 1 else ""
        mnode.tag = f"M!{children[0].tag}{closing}"
    return mnode


def _h_mrow(elem):
    kids = [k for k in _parse_children(elem) if not _is_ignorable(k)]
    if not kids:
        return None
    if (
        len(kids) > 2
        and (kids[0].tag in OPEN_FENCES or kids[0].tag == "&lsqb;")
        and (kids[-1].tag in CLOSE_FENCES or kids[-1].tag == "&rsqb;")
    ):
        return _list_to_matrix(kids, ",")
    return _chain(kids, merge=True)


def _h_mfenced(elem):
    kids = [k for k in _parse_children(elem) if not _is_ignorable(k)]
    separators = elem.attrib.get("separators", ",").split()
    opening = elem.attrib.get("open", "(").replace("[", "&lsqb;")
    closing = elem.attrib.get("close", ")").replace("]", "&rsqb;")
    row = [SLTNode(opening)]
    if kids:
        row.append(kids[0])
        for i, k in enumerate(kids[1:]):
            sep = separators[min(i, len(separators) - 1)] if separators else ","
            row.append(SLTNode(sep))
            row.append(k)
    row.append(SLTNode(closing))
    return _list_to_matrix(row, separators)


def _h_token(prefix: str):
    def h(elem):
        content = _clean(elem.text)
        return SLTNode(prefix + content if content != "" else "W!")

    return h


def _h_mo(elem):
    return SLTNode(_clean(elem.text))


def _script(elem, n_args: int, slots_typed: Tuple[str, ...], slots_op: Tuple[str, ...],
            guard_typed: Tuple[str, ...], guard_op: Tuple[str, ...]):
    """Shared msub/msup/msubsup/munder/mover/munderover shape
    (reference mathsymbol.py:391-563): typed bases (N!/V!/.../?) attach
    scripts via a/b; operator bases via o/u; a base that already has a
    'next' or a same-slot attachment is wrapped as a 1x1 matrix."""
    kids = _parse_children(elem)
    if not kids:
        return None
    if len(kids) != n_args:
        return _row_fallback(elem)
    base = kids[0] if not _is_ignorable(kids[0]) else SLTNode("W!")
    typed = base.tag[0] == "?" or (len(base.tag) > 1 and base.tag[1] == "!")
    slots, guards = (slots_typed, guard_typed) if typed else (slots_op, guard_op)
    if base.n is not None or any(getattr(base, g) is not None for g in guards):
        base = _make_matrix([base])
    for slot, script_node in zip(slots, kids[1:]):
        setattr(base, slot, script_node)
    return base


def _h_msub(elem):
    return _script(elem, 2, ("b",), ("u",), ("b",), ("u",))


def _h_msup(elem):
    return _script(elem, 2, ("a",), ("o",), ("a",), ("o",))


def _h_msubsup(elem):
    return _script(elem, 3, ("b", "a"), ("u", "o"), ("b", "a"), ("u", "o"))


def _h_munder(elem):
    return _script(elem, 2, ("u",), ("u",), ("u",), ("u",))


def _h_mover(elem):
    return _script(elem, 2, ("o",), ("o",), ("o",), ("o",))


def _h_munderover(elem):
    return _script(elem, 3, ("u", "o"), ("u", "o"), ("u", "o"), ("u", "o"))


def _h_msqrt(elem):
    kids = _parse_children(elem)
    if not kids:
        return SLTNode("W!")
    root = SLTNode("R!")
    first = kids[0] if (kids[0] is not None or len(kids) == 1) else SLTNode("W!")
    _chain([k for k in [first] + kids[1:] if k is not None])
    root.w = first
    return root


def _h_mroot(elem):
    kids = _parse_children(elem)
    if not kids:
        return None
    if len(kids) == 2:
        root = SLTNode("R!")
        root.w = kids[0]
        root.c = kids[1]
        return root
    return _row_fallback(elem)


def _h_mfrac(elem):
    kids = _parse_children(elem)
    if not kids:
        return None
    if len(kids) == 2:
        root = SLTNode("F!")
        root.o = kids[0]
        root.u = kids[1]
        return root
    return _row_fallback(elem)


def _h_mtd(elem):
    kids = _parse_children(elem)
    root = kids[0] if kids and kids[0] is not None else SLTNode("W!")
    _chain([k for k in [root] + kids[1:] if k is not None])
    return root


def _h_mtr(elem):
    kids = _parse_children(elem)
    if not kids:
        return SLTNode("W!")
    root = kids[0] if kids[0] is not None else SLTNode("W!")
    prev = root
    for k in kids[1:]:
        prev.e = k
        prev = k
    return root


def _h_mtable(elem):
    return _make_matrix(_parse_children(elem))


def _h_menclose(elem):
    root = SLTNode(elem.attrib.get("notation", "longdiv"))
    kids = _parse_children(elem)
    if kids:
        first = kids[0] if (kids[0] is not None or len(kids) == 1) else SLTNode("W!")
        _chain([k for k in [first] + kids[1:] if k is not None])
        root.w = kids[0]
    return root


def _h_mmultiscripts(elem):
    """base {sub sup}* [mprescripts {presub presup}*]
    (reference mathsymbol.py:626-668)."""
    raw = []
    prescript_at = None
    for ch in elem:
        if _localname(ch.tag) == "mprescripts":
            prescript_at = len(raw)
            raw.append(None)
        else:
            raw.append(_parse(ch))
    if not raw:
        return None
    base = raw[0] if not _is_ignorable(raw[0]) else SLTNode("W!")
    ps = prescript_at if prescript_at is not None else len(raw)

    def pick(i, more):
        node = raw[i] if i < len(raw) else None
        if node is not None and node.tag == "W!" and not more:
            return None
        return node

    if ps > 1:
        sub = pick(1, ps > 3)
        sup = pick(2, ps > 3)
        base.b = sub
        base.a = sup
        for i in range(3, ps, 2):
            nxt_sub = pick(i, ps > i + 2)
            nxt_sup = pick(i + 1, ps > i + 2)
            if sub is not None:
                sub.n = nxt_sub
            sub = nxt_sub
            if sup is not None:
                sup.n = nxt_sup
            sup = nxt_sup
    if ps < len(raw) - 2:
        n = len(raw)
        sub = pick(ps + 1, ps < n - 4)
        sup = pick(ps + 2, ps < n - 4)
        base.d = sub
        base.c = sup
        for i in range(ps + 3, n, 2):
            nxt_sub = pick(i, n >= i + 2)
            nxt_sup = pick(i + 1, n >= i + 2)
            if sub is not None:
                sub.n = nxt_sub
            sub = nxt_sub
            if sup is not None:
                sup.n = nxt_sup
            sup = nxt_sup
    return base


def _h_qvar(elem):
    name = elem.attrib.get("name") or _clean(elem.text)
    return SLTNode("?" + name)


def _h_merror(elem):
    return SLTNode("E!" + _clean(elem.text))


def _h_whitespace(elem):
    return SLTNode("W!")


_DISPATCH = {
    "math": _h_math,
    "semantics": _h_container_first,
    "mstyle": _h_container_first,
    "mrow": _h_mrow,
    "mpadded": _h_mrow,
    "mfenced": _h_mfenced,
    "menclose": _h_menclose,
    "mn": _h_token("N!"),
    "mi": _h_token("V!"),
    "mtext": _h_token("T!"),
    "mo": _h_mo,
    "mspace": _h_whitespace,
    "none": _h_whitespace,
    "mphantom": _h_whitespace,
    "msub": _h_msub,
    "msup": _h_msup,
    "msubsup": _h_msubsup,
    "munder": _h_munder,
    "mover": _h_mover,
    "munderover": _h_munderover,
    "msqrt": _h_msqrt,
    "mroot": _h_mroot,
    "mfrac": _h_mfrac,
    "mtd": _h_mtd,
    "mtr": _h_mtr,
    "mtable": _h_mtable,
    "mmultiscripts": _h_mmultiscripts,
    "qvar": _h_qvar,
    "merror": _h_merror,
}

_XMLNS_RE = re.compile(r"\sxmlns(?::\w+)?=\"[^\"]*\"|\sxmlns(?::\w+)?='[^']*'")
_PREFIX_RE = re.compile(r"(</?)[A-Za-z_][\w.-]*:")


def parse_mathml(mathml: str) -> Optional[SLTNode]:
    """MathML string -> SLT root (None for empty math). Namespace
    prefixes/declarations are normalized away up front: elements are
    matched by local name, so <m:math>, <math xmlns=...>, and
    <mws:qvar/> all parse (reference resolves namespaces instead,
    mathsymbol.py:305-307)."""
    s = _XMLNS_RE.sub("", mathml)
    s = _PREFIX_RE.sub(r"\1", s)
    elem = ET.fromstring(s)
    return _parse(elem)


# --- canonical string --------------------------------------------------------

def to_string(node: Optional[SLTNode]) -> str:
    """Canonical bracketed form (reference build_str,
    mathsymbol.py:688-703): [tag <next-inline> ,<label>[...]* ]."""
    if node is None:
        return ""
    out: List[str] = []
    _build(node, out)
    return "".join(out)


def _build(node: SLTNode, out: List[str]) -> None:
    out.append("[")
    out.append(node.tag)
    if node.n is not None:
        _build(node.n, out)
    for label in EDGE_ORDER:
        ch = getattr(node, label)
        if ch is not None:
            out.append("," + label)
            _build(ch, out)
    out.append("]")


def parse_slt(s: str) -> Optional[SLTNode]:
    """Inverse of to_string (the C++ engine's parseExpr,
    mathindexmid.h:41-66). Grammar:
        node := '[' tag body ']'
        body := node?  ( ',' label node )*
    where the un-labeled inner node is the 'n' child."""
    if not s:
        return None
    pos = [0]

    def parse_node() -> SLTNode:
        if s[pos[0]] != "[":
            raise ValueError(f"expected '[' at {pos[0]} in {s!r}")
        pos[0] += 1
        end = _next_ctl(s, pos[0])
        tag = s[pos[0] : end]
        node = SLTNode(tag)
        pos[0] = end
        if s[pos[0]] == "[":
            node.n = parse_node()
        while s[pos[0]] == ",":
            pos[0] += 1
            label = s[pos[0]]
            pos[0] += 1
            setattr(node, label, parse_node())
        if s[pos[0]] != "]":
            raise ValueError(f"expected ']' at {pos[0]} in {s!r}")
        pos[0] += 1
        return node

    root = parse_node()
    return root


def _next_ctl(s: str, i: int) -> int:
    for j in range(i, len(s)):
        if s[j] in "[,]":
            return j
    raise ValueError(f"unterminated SLT string {s!r}")


# --- tuple expansion (T6/T7) ---------------------------------------------------

def rle(s: str) -> str:
    """Run-length encode when longer than 5 chars ('nnnnnn' -> '6n';
    reference rlencode/runl, mathsymbol.py:41-48, mathindexmid.h:20)."""
    if len(s) < 6:
        return s
    return re.sub(r"(.)\1*", lambda m: f"{len(m.group(0))}{m.group(1)}", s)


def height_gt(node: SLTNode, h: int) -> bool:
    """True if tree height (edges, ALL edge kinds including 'n') > h."""
    if h <= 0 and any(True for _ in node.edges()):
        return True
    return any(height_gt(ch, h - 1) for _, ch in node.edges())


def pairs(
    root: SLTNode,
    window: int = 4,
    eol_mode: str = "small",
    dist_vert: bool = False,
    max_pair_len: int = 200,
) -> List[Tuple[str, str, str, str]]:
    """All symbol-pair tuples (fr, to, rel, loc) of the tree, matching
    the C++ index-time expansion (mathindexmid.h:34-36): rel raw, loc
    RLE'd, window counts edges, EOL tuples per eol_mode. Pairs longer
    than max_pair_len chars are dropped (reference symboltree.py:40-48).

    dist_vert=True emits the alternative '#DISTVERT' relation encoding
    '<len>.<vert>' (a/c: +1, b/d: -1, n/w/e: 0; mathindex.cpp:50-58) —
    the '(symbol1, symbol2, vertical-distance, horizontal-distance)'
    tuple form. The reference crashes on o/u there (predates the
    over/under split); we extend with o: +1, u: -1.
    """
    eob = eol_mode == "all" or (eol_mode == "small" and not height_gt(root, 1))
    out: List[Tuple[str, str, str, str]] = []

    def emit(fr: str, to: str, rel: str, loc: str) -> None:
        if dist_vert:
            if to == "0!":
                rel = "0.0"
            else:
                v = 0
                for ch in rel:
                    if ch in "aco":
                        v += 1
                    elif ch in "bdu":
                        v -= 1
                rel = f"{len(rel)}.{v}"
        t = (fr, to, rel, loc)
        if sum(len(x) for x in t) <= max_pair_len:
            out.append(t)

    def descend(node: SLTNode, anc_tag: str, rel: str, w: int) -> None:
        for label, ch in node.edges():
            r = rel + label
            if not (label == "w" and ch.tag == "E!"):
                emit(anc_tag, ch.tag, r, cur_loc)
            if w - 1 > 0 or w == 0:
                descend(ch, anc_tag, r, w - 1 if w else 0)

    def walk(node: SLTNode, loc: str, is_root: bool) -> None:
        nonlocal cur_loc
        cur_loc = rle("-" if is_root else loc)
        descend(node, node.tag, "", window)
        if node.n is None and node.tag != "E!" and eob:
            emit(node.tag, "0!", "n", cur_loc)
        for label, ch in node.edges():
            walk(ch, ("" if is_root else loc) + label, False)

    cur_loc = "-"
    walk(root, "", True)
    return out


def mathml_to_slt(mathml: str) -> Optional[str]:
    """Convenience: MathML -> canonical SLT string (None if unparseable
    or empty — reference counts these as conversion failures)."""
    try:
        node = parse_mathml(mathml)
    except (ET.ParseError, ValueError):
        return None
    return to_string(node) if node is not None else None
