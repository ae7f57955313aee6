"""MSS (v04) parity: my mss_score vs the reference similarity_v04 over
many query/candidate SLT pairs (reference imported with a bs4 shim —
only its import chain needs BeautifulSoup, not the scoring path)."""

import itertools
import sys
import types

import pytest

from tangent_spark.operators.mss import Constraint, mss_score

REF = "/root/reference/tangent_code"


def _ref_v04():
    if "bs4" not in sys.modules:
        fake = types.ModuleType("bs4")
        fake.BeautifulSoup = None
        sys.modules["bs4"] = fake
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from tangent.math.mathsymbol import MathSymbol
    from tangent.math.symboltree import SymbolTree
    from tangent.ranking.constraint_info import ConstraintInfo
    from tangent.ranking.ranking_functions import similarity_v04

    edges = ("next", "above", "below", "over", "under", "pre_above", "pre_below",
             "within", "element")

    def default_constraints(tree):
        def dup(n):
            d = MathSymbol("U")
            for attr in edges:
                c = getattr(n, attr)
                if c is not None:
                    setattr(d, attr, dup(c))
            return d

        root = dup(tree.root)

        def conv(n):
            n.tag = ConstraintInfo.create_from_string(n.tag)
            for attr in edges:
                c = getattr(n, attr)
                if c is not None:
                    conv(c)

        conv(root)
        return SymbolTree(root)

    def score(q_slt, c_slt):
        q = SymbolTree.parse_from_slt(q_slt)
        c = SymbolTree.parse_from_slt(c_slt)
        return tuple(similarity_v04(q, c, default_constraints(q))[0])

    return score


SLTS = [
    "[V!x]",
    "[N!2]",
    "[V!x,a[N!2]]",
    "[V!x[+[V!y]]]",
    "[V!y[=[V!z]],a[N!2]]",
    "[F!,o[V!x],u[V!y[+[N!1]]]]",
    "[F!,o[V!a],u[V!b[+[N!3]]]]",
    "[R!,w[V!x[+[N!1]]]]",
    "[∑,o[V!n],u[V!i[=[N!1]]]]",
    "[M!()1x2,w[V!x[&comma;],e[V!y]]]",
    "[M!()2x2,w[V!a,e[N!1,e[N!2,e[V!b]]]]]",
    "[M!()2x2,w[V!x,e[N!1,e[N!3,e[V!y]]]]]",
    "[V!x,a[N!2],b[V!i]]",
    "[?w,a[N!2]]",
    "[?u[+[?v]]]",
    "[T!if[V!z]]",
]


@pytest.mark.parametrize(
    "q,c", list(itertools.product(SLTS, SLTS))
)
def test_mss_parity(q, c):
    ref = _ref_v04()
    expected = ref(q, c)
    got = mss_score(q, c)
    assert got[0] == pytest.approx(expected[0], abs=1e-12), (q, c)
    assert got[1] == expected[1] and got[2] == expected[2], (q, c, got, expected)


def test_mss_parity_corpus():
    """Pairs drawn from the synthetic corpus expressions."""
    from tangent_spark.corpus import make_page
    from tangent_spark.operators.slt import mathml_to_slt
    from tangent_spark.sources.extract import extract_math

    slts = []
    for i in range(120):
        for block in extract_math(make_page(i)["html"]):
            s = mathml_to_slt(block)
            if s:
                slts.append(s)
    slts = sorted(set(slts))[:25]
    assert len(slts) >= 10
    ref = _ref_v04()
    for q in slts[:8]:
        for c in slts:
            assert mss_score(q, c) == pytest.approx(ref(q, c)), (q, c)


def test_constraint_parse():
    c = Constraint.parse("U!>=2")
    assert c.unifiable and c.min_value == 2 and not c.min_strict
    assert c.allows("N!5", "N!3")
    assert not c.allows("N!5", "N!1")
    e = Constraint.parse("E")
    assert not e.allows("V!x", "V!y")
    assert e.allows("V!x", "V!x")
    t = Constraint.parse("N")
    assert t.allows("?q", "N!7")
    assert not t.allows("?q", "V!x")


def test_exact_self_match():
    for s in SLTS:
        f, neg_un, exact = mss_score(s, s)
        assert f == 1.0
        assert neg_un == 0


def _ref_v05():
    _ref_v04()  # shim + path
    from tangent.math.symboltree import SymbolTree
    from tangent.ranking.query import Query
    from tangent.ranking.ranking_functions import similarity_v05

    def score(q_slt, c_slt):
        q = SymbolTree.parse_from_slt(q_slt)
        c = SymbolTree.parse_from_slt(c_slt)
        return tuple(similarity_v05(q, c, Query.create_default_constraints(q))[0])

    return score


V05_EXTRA = [
    "[?a[+[N!1[+[?b]]]]]", "[?x]",
    "[V!a[+[V!b[+[V!a[+[V!b]]]]]]]",   # multi-alignment + unification merge
    "[N!3[+[N!4[=[N!7]]]]]",
    "[V!x[+[V!y[+[V!z]]]],a[N!2]]",
]


def test_mss_multi_v05_parity():
    """v05 multi-alignment parity: full score vectors vs the reference's
    similarity_v05 over the battery plus merge-stressing extras."""
    from tangent_spark.operators.mss import mss_multi_score

    ref = _ref_v05()
    cases = SLTS + V05_EXTRA
    for q in cases:
        for c in cases:
            want = ref(q, c)
            got = mss_multi_score(q, c)
            for a, b in zip(got, want):
                assert a == pytest.approx(b, abs=1e-10), (q, c, got, want)
