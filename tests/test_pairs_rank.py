"""Live parity for the pair-multiset rerank metrics v00/v02/v03
(operators/pairs_rank) against the reference implementation, over both
a hand-mixed SLT battery and corpus-drawn expressions, at several
window sizes. Also pins the input contract: our pairs(..., eol='none')
must equal the reference's MathSymbol.get_pairs byte-for-byte."""

import itertools
import os
import sys
import types

import pytest

from tangent_spark.operators.pairs_rank import (
    similarity_v00,
    similarity_v02,
    similarity_v03,
)
from tangent_spark.operators.slt import pairs, parse_slt

REF = "/root/reference/tangent_code"
HAVE = os.path.isdir(REF)


def _ref():
    if "bs4" not in sys.modules:
        fake = types.ModuleType("bs4")
        fake.BeautifulSoup = None
        sys.modules["bs4"] = fake
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from tangent.math.symboltree import SymbolTree
    from tangent.ranking import ranking_functions as rf

    return SymbolTree, rf


SLTS = [
    "[V!x]", "[N!2]", "[V!x,a[N!2]]", "[V!x[+[V!y]]]",
    "[V!y[=[V!z]],a[N!2]]", "[F!,o[V!x],u[V!y[+[N!1]]]]",
    "[F!,o[V!a],u[V!b[+[N!3]]]]", "[R!,w[V!x[+[N!1]]]]",
    "[∑,o[V!n],u[V!i[=[N!1]]]]", "[M!()1x2,w[V!x[&comma;],e[V!y]]]",
    "[M!()2x2,w[V!a,e[N!1,e[N!2,e[V!b]]]]]",
    "[V!x,a[N!2],b[V!i]]", "[V!x[+[N!1[+[V!y,a[N!2]]]]]]",
    "[V!a[+[V!b[+[V!a[+[V!b]]]]]]]",  # repeated vars: unification stress
    "[N!3[+[N!4[=[N!7]]]]]",          # constants collapse in v03
]


@pytest.mark.skipif(not HAVE, reason="reference absent")
@pytest.mark.parametrize("window", [1, 2, 4, 0])
def test_get_pairs_contract(window):
    """Byte-identical modulo rel-path run-length encoding: the reference's
    Python get_pairs RLEs rel when >5 chars ('nnnnnn'->'6n') while our
    pairs() keeps rel raw (the C++ index-time form). RLE is a bijection,
    so every count-capped match below is unaffected; normalize here."""
    from tangent_spark.operators.slt import rle

    SymbolTree, _ = _ref()
    for slt in SLTS:
        ref = sorted(SymbolTree.parse_from_slt(slt).root.get_pairs("", window))
        mine = sorted(
            (f, t, rle(r), loc) for f, t, r, loc in pairs(parse_slt(slt), window, "none")
        )
        assert mine == ref, (slt, window)


@pytest.mark.skipif(not HAVE, reason="reference absent")
@pytest.mark.parametrize("window", [2, 4])
def test_v00_v02_v03_parity(window):
    SymbolTree, rf = _ref()
    for q, c in itertools.product(SLTS, SLTS):
        pq = SymbolTree.parse_from_slt(q).root.get_pairs("", window)
        pc = SymbolTree.parse_from_slt(c).root.get_pairs("", window)
        mq = list(pairs(parse_slt(q), window, "none"))
        mc = list(pairs(parse_slt(c), window, "none"))

        want = rf.similarity_v00(pq, pc)[0]
        got = similarity_v00(mq, mc)
        assert got == pytest.approx(tuple(want), abs=1e-12), ("v00", q, c)

        if pq and pc:
            want = rf.similarity_v02(pq, pc)[0]
            got = similarity_v02(mq, mc)
            assert got == pytest.approx(tuple(want), abs=1e-12), ("v02", q, c)

            want = rf.similarity_v03(pq, pc)[0]
            got = similarity_v03(mq, mc)
            assert got == pytest.approx(tuple(want), abs=1e-12), ("v03", q, c)


@pytest.mark.skipif(not HAVE, reason="reference absent")
def test_parity_corpus():
    from tangent_spark.corpus import make_page
    from tangent_spark.operators.slt import mathml_to_slt
    from tangent_spark.sources.extract import extract_math

    SymbolTree, rf = _ref()
    slts = []
    for i in range(120):
        for block in extract_math(make_page(i)["html"]):
            s = mathml_to_slt(block)
            if s:
                slts.append(s)
    slts = sorted(set(slts))[:18]
    assert len(slts) >= 10
    for q in slts[:6]:
        for c in slts:
            pq = SymbolTree.parse_from_slt(q).root.get_pairs("", 4)
            pc = SymbolTree.parse_from_slt(c).root.get_pairs("", 4)
            mq = list(pairs(parse_slt(q), 4, "none"))
            mc = list(pairs(parse_slt(c), 4, "none"))
            assert similarity_v00(mq, mc) == pytest.approx(tuple(rf.similarity_v00(pq, pc)[0]))
            if pq and pc:
                assert similarity_v02(mq, mc) == pytest.approx(tuple(rf.similarity_v02(pq, pc)[0]))
                assert similarity_v03(mq, mc) == pytest.approx(tuple(rf.similarity_v03(pq, pc)[0]))
