"""Golden + live parity for the v06-family reranker (operators/mss_subtree).

1. GOLDEN: subtree_similarity(scoring='m4') must reproduce the score of
   every R line of the reference's shipped NTCIR-12 reranked submission
   file reranked_paper_m4_w0_e2.tsv (produced by similarity_v11 =
   matching_v06 + scoring_m4; verified by running the reference's own
   v04/v06/v11 on the file: v11 has 0 mismatches, v04 622, v06 3575).
   All 40 queries — including the wildcard queries — x every unique
   candidate expression: 3,940 pairs, exact to 1e-9.

2. LIVE: full score-VECTOR parity (not just score[0]) for both m4/v11
   and m6/v06 against the reference implementation imported with a bs4
   shim, over a mixed battery of concrete / wildcard / matrix SLTs.
"""

import csv
import itertools
import os
import sys
import types

import pytest

from tangent_spark.operators.mss_subtree import subtree_similarity

GOLDEN = (
    "/root/reference/results/Wikipedia/Task_FormulaBrowing/"
    "reranked_output/reranked_paper_m4_w0_e2.tsv"
)
REF = "/root/reference/tangent_code"


def _load_golden():
    queries = []
    with open(GOLDEN, encoding="utf-8") as f:
        qname, cur = None, None
        for row in csv.reader(
            f, delimiter="\t", quoting=csv.QUOTE_NONE, escapechar="\\"
        ):
            if not row:
                continue
            if row[0] == "Q":
                qname = row[1]
            elif row[0] == "E":
                cur = (qname, row[1], [])
                queries.append(cur)
            elif row[0] == "R":
                cur[2].append((row[3], float(row[4])))
    return queries

_GOLDEN_QUERIES = _load_golden() if os.path.exists(GOLDEN) else []


@pytest.mark.skipif(not _GOLDEN_QUERIES, reason="golden file absent")
@pytest.mark.parametrize(
    "qname,qslt,rows",
    [(q, s, r) for q, s, r in _GOLDEN_QUERIES],
    ids=[q for q, _, _ in _GOLDEN_QUERIES],
)
def test_v11_matches_shipped_submission(qname, qslt, rows):
    seen = set()
    for cand, want in rows:
        if cand in seen:
            continue
        seen.add(cand)
        got = subtree_similarity(qslt, cand, scoring="m4")[0]
        assert got == pytest.approx(want, abs=1e-9), (qname, cand)


# --- live full-vector parity ------------------------------------------------

def _ref_metrics():
    if "bs4" not in sys.modules:
        fake = types.ModuleType("bs4")
        fake.BeautifulSoup = None
        sys.modules["bs4"] = fake
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from tangent.math.symboltree import SymbolTree
    from tangent.ranking.query import Query
    from tangent.ranking import ranking_functions as rf

    fns = {"m4": rf.similarity_v11, "m6": rf.similarity_v06,
           "m7": rf.similarity_v07, "m8": rf.similarity_v08,
           "m9": rf.similarity_v09, "m10": rf.similarity_v10}

    def score(metric, q_slt, c_slt):
        q = SymbolTree.parse_from_slt(q_slt)
        c = SymbolTree.parse_from_slt(c_slt)
        cons = Query.create_default_constraints(q)
        return tuple(fns[metric](q, c, cons)[0])

    return score


SLTS = [
    "[V!x]", "[N!2]", "[V!x,a[N!2]]", "[V!x[+[V!y]]]",
    "[V!y[=[V!z]],a[N!2]]", "[F!,o[V!x],u[V!y[+[N!1]]]]",
    "[F!,o[V!a],u[V!b[+[N!3]]]]", "[R!,w[V!x[+[N!1]]]]",
    "[∑,o[V!n],u[V!i[=[N!1]]]]", "[M!()1x2,w[V!x[&comma;],e[V!y]]]",
    "[M!()2x2,w[V!a,e[N!1,e[N!2,e[V!b]]]]]",
    "[M!()2x2,w[V!x,e[N!1,e[N!3,e[V!y]]]]]",
    "[V!x,a[N!2],b[V!i]]", "[?w,a[N!2]]", "[?u[+[?v]]]",
    "[T!if[V!z]]",
    "[?a[+[N!1[+[?b]]]]]",          # repeated-wildcard consistency
    "[?x]",                          # bare wildcard: left+right expansion
    "[V!x[+[N!1[+[V!y,a[N!2]]]]]]",
    "[M!()1x1,w[?z]]",               # wildcard matrix
    "[?m[=[V!q]]]",
]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")
@pytest.mark.parametrize("metric", ["m4", "m6", "m7", "m8", "m9", "m10"])
def test_live_vector_parity(metric):
    ref = _ref_metrics()
    for q, c in itertools.product(SLTS, SLTS):
        try:
            want = ref(metric, q, c)
        except Exception:
            continue  # reference crashes on degenerate m6 tie-breaks
        got = subtree_similarity(q, c, scoring=metric)
        assert len(got) == len(want), (metric, q, c, got, want)
        for a, b in zip(got, want):
            assert a == pytest.approx(b, abs=1e-10), (metric, q, c, got, want)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")
def test_live_vector_parity_corpus():
    """Pairs drawn from the synthetic corpus expressions (concrete SLTs
    with matrices/scripts as emitted by our own extractor)."""
    from tangent_spark.corpus import make_page
    from tangent_spark.operators.slt import mathml_to_slt
    from tangent_spark.sources.extract import extract_math

    slts = []
    for i in range(120):
        for block in extract_math(make_page(i)["html"]):
            s = mathml_to_slt(block)
            if s:
                slts.append(s)
    slts = sorted(set(slts))[:20]
    assert len(slts) >= 10
    ref = _ref_metrics()
    for q in slts[:6]:
        for c in slts:
            want = ref("m4", q, c)
            got = subtree_similarity(q, c, scoring="m4")
            assert got == pytest.approx(want), (q, c)
