"""Score parity against the REAL reference engine outputs.

The reference ships full top-100 result files for 40 NTCIR-12 queries x
15 engine conditions (results/Wikipedia/Task_FormulaBrowing/core_output/
core_w{window}_e{eol}.tsv) with BOTH expressions and scores on every R
line — so we can verify our tuple expansion + Dice scorer reproduces the
C++ engine's scores exactly, without needing the (absent) corpus:
score = 2*cc/(etc+qtc) where cc is the count-capped multiset overlap of
the two expansions (mathindex.cpp:239-246).

Wildcard queries are excluded: the C++ wildcard iterator consumes
shared posting-list remainders in pointer-address order
(mathindexmid.h:134-141), which is not reproducible from the artifacts.
Everything else must match to 6 significant figures.
"""

import math
import os
from collections import Counter

import pytest

from tangent_spark.operators.slt import pairs, parse_slt

GOLDEN_DIR = "/root/reference/results/Wikipedia/Task_FormulaBrowing/core_output"
HAVE = os.path.isdir(GOLDEN_DIR)

# (window, eol) conditions to test; w=0 means unbounded
CONDITIONS = [(4, "small"), (0, "none"), (2, "all"), (1, "small")]
EOL_CODE = {"none": 0, "all": 1, "small": 2}


def _expansion_counts(slt: str, window: int, eol: str, cache: dict) -> Counter:
    key = slt
    got = cache.get(key)
    if got is None:
        got = Counter(
            (fr, to, rel) for fr, to, rel, _ in pairs(parse_slt(slt), window, eol)
        )
        cache[key] = got
    return got


def _parse_results(path: str):
    """Yield (query_slt, [(cand_slt, score), ...]) per query."""
    cur_q = None
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if not parts or not parts[0]:
                continue
            if parts[0] == "E" and cur_q is None:
                cur_q = parts[1]
            elif parts[0] == "Q":
                if cur_q is not None:
                    yield cur_q, rows
                cur_q, rows = None, []
            elif parts[0] == "R":
                rows.append((parts[3], float(parts[4])))
    if cur_q is not None:
        yield cur_q, rows


@pytest.mark.skipif(not HAVE, reason="reference golden results not present")
@pytest.mark.parametrize("window,eol", CONDITIONS)
def test_scores_match_reference_engine(window, eol):
    path = f"{GOLDEN_DIR}/core_w{window}_e{EOL_CODE[eol]}.tsv"
    assert os.path.exists(path), path
    cache: dict = {}
    compared = 0
    skipped_wildcard = 0
    bad = []
    for qslt, results in _parse_results(path):
        if "?" in qslt:
            skipped_wildcard += 1
            continue
        try:
            q_counts = _expansion_counts(qslt, window, eol, cache)
        except Exception as e:  # unparseable golden SLT would be a real bug
            bad.append((qslt[:60], f"query parse failed: {e}"))
            continue
        qtc = sum(q_counts.values())
        seen = set()
        for cand, score in results:
            if cand in seen:
                continue
            seen.add(cand)
            try:
                c_counts = _expansion_counts(cand, window, eol, cache)
            except Exception as e:
                bad.append((cand[:60], f"cand parse failed: {e}"))
                continue
            etc = sum(c_counts.values())
            cc = sum(min(n, c_counts.get(t, 0)) for t, n in q_counts.items())
            mine = 2.0 * cc / (etc + qtc) if (etc + qtc) else 0.0
            if not math.isclose(mine, score, rel_tol=5e-5, abs_tol=5e-7):
                bad.append((cand[:80], f"q={qslt[:40]} mine={mine} golden={score}"))
            compared += 1
    assert not bad, (len(bad), bad[:5])
    assert compared > 500, f"only {compared} golden scores compared"
