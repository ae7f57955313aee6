"""NTCIR topic parsing against the reference's own query files."""

import os

import pytest

from tangent_spark.sources.topics import parse_topics_file, topics_to_slts

QDIR = "/root/reference/tangent_code/tangent/testing/test_queries"
HAVE = os.path.isdir(QDIR)


@pytest.mark.skipif(not HAVE, reason="reference topics not present")
def test_ntcir11_topics():
    topics = parse_topics_file(f"{QDIR}/NTCIR11-Math-queries.xml")
    assert len(topics) == 100
    assert topics[0].num == "NTCIR11-Math-1"
    assert all(t.formulas for t in topics)
    slts = topics_to_slts(topics)
    ok = [s for _, s in slts if s]
    # the vast majority of presentation-MathML formulas must convert
    assert len(ok) / len(slts) > 0.9, f"{len(ok)}/{len(slts)} converted"


@pytest.mark.skipif(not HAVE, reason="reference topics not present")
def test_wildcard_topics_have_qvars():
    topics = parse_topics_file(f"{QDIR}/Wildcard-test.xml")
    assert topics
    slts = [s for _, s in topics_to_slts(topics) if s]
    assert any("?" in s for s in slts), slts


@pytest.mark.skipif(not HAVE, reason="reference topics not present")
def test_mathwiki_topics_keywords():
    topics = parse_topics_file(f"{QDIR}/NTCIR12-MathWiki-queries-participants.xml")
    assert len(topics) >= 30
    assert any(t.keywords for t in topics)
