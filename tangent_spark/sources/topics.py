"""NTCIR topic XML parser — the reference's query entry point
(reference query.py:96-184 with BeautifulSoup; re-done with
ElementTree + the same regex normalization the extractor uses).

Topics contain <num>, <formula> elements wrapping <m:math> (usually a
<semantics> pair of Content MathML + an annotation-xml holding
Presentation MathML — the S6 isolation step keeps the presentation
side), and <keyword> terms. Output formulas are namespace-stripped
MathML strings directly consumable by operators/slt.parse_mathml and
plans/formula.dice_topk_exprs.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import List

from tangent_spark.operators.slt import _PREFIX_RE, _XMLNS_RE, mathml_to_slt


@dataclass
class Topic:
    num: str
    formulas: List[str] = field(default_factory=list)
    keywords: List[str] = field(default_factory=list)


def _isolate_pmml(math: ET.Element) -> ET.Element:
    """S6: inside <semantics>, keep the MathML-Presentation annotation's
    content (reference math_extractor.isolate_pmml, lines 76-109);
    otherwise return the math element unchanged."""
    kids = list(math)
    if len(kids) == 1 and kids[0].tag == "semantics":
        sem = kids[0]
        for ann in sem:
            if ann.tag == "annotation-xml" and (
                ann.attrib.get("encoding") == "MathML-Presentation"
            ):
                new_math = ET.Element("math")
                for ch in list(ann):
                    new_math.append(ch)
                return new_math
        # no presentation annotation: fall back to first child (the
        # reference's semantics handling)
        new_math = ET.Element("math")
        new_math.append(kids[0])
        return new_math
    return math


def parse_topics(xml_text: str) -> List[Topic]:
    s = _XMLNS_RE.sub("", xml_text)
    s = _PREFIX_RE.sub(r"\1", s)
    # xml:id attributes survive prefix-stripping as invalid 'xml:id' names
    s = s.replace("xml:id=", "xmlid=")
    root = ET.fromstring(s)
    topics: List[Topic] = []
    for t in root.iter("topic"):
        num_el = t.find("num")
        topic = Topic(num=num_el.text.strip() if num_el is not None and num_el.text else "")
        for f in t.iter("formula"):
            math = f.find("math")
            if math is None:
                continue
            iso = _isolate_pmml(math)
            topic.formulas.append(ET.tostring(iso, encoding="unicode"))
        for k in t.iter("keyword"):
            if k.text and k.text.strip():
                topic.keywords.append(k.text.strip())
        topics.append(topic)
    return topics


def parse_topics_file(path: str) -> List[Topic]:
    with open(path, encoding="utf-8") as f:
        return parse_topics(f.read())


def topics_to_slts(topics: List[Topic]) -> List[tuple]:
    """[(num, slt or None per formula)] — conversion failures are None
    (the reference counts those per run log)."""
    out = []
    for t in topics:
        for fm in t.formulas:
            out.append((t.num, mathml_to_slt(fm)))
    return out
