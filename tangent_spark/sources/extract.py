"""HTML text + math extraction (reference S4/S6, SURVEY.md §2.1).

The per-row invariant required by BASELINE.json input_hint: extracted
text is byte-identical per url between the distributed pandas-UDF path
and the single-process pure-Python path — guaranteed here because both
call the very same pure functions (no library whose version could
drift: regex + html.unescape only; the reference's BeautifulSoup step
is re-done with deterministic regex handling, reference
math_extractor.py:23-36,42-73 semantics).
"""

from __future__ import annotations

import html as _html
import re
from typing import List

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# <math ...> ... </math>, optionally namespace-prefixed (e.g. <m:math>),
# case-insensitive, non-greedy across newlines.
_MATH_RE = re.compile(
    r"<(?:[A-Za-z_][\w.-]*:)?math(?:\s[^>]*)?>.*?</(?:[A-Za-z_][\w.-]*:)?math>",
    re.DOTALL | re.IGNORECASE,
)
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)(?:\s[^>]*)?>.*?</\1\s*>", re.DOTALL | re.IGNORECASE
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_NS_PREFIX_RE = re.compile(r"(</?)[A-Za-z_][\w.-]*:")


def _to_str(content) -> str:
    if content is None:
        return ""
    if isinstance(content, (bytes, bytearray)):
        return bytes(content).decode("utf-8", errors="replace")
    return str(content)


def extract_text(content) -> str:
    """HTML/bytes -> plain text. Deterministic: strip comments, script/
    style, math blocks, all tags; unescape entities; collapse whitespace."""
    s = _to_str(content)
    s = _COMMENT_RE.sub(" ", s)
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _MATH_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


def extract_math(content) -> List[str]:
    """HTML/bytes -> list of <math> blocks with namespace prefixes
    stripped (reference math_tokens: namespace-stripped MathML strings,
    keeping mws:qvar wildcards intact)."""
    s = _to_str(content)
    out = []
    for m in _MATH_RE.finditer(s):
        block = m.group(0)
        # strip ns prefixes on tags except the mws:qvar wildcard marker
        block = _NS_PREFIX_RE.sub(
            lambda mo: mo.group(0) if mo.group(0).lower().endswith("mws:") else mo.group(1),
            block,
        )
        out.append(block)
    return out


# --- Spark-side (vectorized) -------------------------------------------------

@F.pandas_udf(T.StringType())
def extract_text_udf(html_col: pd.Series) -> pd.Series:
    return html_col.map(extract_text)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_math_udf(html_col: pd.Series) -> pd.Series:
    return html_col.map(extract_math)
