"""Boilerplate-stripped text extraction from raw HTML.

The north_star requires "boilerplate-stripped text extraction from raw
HTML via vectorized Arrow UDFs (byte-identical per-url to the reference
extractor)". The extraction CONTRACT (canonical, byte-stable):

1. decode bytes as UTF-8 (errors -> replacement char);
2. drop whole boilerplate blocks: <head>, <script>, <style>, <nav>,
   <header>, <footer>, <aside>, and <div class="ad"> ... matching close
   tag (case-insensitive, dot-matches-newline);
3. replace every remaining tag with a single space;
4. unescape the basic HTML entities (&amp; &lt; &gt; &quot; &#39;
   &nbsp; &copy;);
5. collapse all whitespace runs to one space and trim.

Two implementations, asserted byte-identical in tests:
- ``extract_text_expr``  — pure Column expressions (whole-stage codegen,
  the 100 TB hot path: no Python at all);
- ``extract_text_udf``   — Arrow-batched pandas UDF (the input_hint's
  "vectorized pandas/Arrow UDF" form; also the reference oracle).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

_BLOCK_RE = re.compile(
    r"(?is)<head\b.*?</head>|<script\b.*?</script>|<style\b.*?</style>"
    r"|<nav\b.*?</nav>|<header\b.*?</header>|<footer\b.*?</footer>"
    r"|<aside\b.*?</aside>|<div class=\"ad\".*?</div>"
)
_TAG_RE = re.compile(r"(?s)<[^>]*>")
# ASCII whitespace only, to match Java's default \s exactly (byte-stability).
_WS_RE = re.compile(r"[ \t\n\r\f\x0b]+")
_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
    ("&nbsp;", " "), ("&copy;", "©"), ("&amp;", "&"),  # &amp; LAST
]


def extract_text_py(html: bytes | str | None) -> str | None:
    """Canonical byte-stable extractor (oracle reference implementation)."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    s = _BLOCK_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS_RE.sub(" ", s).strip(" \t\n\r\f\x0b")


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized extraction over the binary `html` column."""
    return html.map(extract_text_py, na_action="ignore")


# The same block/tag regexes, Java-regex flavored for JVM execution.
_BLOCK_RE_JAVA = (
    r"(?is)<head\b.*?</head>|<script\b.*?</script>|<style\b.*?</style>"
    r"|<nav\b.*?</nav>|<header\b.*?</header>|<footer\b.*?</footer>"
    r"|<aside\b.*?</aside>|<div class=\"ad\".*?</div>"
)


def extract_text_expr(html: Column) -> Column:
    """JVM-side extractor — identical contract, zero Python in the plan.

    Stays inside whole-stage codegen; prefer this in the hot path and
    keep the pandas UDF for parity testing and exotic inputs.
    """
    s = html.cast("string")  # binary -> UTF-8 string (Spark semantic)
    s = F.regexp_replace(s, _BLOCK_RE_JAVA, " ")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def with_extracted_text(pages: "DataFrame", use_udf: bool = False) -> "DataFrame":  # noqa: F821
    """pages(url, warc_ts, html, text, lang) -> same + `text` filled.

    Honors pre-extracted text when present (the reference trusts its
    source fields the same way); extraction only runs where text is NULL,
    so the expensive path touches the minimal row set.
    """
    extractor = extract_text_udf(F.col("html")) if use_udf else extract_text_expr(F.col("html"))
    return pages.withColumn("text", F.coalesce(F.col("text"), extractor))
