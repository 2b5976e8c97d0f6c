"""HTML / binary ingestion helpers (reference preprocessing surface).

The reference's WARC preprocessing (workload/minhash_dedupe.py:50-76) needs
three row transforms; the input_hint table makes them optional (extracted
``text`` arrives pre-computed, byte-identical per url), but the engine keeps
them available for raw-HTML ingest:

- ``remove_http_headers`` (reference :22-29, pinned tests:43-70): split on
  first CRLFCRLF, body-or-empty — pure Catalyst.
- ``lenient_utf8_decode`` (reference ``try_decode`` :57): binary→string with
  invalid sequences replaced — one pandas UDF (Spark's ``decode`` raises
  under ANSI on malformed input; the reference nulls it).
- ``html_to_text`` (reference ``extract_blocks`` :31-43 used selectolax):
  deterministic tag-stripping text extraction as a Catalyst regexp chain —
  drops script/style/noscript subtrees, strips tags, unescapes the common
  entities, collapses whitespace. Not a DOM parser (no CSS selectors), but
  zero-Python and adequate for block-level text recovery; swap in a real
  parser UDF when one is provisioned.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def remove_http_headers(col: Column) -> Column:
    """Body after the first CRLFCRLF, else empty string; null → empty."""
    parts = F.split(col, r"\r\n\r\n", 2)
    return F.coalesce(
        F.when(F.size(parts) > 1, F.element_at(parts, 2)).otherwise(F.lit("")),
        F.lit(""),
    )


@F.pandas_udf(T.StringType())
def lenient_utf8_decode(b: pd.Series) -> pd.Series:
    """binary → utf-8 string, U+FFFD for invalid bytes, None stays None."""
    return b.map(lambda x: x.decode("utf-8", errors="replace") if x is not None else None)


_BLOCK_TAGS = r"(?i)</(?:p|div|section|article|main|li|h[1-6]|td|th|tr|table|blockquote|figcaption|caption|pre|summary|title|br)>"


def html_to_text(col: Column) -> Column:
    """Visible text of an HTML document as one whitespace-normalized string."""
    out = F.regexp_replace(col, r"(?is)<(script|style|noscript)\b.*?</\1>", " ")
    out = F.regexp_replace(out, r"(?is)<!--.*?-->", " ")
    out = F.regexp_replace(out, _BLOCK_TAGS, "\n")
    out = F.regexp_replace(out, r"(?s)<[^>]*>", " ")
    for ent, rep in [("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")]:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))
