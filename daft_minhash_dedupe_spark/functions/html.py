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
- ``extract_blocks`` + ``explode_blocks`` (reference :31-43 and :63-74):
  selector-level *block list* extraction with per-block explode and
  ``block_id = id || '-' || idx`` — block-granularity dedup parity. Stdlib
  ``html.parser`` instead of selectolax (not provisioned here); the pinned
  reference cases (2 blocks, "Hello world .", noscript dropped) pass.
- ``html_to_text``: whole-document text as a zero-Python Catalyst regexp
  chain — the cheap path when block granularity isn't needed.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column, DataFrame
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


@F.pandas_udf(T.StringType())
def _utf8_decode_or_null(b: pd.Series) -> pd.Series:
    def dec(x):
        if x is None:
            return None
        try:
            return x.decode("utf-8")
        except UnicodeDecodeError:
            return None

    return b.map(dec)


def utf8_decode(col: Column, errors: str = "replace") -> Column:
    """binary → utf-8 string with a choice of malformed-byte semantics.

    ``errors='replace'`` keeps corrupt payloads, substituting U+FFFD (the
    engine's lenient default — one bad byte should not drop a crawl record);
    ``errors='null'`` nulls the whole payload instead, matching the
    reference's ``try_decode("utf-8")`` keep/drop behavior
    (workload/minhash_dedupe.py:57). None in → None out in both modes.
    """
    if errors == "replace":
        return lenient_utf8_decode(col)
    if errors == "null":
        return _utf8_decode_or_null(col)
    raise ValueError(f"errors must be 'replace' or 'null', got {errors!r}")


# -- selector-level block extraction (reference extract_blocks parity) --------
#
# Mirrors reference workload/minhash_dedupe.py:31-43 (selectolax): decompose
# script/style/noscript, then for each element matching the selector list emit
# node.text(separator=" ", strip=True); empty blocks dropped; document order.
# The reference list also names img[alt] and the meta description/og selectors,
# but those are void elements — node.text() is always "" and filtered out, so
# they can never produce a block and are omitted here.  th/td match only inside
# a <table> ("table th, table td").  Nested matches emit BOTH texts (a div and
# a p inside it), exactly like tree.css().
_BLOCK_SELECTOR_TAGS = frozenset(
    {"title", "article", "main", "p", "h1", "h2", "h3", "h4", "h5", "h6",
     "li", "div", "section", "figcaption", "caption", "pre", "code", "summary"}
)
_TABLE_CELL_TAGS = frozenset({"th", "td"})
_SKIP_TAGS = frozenset({"script", "style", "noscript"})
_VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input",
     "link", "meta", "param", "source", "track", "wbr"}
)
# HTML5 implied end tags (the subset that matters for text blocks): an open
# <p> closes when any of these block-level elements starts; li/td/th/tr close
# on their own siblings. selectolax gets this from its HTML5 tree builder;
# stdlib HTMLParser needs it spelled out for real-world (unclosed-tag) pages.
_P_CLOSERS = frozenset(
    {"address", "article", "aside", "blockquote", "div", "dl", "fieldset",
     "figcaption", "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5",
     "h6", "header", "hr", "main", "nav", "ol", "p", "pre", "section",
     "table", "ul"}
)


class _BlockExtractor(HTMLParser):
    """Streaming block extractor: a stack of open collectors; each text node
    is stripped and appended to every open matching ancestor (selectolax
    ``text(separator=" ", strip=True)`` semantics). Lenient about unclosed
    tags (pop-until-match; leftovers flushed at EOF)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._stack: list[list] = []  # [tag, order | None, parts | None]
        self._blocks: list[tuple[int, str]] = []
        self._skip = 0
        self._table_depth = 0
        self._order = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
            return
        if tag in _VOID_TAGS:
            return
        if tag == "table":
            self._table_depth += 1
        while self._stack:
            top = self._stack[-1][0]
            if (
                (top == "p" and tag in _P_CLOSERS)
                or (top == "li" and tag == "li")
                or (top in ("td", "th") and tag in ("td", "th", "tr"))
                or (top == "tr" and tag == "tr")
            ):
                self._finish(self._stack.pop())
            else:
                break
        collects = self._skip == 0 and (
            tag in _BLOCK_SELECTOR_TAGS
            or (tag in _TABLE_CELL_TAGS and self._table_depth > 0)
        )
        self._stack.append([tag, self._order if collects else None,
                            [] if collects else None])
        self._order += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if tag in _VOID_TAGS:
            return
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                while len(self._stack) > i:
                    self._finish(self._stack.pop())
                if tag == "table":
                    self._table_depth = max(0, self._table_depth - 1)
                return
        # stray end tag: ignore

    def handle_data(self, data):
        if self._skip:
            return
        s = data.strip()
        if not s:
            return
        for entry in self._stack:
            if entry[2] is not None:
                entry[2].append(s)

    def _finish(self, entry):
        if entry[2] is not None:
            txt = " ".join(entry[2])
            if txt:
                self._blocks.append((entry[1], txt))

    def result(self) -> list[str]:
        while self._stack:
            self._finish(self._stack.pop())
        return [t for _, t in sorted(self._blocks)]


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_blocks(html: pd.Series) -> pd.Series:
    """``list<string>`` of visible text blocks per the reference's selector
    list (pinned: reference tests/test_minhash_dedupe_unit.py:73-127 — exactly
    2 blocks, "Hello world .", noscript dropped). HTML parsing is inherently
    per-row (the reference's daft.func is too); batching is Arrow-level."""

    def _one(h):
        if h is None:
            return []
        p = _BlockExtractor()
        try:
            p.feed(h)
            p.close()
        except Exception:
            pass
        return p.result()

    return html.map(_one)


def explode_blocks(
    df: DataFrame,
    html_col: str = "content_raw",
    id_col: str = "record_id",
    index_col: str = "block_id",
    content_col: str = "block_text",
) -> DataFrame:
    """Block-level ingest stage (reference workload/minhash_dedupe.py:63-74):
    extract blocks, posexplode with index, ``block_id = id || '-' || idx``,
    drop empty/null blocks. Output: (id_col, index_col, content_col) — feed
    straight into MinHashDedupePipeline for block-granularity dedup."""
    ex = df.withColumn("_blocks", extract_blocks(F.col(html_col)))
    # posexplode_OUTER + explicit empty filter: inner posexplode makes
    # InferFiltersFromGenerate push a size()>0 filter below the projection,
    # re-running the extraction UDF a second time on the raw HTML expression
    return (
        ex.select(F.col(id_col), F.posexplode_outer("_blocks").alias("_bidx", content_col))
        .where(F.col(content_col).isNotNull() & (F.col(content_col) != ""))
        .withColumn(
            index_col,
            F.concat(F.col(id_col).cast("string"), F.lit("-"), F.col("_bidx").cast("string")),
        )
        .select(id_col, index_col, content_col)
    )


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
