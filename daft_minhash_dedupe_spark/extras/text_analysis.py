"""Text analysis operators for training-data curation — all pure Catalyst
(whole-stage codegen; no Python in any of these paths).

- token counting (whitespace + a BPE-ish regex splitter),
- quality scoring (length / punctuation / stopword / repetition ratios),
- language identification (stopword-marker heuristic over 5 languages),
- document fingerprinting (min-of-rolling-window-hash, i.e. the winnowing
  min over the shingle-hash array the dedup pipeline already computes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from daft_minhash_dedupe_spark.functions.minhash import shingle_hashes, tokens

# tiny per-language marker lexicons (public common stopwords)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "une", "que", "pour"],
    "es": ["el", "los", "las", "de", "y", "es", "una", "que", "por", "con"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "für"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "为"],
}

_EN_STOPWORDS = _LANG_MARKERS["en"] + ["a", "an", "on", "as", "at", "by", "be", "or"]

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (the GPT-2-style pretokenize regex family, simplified to Java regex)
_BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """Approximate BPE token count: count of regex word/number/symbol pieces."""
    return F.size(F.regexp_extract_all(col, F.lit(_BPE_REGEX), 0))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    stripped = F.regexp_replace(col, r"""[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]""", "")
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        (F.length(col) - F.length(stripped)) / F.length(col)
    )


def stopword_ratio(col: Column) -> Column:
    """Fraction of whitespace tokens that are (English) stopwords."""
    toks = tokens(F.lower(col))
    sw = F.array([F.lit(w) for w in _EN_STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(n_sw / F.size(toks))


def distinct_token_ratio(col: Column) -> Column:
    """Lexical diversity: distinct tokens / tokens (low → boilerplate/repetition)."""
    toks = tokens(col)
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.size(F.array_distinct(toks)) / F.size(toks)
    )


def duplicate_ngram_fraction(col: Column, n: int = 3) -> Column:
    """Fraction of within-document n-gram occurrences that are repeats
    (Gopher-style repetition gate, Rae et al. 2021): 1 − distinct/total
    token n-grams; 0.0 when the document has fewer than n tokens.

    Pure Catalyst: per-window xxhash64 over bound token references (window
    identity ↔ hash identity modulo 64-bit collisions — no string n-gram
    allocation). Convenience form — hot paths should materialize the token
    array once and call ``duplicate_ngram_fraction_from_tokens`` (Catalyst
    does not CSE inside transform lambdas, so an inline token split would be
    re-evaluated per window)."""
    return duplicate_ngram_fraction_from_tokens(tokens(col), n)


def duplicate_ngram_fraction_from_tokens(toks: Column, n: int = 3) -> Column:
    """``duplicate_ngram_fraction`` over an already-bound token-array column."""
    nwin = F.size(toks) - (n - 1)
    wins = F.transform(
        F.sequence(F.lit(1), F.greatest(nwin, F.lit(1))),
        lambda i: F.xxhash64(*[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(nwin <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(wins)) / nwin
    )


def quality_score(col: Column) -> Column:
    """Composite heuristic quality score in [0,1] — the usual webtext gates:
    reasonable length, low punctuation density, some lexical diversity."""
    n_tok = whitespace_token_count(col)
    len_ok = F.least(n_tok / F.lit(20.0), F.lit(1.0))  # saturates at 20 tokens
    return F.round(
        len_ok * (1.0 - punct_ratio(col)) * distinct_token_ratio(col), 6
    )


def language_scores(col: Column) -> Column:
    """map<lang, matched-marker count> over the marker lexicons."""
    toks = tokens(F.lower(col))

    def _hits(markers: list[str]):
        arr = F.array([F.lit(w) for w in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    pairs = [
        F.struct(F.lit(lang).alias("lang"), _hits(markers).alias("hits"))
        for lang, markers in _LANG_MARKERS.items()
    ]
    return F.array(*pairs)


def language_id(col: Column) -> Column:
    """argmax language by marker hits; 'und' when nothing matches.

    For zh (no whitespace tokenization) falls back to CJK character presence.
    """
    scores = language_scores(col)
    best = F.array_max(
        F.transform(scores, lambda s: F.struct(s["hits"].alias("hits"), s["lang"].alias("lang")))
    )
    cjk = F.length(F.regexp_replace(col, r"[^一-鿿]", ""))
    return (
        F.when(cjk > F.length(col) * 0.25, F.lit("zh"))
        .when(best["hits"] > 0, best["lang"])
        .otherwise(F.lit("und"))
    )


def doc_fingerprint(col: Column, ngram_size: int = 5) -> Column:
    """Winnowing-style fingerprint: minimum rolling-window (shingle) hash.

    Reuses the dedup pipeline's shingle-hash array; the min over rolling
    windows is a stable, order-insensitive-to-small-edits fingerprint."""
    sh = shingle_hashes(col, ngram_size)
    return F.when(F.size(sh) == 0, F.lit(None).cast("bigint")).otherwise(F.array_min(sh))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass profile with all analysis columns attached."""
    c = F.col(text_col)
    return df.select(
        "*",
        whitespace_token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        char_count(c).alias("n_chars_computed"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(distinct_token_ratio(c), 6).alias("distinct_ratio"),
        quality_score(c).alias("quality"),
        language_id(c).alias("lang_pred"),
        doc_fingerprint(c).alias("fingerprint"),
    )
