"""Benchmark decontamination: find training documents that share any verbatim
n-gram with a benchmark/eval set (the standard 13-gram contamination rule
from the GPT-3 / PaLM data papers — public method).

Same inverted-index shape as substring dedup: hash every n-token window on
BOTH sides, equi-join on the 8-byte window hash, aggregate shared-window
counts per (corpus doc, benchmark doc). The benchmark side is small by
nature (eval sets), so its postings are broadcast — the corpus side is
scanned once, no self-join, no shuffle of the corpus postings.

Scale shape: corpus postings ~ tokens × 8 bytes, streamed through a
broadcast-hash join; output is only the contaminated pairs. ``min_shared``
raises the evidence bar; windows are distinct per doc (set semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from daft_minhash_dedupe_spark.functions.minhash import add_shingles, tokens


def _window_postings(
    df: DataFrame, text_col: str, id_col: str, ngram: int, out_id: str
) -> DataFrame:
    shingled = (
        add_shingles(df, text_col, ngram, "_w")
        .select(F.col(id_col).alias(out_id), "_w")
        .localCheckpoint(eager=False)  # defeat CollapseProject re-evaluation
    )
    return shingled.select(out_id, F.explode("_w").alias("_wh"))


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    ngram: int = 13,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    short_doc_mode: str = "contained",
) -> DataFrame:
    """(id_col, bench_id, n_shared) for every corpus×benchmark pair sharing
    ≥ min_shared verbatim n-token windows (distinct windows; 64-bit hash
    collisions are the only approximation).

    Benchmark docs with fewer than ``ngram`` tokens emit a single whole-doc
    window (the GPT-3/PaLM rule: the contamination n-gram is
    ``min(ngram, len(example))``). Because window hashes are width-specific,
    that whole-doc window only ever matches an equal-width corpus window, so:

    - ``short_doc_mode='contained'`` (default, the published rule): for each
      distinct short benchmark width ``w`` the corpus additionally emits its
      ``w``-token windows, so a short eval example CONTAINED in a longer
      corpus doc is caught. Costs one extra corpus scan per distinct short
      width actually present in the benchmark (≤ ngram-1, usually zero);
      each extra pass keeps only docs with > w tokens — docs of exactly
      ``w`` tokens already emitted the identical whole-doc window in the
      base pass, so nothing is double-counted.
    - ``short_doc_mode='exact'``: short benchmark docs only match corpus
      docs that are token-identical (the raw width-matched shingle rule).
    """
    if short_doc_mode not in ("contained", "exact"):
        raise ValueError(f"unknown short_doc_mode {short_doc_mode!r}")
    c = _window_postings(corpus, text_col, id_col, ngram, id_col)
    b = _window_postings(benchmark, text_col, id_col, ngram, "bench_id")
    if short_doc_mode == "contained":
        n_tok = F.size(tokens(F.col(text_col)))
        short_widths = sorted(
            r[0]
            for r in benchmark.select(n_tok.alias("_n"))
            .where((F.col("_n") > 0) & (F.col("_n") < ngram))
            .distinct()
            .collect()  # bounded: at most ngram-1 distinct values
        )
        for w in short_widths:
            c = c.unionByName(
                _window_postings(
                    corpus.where(n_tok > w), text_col, id_col, w, id_col
                )
            )
    return (
        c.join(F.broadcast(b), "_wh")
        .groupBy(id_col, "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    ngram: int = 13,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    short_doc_mode: str = "contained",
) -> DataFrame:
    """Corpus rows with every contaminated document removed (left-anti on
    the contamination pair set)."""
    pairs = contamination_pairs(
        corpus, benchmark, ngram, min_shared, text_col, id_col, short_doc_mode
    ).select(id_col).distinct()
    return corpus.join(pairs, id_col, "left_anti")
