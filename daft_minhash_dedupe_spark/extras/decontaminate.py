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


def fuzzy_contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    ngram: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, bench_id, jaccard) for corpus×benchmark pairs whose DISTINCT
    n-gram shingle sets have Jaccard ≥ threshold — the paraphrase-robust
    complement of the verbatim rule above (the PaLM-style "high overlap
    ratio" contamination criterion, vs GPT-3's any-13-gram hit).

    EXACT (no LSH/MinHash approximation, so it is SQL-adjudicable): same
    inverted-index shape as ``contamination_pairs`` but the aggregate
    carries both set sizes so the true Jaccard is computed per pair.
    Shingle semantics follow the engine standard (``add_shingles``):
    width-``ngram`` word windows, docs shorter than ``ngram`` tokens emit
    one whole-doc shingle, sets are distinct.

    Scale shape: identical to ``contamination_pairs`` — the benchmark
    postings AND its per-doc set sizes are broadcast (eval sets are small
    by nature); the corpus side is scanned once, its per-doc sizes come
    from a map-side-combinable count over its own postings, and the only
    corpus-keyed shuffle is the (doc, bench) pair aggregation whose output
    is bounded by actually-overlapping pairs.
    """
    c = _window_postings(corpus, text_col, id_col, ngram, id_col)
    b = _window_postings(benchmark, text_col, id_col, ngram, "bench_id")
    c_sizes = c.groupBy(id_col).agg(F.count("*").alias("_nc"))
    b_sizes = b.groupBy("bench_id").agg(F.count("*").alias("_nb"))
    common = (
        c.join(F.broadcast(b), "_wh")
        .groupBy(id_col, "bench_id")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(c_sizes, id_col)
        .join(F.broadcast(b_sizes), "bench_id")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("_nc") + F.col("_nb") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select(id_col, "bench_id", F.round("jaccard", 6).alias("jaccard"))
    )


def fuzzy_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    ngram: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus rows with every fuzzily-contaminated document removed
    (left-anti on the Jaccard-threshold pair set)."""
    pairs = (
        fuzzy_contamination_pairs(
            corpus, benchmark, ngram, threshold, text_col, id_col
        )
        .select(id_col)
        .distinct()
    )
    return corpus.join(pairs, id_col, "left_anti")


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
