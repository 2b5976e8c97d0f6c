"""Exact n-gram Jaccard set-similarity self-join (no LSH approximation).

The classic inverted-index approach (Vernica/Carey/Li SIGMOD'10 shape):
explode distinct shingles → self-join on shingle → count common shingles per
pair → Jaccard = common / (|A| + |B| - common) ≥ threshold.

Cost is Σ bucket² over shingle postings — exact but quadratic in hot
shingles, so ``max_posting`` drops ultra-common shingles (stopword shingles
contribute almost nothing to Jaccard but dominate the join). This is the
standard prefix-filter-style pruning knob; LSH (MinHash pipeline) remains
the scale path, this operator is the exact verifier / small-corpus tool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from daft_minhash_dedupe_spark.functions.minhash import add_shingles


def shingle_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", ngram_size: int = 5
) -> DataFrame:
    """(shingle, doc) inverted index over distinct shingle hashes.

    Shingle arrays are materialized before the explode (CollapseProject
    would otherwise inline the chained transforms into the Generate and
    re-evaluate them per row — see substring_dedupe)."""
    shingled = (
        add_shingles(df, text_col, ngram_size, "_sh")
        .select(F.col(id_col).alias("doc"), "_sh")
        .localCheckpoint(eager=False)
    )
    return shingled.select("doc", F.explode("_sh").alias("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_size: int = 5,
    threshold: float = 0.7,
    max_posting: int | None = 1000,
) -> DataFrame:
    """(u, v, jaccard) for all pairs with exact n-gram Jaccard ≥ threshold.

    With ``max_posting`` pruning the reported jaccard is a LOWER bound:
    per-doc sizes are counted over the FULL shingle sets (before pruning),
    while hot shingles can no longer contribute to the common count — so
    pruning can only drop borderline pairs, never promote sub-threshold
    pairs above the bar. (Sizing after the prune would do the opposite:
    two mostly-hot-shingle docs would have both their sizes and their
    denominator deflated, inflating jaccard past the true value.)"""
    postings = shingle_postings(df, text_col, id_col, ngram_size)
    sizes = postings.groupBy("doc").agg(F.count("*").alias("n_sh"))
    if max_posting is not None:
        hot = postings.groupBy("shingle").count().where(F.col("count") > max_posting)
        postings = postings.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")

    a = postings.select(F.col("shingle"), F.col("doc").alias("u"))
    b = postings.select(F.col("shingle"), F.col("doc").alias("v"))
    common = (
        a.join(b, "shingle")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("common"))
    )
    su = sizes.select(F.col("doc").alias("u"), F.col("n_sh").alias("_nu"))
    sv = sizes.select(F.col("doc").alias("v"), F.col("n_sh").alias("_nv"))
    return (
        common.join(su, "u")
        .join(sv, "v")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("_nu") + F.col("_nv") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("u", "v", F.round("jaccard", 6).alias("jaccard"))
    )
