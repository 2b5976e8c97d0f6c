"""Exact deduplication: hash-groupBy (the cheap first pass every large-scale
text pipeline runs before MinHash).

Scale notes: groupBy on a 128-bit content digest gets map-side partial
aggregation; `keep = min(doc_id) per digest` matches the MinHash pipeline's
representative semantics (global min id). All SQL-expressible → DuckDB
oracles in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_digest(col) -> F.Column:
    """Deterministic content digest (md5 hex — portable to any SQL oracle)."""
    return F.md5(col)


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-digest duplicate-group stats: (digest, n_docs, keep_id)."""
    return (
        df.groupBy(content_digest(F.col(text_col)).alias("digest"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


def exact_dedupe(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (min id) per distinct content. Implemented as a
    min-aggregate + semi-join style filter (no window sort needed)."""
    keep = exact_dup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def exact_dup_assignments(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, component) where component = min doc_id sharing identical
    content — the exact-dup analogue of the MinHash cluster table."""
    groups = exact_dup_groups(df, text_col, id_col)
    return (
        df.select(id_col, content_digest(F.col(text_col)).alias("digest"))
        .join(groups.select("digest", F.col("keep_id").alias("component")), "digest")
        .select(id_col, "component")
    )
