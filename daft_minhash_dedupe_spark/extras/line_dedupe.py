"""Line-level boilerplate dedup (CCNet-style) — beyond-reference curation op.

Web corpora repeat whole LINES across documents (nav bars, cookie banners,
copyright footers) far more often than whole documents; CCNet-style pipelines
drop any line that appears in >= N distinct documents before document-level
dedup runs. The reference has no line-granular operator (its dedup is
document-level only, workload/minhash_dedupe.py:176-185); this extends the
same corpus-frequency idea one granularity down.

Scale shape (100 TB):
- explode is narrow (posexplode_outer + explicit null filter — the inferred
  size()>0 filter trap, see operators/banding.py:44-50);
- frequency counting shuffles 8-byte line digests, twice aggregated:
  distinct (line, doc) first (so one doc repeating a line counts once),
  then count per line — both get map-side partial aggregation, so a hot
  line (the global footer, in EVERY doc) reaches its reducer as
  O(num_map_tasks) rows, never O(corpus);
- the blocklist (lines in >= N docs) is by definition the REPEATED minority
  — typically tiny vs the corpus — so the removal join is a left_anti that
  AQE converts to broadcast at runtime from its observed size (no forced
  hint: a pathological threshold could make it large);
- reconstruction groups per doc — collect_list is bounded by one document's
  line count, never by corpus frequency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_lines(df: DataFrame, text_col: str, id_col: str, sep: str = "\n") -> DataFrame:
    """One row per (doc, line): (id_col, line_idx, line, _lkey).

    ``_lkey`` is the 64-bit digest of the whitespace-trimmed, lowercased
    line — the corpus-frequency key.
    """
    return (
        df.select(
            id_col,
            F.posexplode_outer(F.split(F.col(text_col), sep)).alias("line_idx", "line"),
        )
        .where(F.col("line").isNotNull())
        .withColumn("_lkey", F.xxhash64(F.trim(F.lower(F.col("line")))))
    )


def boilerplate_lines(lines: DataFrame, id_col: str, min_dup_docs: int) -> DataFrame:
    """Blocklist: line keys appearing in >= min_dup_docs DISTINCT docs.

    Two-stage: distinct (key, doc) then count — both partial-aggregated
    map-side, so the hottest line costs O(tasks) reducer rows.
    """
    return (
        lines.select("_lkey", id_col)
        .distinct()
        .groupBy("_lkey")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_dup_docs)
        .select("_lkey")
    )


def line_dedupe(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_dup_docs: int = 5,
    sep: str = "\n",
    out_col: str = "cleaned_text",
) -> DataFrame:
    """Remove lines occurring in >= min_dup_docs distinct docs; rebuild text.

    Output: (id_col, kept_lines, removed_lines, out_col). Docs whose every
    line is boilerplate survive with out_col = '' (kept_lines = 0) — dropping
    them is the caller's policy, not the operator's.
    """
    lines = split_lines(df, text_col, id_col, sep=sep)
    blocklist = boilerplate_lines(lines, id_col, min_dup_docs)
    kept = lines.join(blocklist, "_lkey", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").cast("long").alias("kept_lines"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                lambda x: x["line"],
            ),
            sep,
        ).alias(out_col),
    )
    base = df.select(
        id_col, F.size(F.split(F.col(text_col), sep)).cast("long").alias("_total")
    )
    kept_n = F.coalesce(F.col("kept_lines"), F.lit(0).cast("long"))
    return base.join(rebuilt, id_col, "left").select(
        id_col,
        kept_n.alias("kept_lines"),
        (F.col("_total") - kept_n).cast("long").alias("removed_lines"),
        F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
    )
