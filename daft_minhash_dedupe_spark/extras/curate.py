"""One-call training-data curation: the composed pipeline a 100-TB webtext
run would execute, built from the standalone operators so each stage keeps
its own tests and oracle.

Stage order is chosen for scale, not convenience:

1. quality gate + language filter — pure Catalyst expressions, evaluated in
   the scan stage (no shuffle); they run FIRST so every shuffling stage
   downstream sees only the surviving fraction.
2. exact dedup — one groupBy on a 128-bit content digest (map-side partial
   aggregation, no text shuffled, only digests).
3. benchmark decontamination — broadcast inverted-index join against the
   (small) eval set's 13-gram windows; the corpus is scanned once, never
   self-joined.

Near-duplicate (MinHash/LSH) dedup intentionally stays OUTSIDE this
function: it is the expensive stage, and the operational pattern at scale
is to run ``curate_corpus`` first (cheap gates shrink the corpus), then the
flagship ``MinHashDedupePipeline`` on the survivors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from daft_minhash_dedupe_spark.extras.decontaminate import decontaminate
from daft_minhash_dedupe_spark.extras.exact_dedupe import exact_dedupe
from daft_minhash_dedupe_spark.extras.lm_perplexity import (
    BigramLM,
    perplexity_scores,
)
from daft_minhash_dedupe_spark.extras.text_analysis import (
    language_id,
    quality_score,
)


def curate_corpus(
    df: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    languages: Sequence[str] = ("en",),
    ngram: int = 13,
    lm: BigramLM | None = None,
    max_ppl: float | None = None,
) -> DataFrame:
    """Quality gate → language filter → [optional CCNet perplexity gate] →
    exact dedup (keep min id per content) → 13-gram benchmark
    decontamination. Returns the surviving rows with ``quality`` and
    ``lang`` (and, when the LM gate runs, ``ppl``) columns attached.

    The perplexity gate (CCNet head/tail cut) activates when BOTH ``lm``
    (a pruned reference LM — broadcast-scored, see extras/lm_perplexity.py)
    and ``max_ppl`` are given. It sits after the Catalyst gates (so the LM
    join sees only quality/language survivors) and before exact dedup
    (ppl is content-determined, so dedup keep-choice doesn't affect which
    contents survive). Docs with < 2 tokens have NULL ppl and are KEPT —
    length policy belongs to the quality gate, not the LM."""
    # Two separate gate stages with a materialization barrier between them,
    # NOT one combined projection: quality_score and language_id fused into
    # a single codegen unit exceed the JIT-friendly method size and the
    # whole stage falls back to the slow path (measured 3.4 s steady-state
    # fused vs 0.6 s split at sf1.0/50k docs) — and gating on quality FIRST
    # means language_id (the wider expression) only runs over the quality
    # survivors. Gate order cannot change the surviving set (the predicates
    # are independent per-row functions of the text).
    out = (
        df.withColumn("quality", quality_score(F.col(text_col)))
        .where(F.col("quality") >= min_quality)
        .localCheckpoint(eager=False)
    )
    # Lazily materialize the gate survivors once: the exact-dedup stage reads
    # this frame twice (digest aggregation + keep semi-join probe) and the
    # decontamination stage twice more (window postings + anti-join probe) —
    # without the boundary each read re-runs the tokenize-heavy quality and
    # language expressions over the full scan (guide §5: cut lineage when an
    # intermediate is re-read and recomputing dwarfs the memory cost; the
    # survivors are the gated minority by construction).
    out = (
        out.withColumn("lang", language_id(F.col(text_col)))
        .where(F.col("lang").isin(*languages))
        .localCheckpoint(eager=False)
    )
    if lm is not None and max_ppl is not None:
        scores = perplexity_scores(out, id_col=id_col, text_col=text_col, lm=lm)
        out = out.join(scores.select(id_col, "ppl"), id_col).where(
            F.col("ppl").isNull() | (F.col("ppl") <= max_ppl)
        )
    out = exact_dedupe(out, text_col, id_col)
    if benchmark is not None:
        out = decontaminate(
            out, benchmark, ngram=ngram, text_col=text_col, id_col=id_col
        )
    return out
