"""CCNet-style n-gram LM perplexity scoring — beyond-reference curation op.

CCNet (Wenzek et al. 2020) buckets Common-Crawl documents by the perplexity
of a small language model trained on a clean reference corpus (they use
KenLM 5-grams over Wikipedia); low-perplexity docs are "head" quality,
high-perplexity docs are dropped or down-weighted. The reference repo has
no LM-quality stage (its quality ops are dedup-only); this implements the
same decision with a bigram LM whose training AND scoring are both plain
DataFrame algebra — no Python in either path.

Model: add-one-smoothed bigram LM over lowercased whitespace tokens,
    P(w2 | w1) = (count(w1 w2) + 1) / (count(w1 ·) + V)
    ppl(doc)  = 2 ^ ( -mean over doc bigrams of log2 P(w2|w1) )
where V is the corpus vocabulary size. Docs with < 2 tokens have no
bigrams and score NULL (callers decide the policy, as with line_dedupe).

Two deployment shapes, both provided:

- ``perplexity_scores(docs)`` — SELF-scored: the LM is trained on the
  scored corpus itself (useful as an outlier detector: boilerplate and
  gibberish both sit in the perplexity tails). The count table is
  O(distinct bigrams), not broadcastable at 100 TB, so the score join
  shuffles on (w1, w2); AQE's skew-join split handles the Zipf-hot
  contexts ("of the" …) on the probe side — the build side is one row
  per key by construction. This is the oracle-adjudicated mode (driver
  row ``lm_perplexity``): training + scoring is one closed SQL
  expression DuckDB can replay exactly.
- ``train_bigram_lm(ref_docs, top_k)`` + ``perplexity_scores(docs,
  lm=...)`` — the CCNet production shape: train on a SMALL clean
  reference corpus (Wikipedia-scale, i.e. ~10^8 bigrams, prunable to
  ``top_k`` by count), then score the 100 TB crawl with two BROADCAST
  hash joins (bigram logp, then per-context OOV backoff) — the scoring
  pass is scan-stage narrow work; the only shuffle is the final
  one-row-per-doc aggregation, and that gets map-side partial agg
  (every doc's exploded bigrams live in one map partition, so the
  groupBy ships ONE pre-combined row per doc).

Pruning semantics: probabilities are computed from the FULL counts
before the top-k cut, so pruning only widens the backoff set — a pruned
(w1, w2) falls back to the unseen-bigram mass log2(1/(c1+V)), and a w1
outside the reference vocabulary falls back to log2(1/V) — both the
natural add-one floors, keeping scores monotone under pruning.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from daft_minhash_dedupe_spark.functions.minhash import tokens


def doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per bigram POSITION (not distinct): (id_col, w1, w2).

    Docs with < 2 tokens emit no rows (explode of an empty array).
    Narrow: split + slice + transform + explode, no shuffle.
    """
    toked = df.select(id_col, tokens(F.lower(F.col(text_col))).alias("_toks"))
    pairs = F.expr(
        "transform(slice(_toks, 1, greatest(size(_toks) - 1, 0)), "
        "(w, i) -> struct(w AS w1, _toks[i + 1] AS w2))"
    )
    return toked.select(id_col, F.explode(pairs).alias("_bg")).select(
        id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2")
    )


def _vocab_size(df: DataFrame, text_col: str) -> DataFrame:
    """1-row DataFrame (V: long) — distinct lowercased tokens in df."""
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("_tok"))
        .agg(F.countDistinct("_tok").cast("long").alias("V"))
    )


@dataclass
class BigramLM:
    """A trained, prunable bigram LM.

    bigrams:  (w1, w2, logp)    — log2 P(w2|w1) for retained bigrams
    contexts: (w1, oov_logp)    — log2 of the unseen-bigram mass 1/(c1+V)
    vocab:    1-row (V: long)   — reference vocabulary size
    Both tables are broadcast at score time; prune with ``top_k`` at train
    time to bound their size (CCNet's KenLM is similarly pruned).
    """

    bigrams: DataFrame
    contexts: DataFrame
    vocab: DataFrame


def train_bigram_lm(
    ref_docs: DataFrame,
    text_col: str = "text",
    top_k: int | None = None,
) -> BigramLM:
    """Train an add-one bigram LM on a reference corpus.

    Counting is two map-side-combined aggregations (same two-stage shape as
    line_dedupe's frequency count: a Zipf-hot bigram reaches its reducer as
    O(map_tasks) partial rows, never O(corpus)). ``top_k`` keeps only the
    most frequent bigrams (ties broken by (w1, w2) so the cut is
    deterministic); probabilities always reflect the full pre-prune counts.
    """
    bg = doc_bigrams(ref_docs.select(F.lit(1).alias("_one"), text_col), "_one", text_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").cast("long").alias("c1"))
    vocab = _vocab_size(ref_docs, text_col)
    joined = c12.join(c1, "w1").crossJoin(F.broadcast(vocab))
    if top_k is not None:
        # single global window: the LM table is small by intent (the whole
        # point of pruning is to make it broadcastable), so one-partition
        # ranking of the COUNT TABLE is fine — the corpus itself never
        # passes through this window.
        rk = F.row_number().over(Window.orderBy(F.col("c12").desc(), "w1", "w2"))
        joined = joined.withColumn("_rk", rk).where(F.col("_rk") <= top_k).drop("_rk")
    bigrams = joined.select(
        "w1", "w2", F.log2((F.col("c12") + 1) / (F.col("c1") + F.col("V"))).alias("logp")
    )
    contexts = (
        c1.crossJoin(F.broadcast(vocab))
        .select("w1", F.log2(1.0 / (F.col("c1") + F.col("V"))).alias("oov_logp"))
    )
    return BigramLM(bigrams=bigrams, contexts=contexts, vocab=vocab)


def perplexity_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lm: BigramLM | None = None,
    ppl_col: str = "ppl",
) -> DataFrame:
    """(id_col, n_bigrams, ppl) for every input doc.

    ``lm=None`` → self-scored: train on ``df`` itself; every scored bigram
    is then in the count table by construction, so no backoff path runs and
    the whole computation is one closed relational expression (the
    oracle-adjudicated mode). With a trained ``lm``, unseen bigrams back
    off to the context's unseen mass and unseen contexts to log2(1/V), and
    the LM tables join BROADCAST (the 100-TB scoring shape).

    ppl is rounded to 4 decimals (driver float-hash convention).
    """
    bg = doc_bigrams(df, id_col, text_col)
    if lm is None:
        c12 = bg.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c12"))
        c1 = bg.groupBy("w1").agg(F.count("*").cast("long").alias("c1"))
        vocab = _vocab_size(df, text_col)
        scored = (
            bg.join(c12, ["w1", "w2"])
            .join(c1, "w1")
            .crossJoin(F.broadcast(vocab))
            .select(id_col, F.log2((F.col("c12") + 1) / (F.col("c1") + F.col("V"))).alias("_lp"))
        )
    else:
        default_logp = F.log2(1.0 / F.col("V"))
        scored = (
            bg.join(F.broadcast(lm.bigrams), ["w1", "w2"], "left")
            .join(F.broadcast(lm.contexts), "w1", "left")
            .crossJoin(F.broadcast(lm.vocab))
            .select(
                id_col,
                F.coalesce(F.col("logp"), F.col("oov_logp"), default_logp).alias("_lp"),
            )
        )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.pow(F.lit(2.0), -F.avg("_lp")), 4).alias(ppl_col),
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias("n_bigrams"),
        ppl_col,
    )
