"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023,
"Data Selection for Language Models via Importance Resampling").

Select raw web documents whose hashed n-gram distribution looks like a
target corpus: fit bag-of-hashed-{uni,bi}gram distributions on the target
and on the raw pool, give every raw doc the importance log-weight

    log w(x) = sum over feature occurrences f in x of log(p_target[f] / p_raw[f])

and resample ∝ w via deterministic Gumbel-top-k (sampling without
replacement from the softmax of log-weights, with the Gumbel noise derived
from xxhash64(doc_id, salt) so the draw is reproducible and
repartition-stable — same rationale as extras/sampling.py).

Spark shapes, stage by stage:
  * feature extraction is pure Catalyst — transform/zip_with over the token
    array, xxhash64 into ``n_buckets`` (no UDF, no shuffle);
  * each distribution fit is one explode + groupBy over at most
    ``n_buckets`` distinct keys — the aggregate output is bounded by the
    bucket count (default 10k rows ≈ driver-tiny) regardless of corpus
    size, so map-side partial aggregation absorbs nearly everything;
  * per-doc weights come from explode → broadcast join against the
    n_buckets-row log-ratio table → groupBy(doc) sum — the corpus-sized
    side shuffles once, keyed by doc id;
  * selection: ``top_k`` uses orderBy+limit (Spark's TakeOrdered — local
    per-partition top-k, driver merges k rows/partition), ``fraction``
    computes an approxQuantile threshold and filters — a scan-stage
    predicate that never sorts the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GUMBEL_GRAIN = 1 << 20


def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def ngram_feature_buckets(
    col: Column, n_buckets: int = 10_000, include_bigrams: bool = True
) -> Column:
    """Hashed word-{uni,bi}gram features of a text column, as
    ``array<long>`` of bucket ids in [0, n_buckets) — one entry per feature
    OCCURRENCE (multiplicity matters for the importance weight)."""
    toks = _tokens(col)
    uni = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(n_buckets)))
    if not include_bigrams:
        return uni
    # bigram i pairs token i with token i+1: zip the array against its own
    # tail (slice is 1-indexed; zip_with truncates to the shorter side via
    # the null guard — the trailing null pair is filtered out).
    tail = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    bi = F.filter(
        F.zip_with(
            toks,
            tail,
            lambda a, b: F.when(
                b.isNotNull(),
                F.pmod(F.xxhash64(F.concat(a, F.lit(" "), b)), F.lit(n_buckets)),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return F.concat(uni, bi)


def fit_log_probs(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10_000,
    prob_col: str = "log_p",
) -> tuple[DataFrame, float]:
    """Add-one-smoothed log-probability of every OBSERVED bucket under
    ``df``'s hashed n-gram distribution, plus the smoothed floor for the
    unobserved ones: ``((bucket, log_p) — at most n_buckets rows —,
    -log(total + n_buckets))``. The bounded counts table is persisted so
    the corpus-sized explode runs exactly once (the total aggregate and the
    downstream join both read the cached ≤ n_buckets rows)."""
    counts = (
        df.select(
            F.explode(
                ngram_feature_buckets(F.col(text_col), n_buckets)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    total = counts.agg(F.sum("n")).collect()[0][0] or 0
    denom = math.log(total + n_buckets)
    lp = counts.select(
        "bucket", (F.log(F.col("n") + 1) - F.lit(denom)).alias(prob_col)
    )
    return lp, -denom


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Importance log-weight per raw document: ``(key_col, n_features,
    log_weight)`` where log_weight sums log(p_target/p_raw) over the doc's
    feature occurrences. Docs with no features get log_weight 0.0."""
    raw_feats = raw.select(key_col, text_col)
    tgt_lp, tgt_floor = fit_log_probs(target, text_col, n_buckets, prob_col="log_pt")
    raw_lp, raw_floor = fit_log_probs(raw_feats, text_col, n_buckets, prob_col="log_pr")
    # Full outer across the two bounded bucket tables; a bucket unseen on
    # one side takes that side's smoothed floor.
    ratio = (
        tgt_lp.join(raw_lp, "bucket", "full_outer")
        .select(
            "bucket",
            (
                F.coalesce(F.col("log_pt"), F.lit(tgt_floor))
                - F.coalesce(F.col("log_pr"), F.lit(raw_floor))
            ).alias("log_ratio"),
        )
    )
    occ = raw_feats.select(
        key_col,
        F.explode_outer(
            ngram_feature_buckets(F.col(text_col), n_buckets)
        ).alias("bucket"),
    )
    return (
        occ.join(F.broadcast(ratio), "bucket", "left")
        .groupBy(key_col)
        .agg(
            F.count("bucket").alias("n_features"),
            F.coalesce(F.sum("log_ratio"), F.lit(0.0)).alias("log_weight"),
        )
    )


def gumbel_key(key: Column, salt: str = "dsir") -> Column:
    """Deterministic standard-Gumbel draw per key: u from the xxhash64
    bucket midpoint (never exactly 0 or 1), g = -log(-log(u))."""
    u = (
        F.pmod(F.xxhash64(key, F.lit(salt)), F.lit(_GUMBEL_GRAIN)) + F.lit(0.5)
    ) / F.lit(float(_GUMBEL_GRAIN))
    return -F.log(-F.log(u))


def dsir_select(
    weights: DataFrame,
    k: int | None = None,
    fraction: float | None = None,
    key_col: str = "doc_id",
    salt: str = "dsir",
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel-top-k resampling from importance weights: adds ``gumbel_score
    = log_weight / temperature + Gumbel(key)`` and keeps the top ``k`` rows
    (exact, TakeOrdered) or the top ``fraction`` (approxQuantile threshold —
    scan-stage filter, never a global sort). Exactly one of k / fraction."""
    if (k is None) == (fraction is None):
        raise ValueError("pass exactly one of k or fraction")
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    scored = weights.withColumn(
        "gumbel_score",
        F.col("log_weight") / F.lit(temperature) + gumbel_key(F.col(key_col), salt),
    )
    if k is not None:
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        return scored.orderBy(F.col("gumbel_score").desc(), F.col(key_col)).limit(k)
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    if fraction == 1.0:
        return scored
    (cut,) = scored.stat.approxQuantile("gumbel_score", [1.0 - fraction], 0.001)
    return scored.where(F.col("gumbel_score") >= cut)
