"""Deterministic stratified sampling — training-mix construction.

After dedup/curation, assembling a training mix means sampling each
stratum (language, domain, quality bucket …) at its own rate. Spark's
``df.sample``/``sampleBy`` are seeded but PARTITIONING-DEPENDENT (they
draw from a per-partition RNG stream), so the selected set changes when
the upstream plan repartitions — unacceptable for reproducible data
recipes and for incremental runs that must make the same keep/drop
decision for a document every time they see it.

This implements content-keyed sampling instead: a document is kept iff
    xxhash64(key, salt) mod 10^6  <  rate * 10^6
which is a pure per-row Catalyst predicate — no shuffle, no RNG state,
evaluated in the scan stage, and stable under any repartitioning,
resume, or incremental re-run (the keep decision is a function of the
KEY, not of execution). Different ``salt`` values give independent
samples (e.g. disjoint train/validation draws use salt="train" /
salt="valid" with complementary predicates).

Scale shape: the fractions map is driver-side tiny (one entry per
stratum); it compiles into a single CASE expression — the corpus never
joins anything. This is the 100-TB-safe analogue of ``sampleBy``.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BUCKETS = 1_000_000


def sample_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10^6) for a key column: the uniform
    coordinate every sampling decision is made against."""
    return F.pmod(F.xxhash64(key, F.lit(salt)), F.lit(_BUCKETS))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, decided per key.

    Repartition-stable and replay-stable: the same (key, salt) is kept or
    dropped identically in every run, plan, and batch.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(round(fraction * _BUCKETS))
    return df.where(sample_bucket(F.col(key_col), salt) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (the training-mix recipe op).

    ``fractions`` maps stratum value -> keep rate; strata absent from the
    map keep ``default_fraction`` (0.0 = drop, the safe default for a
    curated mix). One CASE expression, scan-stage, no joins.
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} must be in [0, 1], got {v}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    threshold = F.lit(int(round(default_fraction * _BUCKETS)))
    for k, v in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == F.lit(k), F.lit(int(round(v * _BUCKETS)))
        ).otherwise(threshold)
    return df.where(sample_bucket(F.col(key_col), salt) < threshold)


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    key_col: str = "doc_id",
    rank_col: str = "group_rank",
    salt_buckets: int = 64,
) -> DataFrame:
    """Keep at most ``k`` best rows per group (per-domain caps — the webtext
    anti-spam rule "no domain contributes more than K pages to the mix").

    ``order_cols`` must define a TOTAL order (include a unique tiebreaker,
    e.g. ``doc_id``) — ties would otherwise make the survivor set
    plan-dependent. Adds ``rank_col`` (1-based rank within the group).

    Scale shape: the naive single window ``row_number() OVER (PARTITION BY
    group ORDER BY ...)`` sorts EVERY row of a hot group in one task — a
    100M-page domain becomes one straggler. Two phases instead:

      1. salt each row by ``xxhash64(key_col) % salt_buckets`` and take the
         local top-k per (group, salt): any row outside its slice's top-k is
         dominated by k better rows in the same group, so it can never be in
         the group's global top-k — pruning is lossless for ANY row→salt
         assignment;
      2. a second window over ``group_cols`` alone ranks the ≤ salt_buckets*k
         survivors per group — bounded input regardless of group skew.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if salt_buckets <= 0:
        raise ValueError(f"salt_buckets must be positive, got {salt_buckets}")
    gcols = list(group_cols)
    ocols = list(order_cols)

    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy(*gcols, "_salt").orderBy(*ocols)
    survivors = (
        salted.withColumn("_local_rank", F.row_number().over(w1))
        .where(F.col("_local_rank") <= k)
        .drop("_salt", "_local_rank")
    )
    w2 = Window.partitionBy(*gcols).orderBy(*ocols)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2))
        .where(F.col(rank_col) <= k)
    )


def train_validation_split(
    df: DataFrame,
    validation_fraction: float = 0.01,
    key_col: str = "doc_id",
    salt: str = "split",
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, deterministic (train, validation) split.

    The two sides partition the bucket space, so membership is exclusive
    and stable — a document can never leak from validation into training
    across re-runs or incremental batches (the contamination mode ad-hoc
    random splits invite).
    """
    if not 0.0 <= validation_fraction <= 1.0:
        raise ValueError(
            f"validation_fraction must be in [0, 1], got {validation_fraction}"
        )
    cut = int(round(validation_fraction * _BUCKETS))
    bucket = sample_bucket(F.col(key_col), salt)
    return df.where(bucket >= F.lit(cut)), df.where(bucket < F.lit(cut))
