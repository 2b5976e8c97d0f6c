"""SemDeDup — semantic deduplication over an embedding column.

Implements the k-means-bucketed semantic dedup of Abbas et al. 2023
("SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540): cluster the corpus in embedding space,
then within each cluster drop every example that has a semantic duplicate
(cosine >= tau) which is FURTHER from the cluster centroid — the paper's
keep-the-lowest-centroid-similarity rule.  This is the embedding-space
complement of the MinHash flagship: MinHash catches lexical near-dups,
SemDeDup catches paraphrases/translations/re-renders that share no
shingles at all.

Deviations from the paper, chosen for determinism and SQL-expressibility:

- The coarse quantizer is the engine's seeded deterministic IVF quantizer
  (``embedding_ann.ivf_centroids``) instead of a trained k-means pass —
  the assignment expression is identical once trained centroids exist,
  and determinism lets the whole operator be adjudicated against a DuckDB
  oracle (the centroid matrix inlines as SQL literals).
- The paper's sequential "iterate examples sorted by centroid distance"
  pruning is restated as an order-free dominance rule: drop x iff some
  same-cluster y has cosine(x, y) >= tau AND (cent_sim(y), y.id) <
  (cent_sim(x), x.id) lexicographically.  For a duplicate pair this keeps
  exactly the lower-centroid-similarity member (the paper's choice) and
  breaks exact ties by id; being a pure EXISTS predicate it is engine-
  order independent, so Spark and DuckDB agree row-for-row.  Centroid
  similarities are rounded (default 4 dp) BEFORE comparison so the
  dominance order never hinges on last-ulp float noise between engines.

Scale shape (10^12 docs): assignment is a narrow map (one Arrow-batched
(batch, dim) @ (dim, k) matmul per executor — no shuffle); the only
shuffle is the within-cluster self-join keyed on ``list_id``.  n_lists
grows with the corpus (the paper uses 50k clusters for LAION) to hold
mean cluster size constant, and AQE skew-join splits oversized clusters;
a deployment that cannot bound cluster size statistically would cap the
quadratic term per cluster the same way the LSH bucket cap does
(``operators/edges.py`` ``max_bucket_pairwise`` star fallback).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from daft_minhash_dedupe_spark.extras.embedding_ann import (
    _EXPR_PATH_MAX_CELLS,
    _vec_lit,
    cosine_similarity,
    dot,
    ivf_centroids,
    l2_norm,
)

_ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("list_id", T.IntegerType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def ivf_assign(vec: Column, centroids: np.ndarray) -> Column:
    """struct(list_id, score) of the argmax-dot centroid for ``vec``.

    Ties on score resolve to the LARGER list_id (lexicographic greatest on
    (score, list_id)), mirrored by the DuckDB oracle's
    ``ORDER BY ip DESC, list_id DESC``.  Two physical strategies, like
    ``hyperplane_band_bits``: a codegen'd expression tree for small
    centroid matrices, one Arrow-batched matmul above
    ``_EXPR_PATH_MAX_CELLS`` cells.  NULL / wrong-dimension vectors map to
    NULL either way.
    """
    n_lists, dim = centroids.shape
    if centroids.size <= _EXPR_PATH_MAX_CELLS:
        emb = vec.cast("array<double>")
        scored = [
            F.struct(
                dot(emb, _vec_lit(list(c))).alias("score"),
                F.lit(i).alias("list_id"),
            )
            for i, c in enumerate(centroids)
        ]
        best = F.greatest(*scored) if len(scored) > 1 else scored[0]
        return F.when(
            F.size(vec) == dim,
            F.struct(best["list_id"].alias("list_id"), best["score"].alias("score")),
        )

    C = centroids.astype(np.float64)  # (k, dim)

    @F.pandas_udf(_ASSIGN_SCHEMA)
    def _assign(vecs: pd.Series) -> pd.DataFrame:
        mask = vecs.map(lambda v: v is not None and len(v) == dim).to_numpy()
        out = pd.DataFrame(
            {
                "list_id": pd.Series([None] * len(vecs), dtype="Int32"),
                "score": pd.Series([None] * len(vecs), dtype="Float64"),
            }
        )
        if mask.any():
            M = np.vstack(vecs[mask].to_numpy()).astype(np.float64)  # (n, dim)
            S = M @ C.T  # (n, k)
            # argmax with larger-list_id tie-break, matching the expression
            # path's lexicographic greatest on (score, list_id)
            best = (S.shape[1] - 1) - np.argmax(S[:, ::-1], axis=1)
            out.loc[mask, "list_id"] = best.astype(np.int32)
            out.loc[mask, "score"] = S[np.arange(len(M)), best]
        return out

    # same top-level-null shape as the expression path (null STRUCT for
    # null/ragged vectors, not a struct of null fields)
    return F.when(F.size(vec) == dim, _assign(vec))


def semdedup_assignments(
    df: DataFrame,
    n_lists: int = 16,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 4,
    dim: int | None = None,
    centroids: np.ndarray | None = None,
    materialize: bool = False,
) -> DataFrame:
    """(id, _v, list_id, cent_sim) — cluster assignment + rounded cosine to
    the assigned (unit-norm) centroid.  Narrow: no shuffle.

    ``materialize=True`` localCheckpoints the raw assignment struct so the
    Arrow matmul and the source scan run ONCE no matter how many times the
    result is referenced downstream (``semdedup`` references it three
    times: both self-join sides and the final survivor join — unmaterialized
    that plan re-scans the source and re-runs the UDF six times).  This is
    also what the paper's pipeline does at scale: the cluster-assignment
    table is persisted once, pruning reads it."""
    if centroids is None:
        if dim is None:
            row = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
            if row is None:
                dim = 1
            else:
                dim = len(row[0])
        centroids = ivf_centroids(dim, n_lists, seed)
    v = F.col(vec_col).cast("array<double>")
    a = df.select(F.col(id_col).alias("id"), v.alias("_v")).withColumn(
        "_a", ivf_assign(F.col("_v"), centroids)
    )
    if materialize:
        a = a.localCheckpoint(eager=True)
    # centroids are unit-norm, so score / |v| IS the cosine to the centroid
    return a.select(
        "id",
        "_v",
        F.col("_a.list_id").alias("list_id"),
        F.round(F.col("_a.score") / l2_norm(F.col("_v")), round_digits).alias(
            "cent_sim"
        ),
    )


_SEMDEDUP_OUT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("list_id", T.IntegerType()),
        T.StructField("cent_sim", T.DoubleType()),
        T.StructField("is_survivor", T.BooleanType()),
    ]
)


def _prune_join(assigned: DataFrame, tau: float) -> DataFrame:
    """Pure-Catalyst dominance prune: within-cluster self-join, per-pair
    cosine as a codegen expression.  Exact-expression-parity reference path;
    interpreted higher-order-function cost is O(pairs · dim)."""
    x = assigned.alias("x")
    y = assigned.alias("y")
    dominated = (
        x.join(y, on="list_id")
        .where(F.col("x.id") != F.col("y.id"))
        .where(cosine_similarity(F.col("x._v"), F.col("y._v")) >= F.lit(tau))
        .where(
            (F.col("y.cent_sim") < F.col("x.cent_sim"))
            | (
                (F.col("y.cent_sim") == F.col("x.cent_sim"))
                & (F.col("y.id") < F.col("x.id"))
            )
        )
        .select(F.col("x.id").alias("id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return assigned.join(dominated, "id", "left").select(
        "id",
        "list_id",
        "cent_sim",
        F.coalesce(~F.col("_dropped"), F.lit(True)).alias("is_survivor"),
    )


def _prune_grouped(assigned: DataFrame, tau: float) -> DataFrame:
    """Scale path: ONE shuffle on ``list_id``, then a per-cluster BLAS gram
    matrix inside ``applyInPandas`` — no c² pair rows ever materialize.
    Sorting a cluster by (cent_sim, id) turns the dominance rule into
    "any strictly-earlier row with cosine >= tau", i.e. a lower-triangle
    test on the gram matrix.  Zero-norm vectors yield NaN cosines and so
    never dominate nor get dominated — same as the join path's explicit
    zero-denominator guard and DuckDB's NaN comparison semantics.  Memory
    per task is O(c·dim + c²); n_lists is chosen to bound cluster size c
    (the paper holds mean cluster size roughly constant as the corpus
    grows), and AQE splits residual skew."""

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["cent_sim", "id"], kind="mergesort").reset_index(
            drop=True
        )
        V = np.vstack(pdf["_v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(V, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            G = (V @ V.T) / np.outer(norms, norms)
        hit = np.tril(G >= tau, -1).any(axis=1)
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "list_id": pdf["list_id"],
                "cent_sim": pdf["cent_sim"],
                "is_survivor": ~hit,
            }
        )

    clustered = assigned.where(F.col("list_id").isNotNull())
    loners = assigned.where(F.col("list_id").isNull()).select(
        "id", "list_id", "cent_sim", F.lit(True).alias("is_survivor")
    )
    pruned = clustered.groupBy("list_id").applyInPandas(prune, _SEMDEDUP_OUT)
    return pruned.unionByName(loners)


def semdedup(
    df: DataFrame,
    tau: float = 0.9,
    n_lists: int = 16,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 4,
    centroids: np.ndarray | None = None,
    materialize: bool = True,
    strategy: str = "grouped",
) -> DataFrame:
    """SemDeDup survivor assignment: one row per input row with
    ``(id_col, list_id, cent_sim, is_survivor)``.

    ``is_survivor`` is false iff a same-cluster example with
    cosine >= ``tau`` dominates this one under the paper's rule (lower
    centroid similarity survives; exact rounded ties broken by lower id).

    ``strategy``: ``"grouped"`` (default — per-cluster Arrow/BLAS gram
    inside ``applyInPandas``, one shuffle) or ``"join"`` (pure-Catalyst
    pair self-join — the expression-level reference both for the DuckDB
    oracle and for pinning the grouped path in tests).
    """
    assigned = semdedup_assignments(
        df,
        n_lists,
        seed,
        vec_col,
        id_col,
        round_digits,
        centroids=centroids,
        materialize=materialize,
    )
    if strategy == "grouped":
        out = _prune_grouped(assigned, tau)
    elif strategy == "join":
        out = _prune_join(assigned, tau)
    else:
        raise ValueError(f"unknown semdedup strategy {strategy!r}")
    return out.withColumnRenamed("id", id_col)


def semdedup_centroid_sql_literal(centroids: np.ndarray) -> str:
    """The centroid matrix as a DuckDB VALUES literal — full-precision
    ``repr`` round-trip so the oracle scores the exact same doubles."""
    rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(
            i, ", ".join(repr(float(x)) for x in c)
        )
        for i, c in enumerate(centroids)
    )
    return f"(VALUES {rows}) cent(list_id, c)"
