"""SemDeDup (extras/semdedup.py): planted-cluster correctness vs a pure-numpy
oracle implementing the same dominance rule, assignment-path parity
(expression tree vs Arrow matmul), and edge cases (nulls, scale invariance)."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from daft_minhash_dedupe_spark.extras.embedding_ann import ivf_centroids
from daft_minhash_dedupe_spark.extras.semdedup import (
    ivf_assign,
    semdedup,
    semdedup_assignments,
)

VEC_T = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def _numpy_semdedup(ids, vecs, centroids, tau, round_digits=4):
    """Reference oracle: argmax-dot assignment (larger list_id on ties),
    rounded centroid cosine, drop x iff a same-cluster y with
    cos(x,y) >= tau has (cent_sim, id) lexicographically below x's."""
    V = np.asarray(vecs, dtype=np.float64)
    S = V @ centroids.T
    # argmax with larger-index tie-break
    lists = (S.shape[1] - 1) - np.argmax(S[:, ::-1], axis=1)
    norms = np.linalg.norm(V, axis=1)
    cent = np.round(S[np.arange(len(V)), lists] / norms, round_digits)
    survivors = {}
    for i, xid in enumerate(ids):
        dropped = False
        for j, yid in enumerate(ids):
            if i == j or lists[i] != lists[j]:
                continue
            cos = float(V[i] @ V[j] / (norms[i] * norms[j]))
            if cos < tau:
                continue
            if (cent[j], yid) < (cent[i], xid):
                dropped = True
                break
        survivors[xid] = (int(lists[i]), float(cent[i]), not dropped)
    return survivors


def test_semdedup_planted_clusters_match_numpy_oracle(spark):
    """Three tight direction-groups + isolated background vectors: the
    survivor of each group must be the member with the LOWEST centroid
    similarity (the paper's rule), and everything must equal the numpy
    oracle row-for-row."""
    rng = np.random.RandomState(3)
    dim, n_lists, tau = 8, 4, 0.95
    rows = []
    vid = 0
    for _ in range(3):  # three near-dup groups of 4
        base = rng.randn(dim)
        base /= np.linalg.norm(base)
        for _ in range(4):
            v = base + rng.randn(dim) * 0.01  # cosine ~0.9999 within group
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(20):  # background: random directions, no near-dups
        rows.append((vid, [float(x) for x in rng.randn(dim)]))
        vid += 1

    centroids = ivf_centroids(dim, n_lists, seed=7)
    df = spark.createDataFrame(rows, VEC_T)
    got = {
        r["vec_id"]: (r["list_id"], r["cent_sim"], r["is_survivor"])
        for r in semdedup(
            df, tau=tau, n_lists=n_lists, seed=7, centroids=centroids
        ).collect()
    }
    want = _numpy_semdedup(
        [r[0] for r in rows], [r[1] for r in rows], centroids, tau
    )
    assert got == want
    # each planted group keeps exactly one member, and it's the one with
    # the lowest (cent_sim, id) among same-cluster members of the group
    for g in range(3):
        members = list(range(g * 4, g * 4 + 4))
        by_list = {}
        for m in members:
            by_list.setdefault(want[m][0], []).append(m)
        for lst, ms in by_list.items():
            keepers = [m for m in ms if got[m][2]]
            assert len(keepers) == 1
            assert keepers[0] == min(ms, key=lambda m: (want[m][1], m))
    # background vectors all survive
    for m in range(12, vid):
        assert got[m][2]


def test_ivf_assign_expression_and_pandas_paths_agree(spark):
    """Same (list_id, score) from the codegen expression tree and the
    Arrow-batched matmul, including null/ragged rows."""
    import daft_minhash_dedupe_spark.extras.semdedup as sd

    rng = np.random.RandomState(11)
    dim, n_lists = 16, 8
    centroids = ivf_centroids(dim, n_lists, seed=5)
    rows = [(i, [float(x) for x in rng.randn(dim)]) for i in range(40)]
    rows.append((98, None))
    rows.append((99, [1.0, 2.0]))  # wrong dimension
    df = spark.createDataFrame(rows, VEC_T)

    def run():
        return {
            r["vec_id"]: (
                None
                if r["a"] is None
                else (r["a"]["list_id"], round(r["a"]["score"], 9))
            )
            for r in df.select(
                "vec_id", ivf_assign(F.col("embedding"), centroids).alias("a")
            ).collect()
        }

    expr = run()
    orig = sd._EXPR_PATH_MAX_CELLS
    sd._EXPR_PATH_MAX_CELLS = 0  # force the pandas matmul path
    try:
        pand = run()
    finally:
        sd._EXPR_PATH_MAX_CELLS = orig
    assert expr == pand
    assert expr[98] is None and expr[99] is None


def test_semdedup_assignment_scale_invariant(spark):
    """cos-to-centroid and cluster id are invariant under positive rescaling
    of the input vector (argmax over dot and cosine agree)."""
    rng = np.random.RandomState(17)
    dim = 8
    centroids = ivf_centroids(dim, 4, seed=7)
    vecs = [[float(x) for x in rng.randn(dim)] for _ in range(20)]
    rows = [(i, v) for i, v in enumerate(vecs)]
    scaled = [(i + 100, [x * 4.0 for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows + scaled, VEC_T)
    out = {
        r["id"]: (r["list_id"], r["cent_sim"])
        for r in semdedup_assignments(df, n_lists=4, seed=7, centroids=centroids)
        .select("id", "list_id", "cent_sim")
        .collect()
    }
    for i in range(20):
        assert out[i] == out[i + 100]


def test_semdedup_join_and_grouped_strategies_agree(spark):
    """The Catalyst pair-join reference path and the applyInPandas BLAS
    gram path produce identical survivor assignments, including planted
    near-dup groups, background rows, and null/ragged vectors."""
    rng = np.random.RandomState(31)
    dim = 8
    rows = []
    vid = 0
    for _ in range(5):
        base = rng.randn(dim)
        for _ in range(3):
            rows.append((vid, [float(x) for x in base + rng.randn(dim) * 0.01]))
            vid += 1
    for _ in range(30):
        rows.append((vid, [float(x) for x in rng.randn(dim)]))
        vid += 1
    rows.append((998, None))
    rows.append((999, [1.0]))  # ragged
    df = spark.createDataFrame(rows, VEC_T)

    def run(strategy):
        return {
            r["vec_id"]: (r["list_id"], r["cent_sim"], r["is_survivor"])
            for r in semdedup(
                df, tau=0.95, n_lists=4, seed=7, strategy=strategy
            ).collect()
        }

    j, g = run("join"), run("grouped")
    assert j == g
    assert len(j) == len(rows)
    assert j[998] == (None, None, True) and j[999] == (None, None, True)


def test_semdedup_no_pairs_all_survive(spark):
    """tau above every pairwise cosine -> every row survives itself."""
    rng = np.random.RandomState(23)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(15)]
    df = spark.createDataFrame(rows, VEC_T)
    out = semdedup(df, tau=0.9999, n_lists=4, seed=7)
    assert out.count() == 15
    assert out.where(~F.col("is_survivor")).count() == 0
