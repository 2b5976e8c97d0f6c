"""Cross-validation against Spark MLlib's own ``MinHashLSH`` — an
independent, widely-deployed public implementation of the same algorithm
family (pyspark.ml.feature.MinHashLSH; no code shared with this engine).

Both sides are reduced to the same semantics — *connected components of
exact-Jaccard ≥ threshold pairs surfaced by LSH candidate generation* over
IDENTICAL shingle sets:

- engine: ``MinHashDedupePipeline(verify_pairs=True)`` — (B,R)=(8,8)
  banding + exact ``array_intersect``/``array_union`` verification
  (operators/verify.py), then distributed CC.
- MLlib: ``MinHashLSH(numHashTables=24)`` OR-amplification (r=1 per table,
  far more permissive candidate generation than (8,8) banding) +
  ``approxSimilarityJoin``'s exact Jaccard-distance filter ≤ 1-threshold,
  then driver-side union-find (test scale only).

MLlib computes Jaccard over sparse binary vectors, so the engine's shingle
hashes (xxhash64 — full signed-64 range) are reindexed to a dense int32
vocabulary first; set identity is preserved exactly, so both systems see
the same ground-truth Jaccard for every pair.

Reference basis: the reference validates its clustering against igraph
(tests/test_minhash_dedupe_unit.py); this file plays the same role with a
second INDUSTRIAL implementation rather than a library oracle.
"""

import pytest
from pyspark.sql import functions as F

pytest.importorskip("pyspark.ml.feature")

from pyspark.ml.feature import MinHashLSH  # noqa: E402
from pyspark.ml.linalg import Vectors, VectorUDT  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from daft_minhash_dedupe_spark.config import DedupeConfig  # noqa: E402
from daft_minhash_dedupe_spark.functions.minhash import add_shingles  # noqa: E402
from daft_minhash_dedupe_spark.pipeline import (  # noqa: E402
    MinHashDedupePipeline,
    prepare_web_pages,
)
from daft_minhash_dedupe_spark.sources.synthetic import generate_web_pages  # noqa: E402


def _partition(assignment: dict) -> set:
    groups: dict = {}
    for k, v in assignment.items():
        groups.setdefault(v, set()).add(k)
    return {frozenset(g) for g in groups.values()}


def _union_find_partition(nodes, pairs) -> set:
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return _partition({n: find(n) for n in nodes})


def _mllib_clusters(spark, normalized, cfg):
    """block_id partition via MLlib MinHashLSH on the engine's shingle sets."""
    shingled = add_shingles(
        normalized, "content_normalized", cfg.ngram_size, "shingles"
    ).select(cfg.index_col, "shingles")
    ex = shingled.select(cfg.index_col, F.explode("shingles").alias("sh"))
    vocab = (
        ex.select("sh")
        .distinct()
        .withColumn("idx", F.row_number().over(Window.orderBy("sh")) - 1)
    )
    dim = vocab.count()
    idx_lists = (
        ex.join(vocab, "sh")
        .groupBy(cfg.index_col)
        .agg(F.sort_array(F.collect_set("idx")).alias("idxs"))
    )

    @F.udf(VectorUDT())
    def to_vec(idxs):
        return Vectors.sparse(dim, idxs, [1.0] * len(idxs))

    feats = idx_lists.select(cfg.index_col, to_vec("idxs").alias("features"))
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=24, seed=42
    ).fit(feats)
    pairs = (
        model.approxSimilarityJoin(feats, feats, 1.0 - cfg.threshold, distCol="jd")
        .where(F.col(f"datasetA.{cfg.index_col}") < F.col(f"datasetB.{cfg.index_col}"))
        .select(
            F.col(f"datasetA.{cfg.index_col}").alias("u"),
            F.col(f"datasetB.{cfg.index_col}").alias("v"),
        )
        .collect()
    )
    nodes = [r[cfg.index_col] for r in feats.select(cfg.index_col).collect()]
    return nodes, [(r["u"], r["v"]) for r in pairs]


def test_mllib_minhash_lsh_agrees_with_engine(spark):
    df, truth = generate_web_pages(spark, n_rows=300, seed=11)
    prepped = prepare_web_pages(df)
    cfg = DedupeConfig(
        index_col="block_id", content_col="block_text", verify_pairs=True
    )
    pipe = MinHashDedupePipeline(cfg)
    res = pipe.run(prepped)
    ours = {
        r["block_id"]: r["component"]
        for r in res["clusters"].select("block_id", "component").collect()
    }

    normalized = pipe.normalize(pipe.prep(prepped))
    nodes, pairs = _mllib_clusters(spark, normalized, cfg)
    theirs = _union_find_partition(nodes, pairs)

    # 1. MLlib independently recovers the planted structure
    ml_comp = {}
    for gi, grp in enumerate(theirs):
        for n in grp:
            ml_comp[n] = gi
    dup_pairs = truth["dup_pairs"]
    found = sum(1 for a, b in dup_pairs if ml_comp[a] == ml_comp[b])
    assert found / len(dup_pairs) >= 0.99
    assert sum(1 for a, b in truth["near_miss_pairs"] if ml_comp[a] == ml_comp[b]) == 0

    # 2. full partition agreement: engine (banded+verified) == MLlib
    # (OR-amplified+distance-filtered) — same exact-Jaccard semantics, so
    # identical merge decisions on this corpus
    assert _partition(ours) == theirs
