"""Incremental dedup must equal a full re-run EXACTLY (same cluster ids,
not merely isomorphic partitions) — the correctness contract that makes the
O(batch) daily-crawl path safe at corpus scale."""

from pyspark.sql import functions as F

from daft_minhash_dedupe_spark.config import DedupeConfig
from daft_minhash_dedupe_spark.operators.components import connected_components
from daft_minhash_dedupe_spark.operators.edges import build_edges_from_buckets
from daft_minhash_dedupe_spark.operators.incremental import (
    incremental_assignments,
    merge_assignment_tables,
)
from daft_minhash_dedupe_spark.pipeline import MinHashDedupePipeline, prepare_web_pages
from daft_minhash_dedupe_spark.sources.synthetic import generate_web_pages


def _stages(pipe, df):
    """prep → normalize → signatures → bands; returns (node ids, bands, assigns)."""
    prepped = pipe.prep(df)
    sigs = pipe.signatures(pipe.normalize(prepped))
    bands = pipe.bands(sigs).localCheckpoint(eager=False)
    edges = build_edges_from_buckets(bands)
    assigns = connected_components(edges, algorithm="hash_to_min")
    nodes = [r["node_id"] for r in prepped.select("node_id").distinct().collect()]
    return nodes, bands, assigns


import pytest


@pytest.mark.parametrize("seed,mod", [(21, 3), (5, 2)])
def test_incremental_equals_full_run(spark, seed, mod):
    raw, _ = generate_web_pages(spark, n_rows=240, seed=seed)
    pages = prepare_web_pages(raw)
    # split batches by id hash so duplicate families straddle the boundary
    part_a = pages.where(F.xxhash64("block_id") % mod != 0)
    part_b = pages.where(F.xxhash64("block_id") % mod == 0)
    pipe = MinHashDedupePipeline(DedupeConfig())

    all_nodes, _, full_assigns = _stages(pipe, pages)
    full = {r["u"]: r["rep"] for r in full_assigns.collect()}

    _, a_bands, a_assigns = _stages(pipe, part_a)
    b_nodes, b_bands, _ = _stages(pipe, part_b)

    new_assign, old_updates = incremental_assignments(b_bands, a_bands, a_assigns)
    merged_df = merge_assignment_tables(a_assigns, new_assign, old_updates)
    merged = {r["u"]: r["rep"] for r in merged_df.collect()}

    # some cross-batch duplicate structure must actually exist for the test
    # to mean anything
    assert len(new_assign.collect()) > 0
    assert any(n in full for n in b_nodes)

    for n in all_nodes:
        assert merged.get(n, n) == full.get(n, n), f"node {n}"