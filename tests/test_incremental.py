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


def test_incremental_cli_chaining(spark, tmp_path):
    """Operational loop: full CLI run on batch A (persisting its checkpoint),
    then `main.py --prior-checkpoint <ckptA>` on batch B; the written
    state/components must equal a full in-process run over A∪B."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    raw, _ = generate_web_pages(spark, n_rows=150, seed=9)
    pages = prepare_web_pages(raw).localCheckpoint(eager=True)
    part_a = pages.where(F.xxhash64("block_id") % 3 != 0)
    part_b = pages.where(F.xxhash64("block_id") % 3 == 0)
    # CLI reads the input_hint (url, ...) shape — write the raw tables
    raw_a = raw.join(part_a.select(F.col("block_id").alias("url")), "url", "left_semi")
    raw_b = raw.join(part_b.select(F.col("block_id").alias("url")), "url", "left_semi")
    raw_a.write.parquet(str(tmp_path / "in_a"))
    raw_b.write.parquet(str(tmp_path / "in_b"))

    env = dict(os.environ)
    env.update({"SPARK_GRAFT_MASTER": "local[4]", "SPARK_GRAFT_DRIVER_MEM": "4g"})

    def run(args):
        r = subprocess.run(
            [sys.executable, str(repo / "main.py"), *args],
            capture_output=True, text=True, timeout=600, env=env, cwd=str(repo),
        )
        assert r.returncode == 0, (r.stderr or r.stdout)[-3000:]

    run(["--input", str(tmp_path / "in_a"), "--output", str(tmp_path / "out_a"),
         "--checkpoint", str(tmp_path / "ckpt_a")])
    run(["--input", str(tmp_path / "in_b"), "--output", str(tmp_path / "out_b"),
         "--prior-checkpoint", str(tmp_path / "ckpt_a")])

    merged = {
        r["u"]: r["rep"]
        for r in spark.read.parquet(str(tmp_path / "out_b/state/components")).collect()
    }
    pipe = MinHashDedupePipeline(DedupeConfig())
    nodes, _, full_assigns = _stages(pipe, pages)
    full = {r["u"]: r["rep"] for r in full_assigns.collect()}
    for n in nodes:
        assert merged.get(n, n) == full.get(n, n), f"node {n}"


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