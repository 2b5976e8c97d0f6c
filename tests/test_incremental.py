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
from daft_minhash_dedupe_spark.operators.state import (
    IncrementalState,
    meta_from_config,
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

    state = IncrementalState(spark, str(tmp_path / "out_b/state"))
    assert state.batch_ids() == [0, 1]  # bootstrap + one increment
    merged = {r["u"]: r["rep"] for r in state.read_assignments().collect()}
    pipe = MinHashDedupePipeline(DedupeConfig())
    nodes, _, full_assigns = _stages(pipe, pages)
    full = {r["u"]: r["rep"] for r in full_assigns.collect()}
    for n in nodes:
        assert merged.get(n, n) == full.get(n, n), f"node {n}"

    # --verify-pairs with --prior-checkpoint must be rejected at parse time
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, str(repo / "main.py"),
         "--input", str(tmp_path / "in_b"), "--output", str(tmp_path / "out_x"),
         "--prior-checkpoint", str(tmp_path / "ckpt_a"), "--verify-pairs"],
        capture_output=True, text=True, timeout=120, env=env, cwd=str(repo),
    )
    assert r.returncode != 0
    assert "verify-pairs" in (r.stderr + r.stdout)


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

def _snapshot_files(root):
    """path -> (size, mtime_ns) for every data file under root."""
    from pathlib import Path

    return {
        str(p): (p.stat().st_size, p.stat().st_mtime_ns)
        for p in Path(root).rglob("*")
        if p.is_file() and not p.name.startswith("_SUCCESS")
    }


def _split3(pages):
    h = F.pmod(F.xxhash64("block_id"), F.lit(3))  # % keeps sign in Spark
    return (pages.where(h == 0), pages.where(h == 1), pages.where(h == 2))


@pytest.mark.parametrize("n_buckets", [None, 8])
def test_state_chain_equals_full_run(spark, tmp_path, n_buckets):
    """Three batches folded through the persisted IncrementalState (both
    backends) must produce exactly the full-run cluster ids."""
    raw, _ = generate_web_pages(spark, n_rows=240, seed=21)
    pages = prepare_web_pages(raw).localCheckpoint(eager=True)
    a, b, c = _split3(pages)
    cfg = DedupeConfig()
    pipe = MinHashDedupePipeline(cfg)

    all_nodes, _, full_assigns = _stages(pipe, pages)
    full = {r["u"]: r["rep"] for r in full_assigns.collect()}

    root = str(tmp_path / f"state_{n_buckets}")
    state = IncrementalState(spark, root, n_buckets=n_buckets)
    _, a_bands, a_assigns = _stages(pipe, a)
    state.bootstrap(a_bands.select("band_key", "node"), a_assigns, meta_from_config(cfg))

    for batch in (b, c):
        _, bands, _ = _stages(pipe, batch)
        new_assign, old_updates = incremental_assignments(
            bands.select("band_key", "node"),
            state.read_bands(),
            state.read_assignments(),
        )
        delta = new_assign.unionByName(old_updates).localCheckpoint(eager=True)
        state.append(bands.select("band_key", "node"), delta)

    merged = {r["u"]: r["rep"] for r in state.read_assignments().collect()}
    for n in all_nodes:
        assert merged.get(n, n) == full.get(n, n), f"node {n}"
    # fresh handle (new "session"): reads fold identically
    merged2 = {
        r["u"]: r["rep"]
        for r in IncrementalState(spark, root).read_assignments().collect()
    }
    assert merged2 == merged


def test_state_append_writes_o_batch_bytes(spark, tmp_path):
    """The append-only contract: folding a small batch into a large corpus
    state must (a) leave every pre-existing state file byte-identical and
    (b) add files only under the new batch_id partition, with size
    proportional to the batch — the round-2 design rewrote the full corpus
    band table per increment."""
    raw, _ = generate_web_pages(spark, n_rows=400, seed=3)
    pages = prepare_web_pages(raw).localCheckpoint(eager=True)
    big = pages.where(F.xxhash64("block_id") % 10 != 0)   # ~90% corpus
    small = pages.where(F.xxhash64("block_id") % 10 == 0)  # ~10% batch
    cfg = DedupeConfig()
    pipe = MinHashDedupePipeline(cfg)

    root = str(tmp_path / "state")
    state = IncrementalState(spark, root)
    _, big_bands, big_assigns = _stages(pipe, big)
    state.bootstrap(big_bands.select("band_key", "node"), big_assigns, meta_from_config(cfg))
    before = _snapshot_files(root)
    corpus_bytes = sum(s for s, _ in before.values())

    _, s_bands, _ = _stages(pipe, small)
    new_assign, old_updates = incremental_assignments(
        s_bands.select("band_key", "node"), state.read_bands(), state.read_assignments()
    )
    state.append(
        s_bands.select("band_key", "node"),
        new_assign.unionByName(old_updates).localCheckpoint(eager=True),
    )

    after = _snapshot_files(root)
    for path, sig in before.items():
        assert after.get(path) == sig, f"pre-existing state file touched: {path}"
    new_files = set(after) - set(before)
    assert new_files, "append wrote nothing"
    assert all("batch_id=1" in p for p in new_files), new_files
    new_bytes = sum(after[p][0] for p in new_files)
    # ~10% batch → new bytes well under half the corpus state (parquet
    # per-file overhead dominates at this tiny scale; at real scale the
    # ratio tracks batch/corpus)
    assert new_bytes < corpus_bytes / 2, (new_bytes, corpus_bytes)


def test_state_meta_guards(spark, tmp_path):
    raw, _ = generate_web_pages(spark, n_rows=60, seed=7)
    pages = prepare_web_pages(raw)
    cfg = DedupeConfig()
    pipe = MinHashDedupePipeline(cfg)
    _, bands, assigns = _stages(pipe, pages)

    root = str(tmp_path / "state")
    state = IncrementalState(spark, root)
    state.bootstrap(bands.select("band_key", "node"), assigns, meta_from_config(cfg))

    # current config wants verification -> refuse regardless of state
    with pytest.raises(ValueError, match="verify_pairs"):
        state.validate_config(DedupeConfig(verify_pairs=True))
    # banding-parameter mismatch -> refuse
    with pytest.raises(ValueError, match="different"):
        state.validate_config(DedupeConfig(ngram_size=3))
    with pytest.raises(ValueError, match="different"):
        state.validate_config(DedupeConfig(seed=7))
    # signature-family mismatch -> refuse (band keys incomparable across
    # kernels: a fold would silently under-merge, never matching old buckets)
    with pytest.raises(ValueError, match="different"):
        state.validate_config(DedupeConfig(minhash_kernel="oph"))
    # matching config passes
    state.validate_config(DedupeConfig())

    # state persisted by a verified run -> always refused
    vroot = str(tmp_path / "vstate")
    vstate = IncrementalState(spark, vroot)
    vstate.bootstrap(
        bands.select("band_key", "node"), assigns,
        meta_from_config(DedupeConfig(verify_pairs=True)),
    )
    with pytest.raises(ValueError, match="verify_pairs"):
        vstate.validate_config(DedupeConfig())


def test_state_compact(spark, tmp_path):
    raw, _ = generate_web_pages(spark, n_rows=150, seed=11)
    pages = prepare_web_pages(raw).localCheckpoint(eager=True)
    a, b, c = _split3(pages)
    cfg = DedupeConfig()
    pipe = MinHashDedupePipeline(cfg)
    state = IncrementalState(spark, str(tmp_path / "state"))
    _, a_bands, a_assigns = _stages(pipe, a)
    state.bootstrap(a_bands.select("band_key", "node"), a_assigns, meta_from_config(cfg))
    for batch in (b, c):
        _, bands, _ = _stages(pipe, batch)
        na, ou = incremental_assignments(
            bands.select("band_key", "node"), state.read_bands(), state.read_assignments()
        )
        state.append(bands.select("band_key", "node"),
                     na.unionByName(ou).localCheckpoint(eager=True))

    compacted = state.compact(str(tmp_path / "state2"))
    assert compacted.batch_ids() == [0]
    want = {r["u"]: r["rep"] for r in state.read_assignments().collect()}
    got = {r["u"]: r["rep"] for r in compacted.read_assignments().collect()}
    assert got == want
    assert state.read_bands().count() == compacted.read_bands().count()
    compacted.validate_config(cfg)


def test_legacy_meta_without_backend_reads_plain(spark, tmp_path):
    """A _META.json predating the backend tag means the batch dirs were
    written as plain parquet — a bucketed open request must be demoted, or
    Spark would trust bucket metadata the files don't satisfy."""
    import json
    from pathlib import Path

    bands = spark.createDataFrame([(1, 10), (1, 11)], "band_key long, node long")
    assigns = spark.createDataFrame([(11, 10)], "u long, rep long")

    root = str(tmp_path / "legacy")
    st = IncrementalState(spark, root)  # plain-parquet backend
    st.bootstrap(bands, assigns, meta_from_config(DedupeConfig()))
    meta_path = Path(root) / "_META.json"
    m = json.loads(meta_path.read_text())
    del m["backend"]
    meta_path.write_text(json.dumps(m))
    # drop Hadoop's local-FS checksum sidecar: the out-of-band edit above
    # would otherwise fail CRC validation on the next Hadoop read
    (meta_path.parent / "._META.json.crc").unlink(missing_ok=True)

    reopened = IncrementalState(spark, root, n_buckets=8)
    assert reopened.n_buckets is None
    assert {(r["u"], r["rep"]) for r in reopened.read_assignments().collect()} == {
        (11, 10)
    }

    # meta but NO batches on disk: nothing written yet, honor the request
    root2 = tmp_path / "fresh"
    root2.mkdir()
    (root2 / "_META.json").write_text(json.dumps(m))
    assert IncrementalState(spark, str(root2), n_buckets=8).n_buckets == 8


def test_register_tables_once_per_instance(spark, tmp_path, monkeypatch):
    """The bucketed backend's DROP/CREATE/RECOVER registration runs once per
    instance, not once per read/write — appends flow through insertInto,
    which keeps the catalog's partition list current by itself."""
    bands = spark.createDataFrame([(1, 10), (1, 11)], "band_key long, node long")
    assigns = spark.createDataFrame([(11, 10)], "u long, rep long")

    root = str(tmp_path / "bucketed")
    IncrementalState(spark, root, n_buckets=4).bootstrap(
        bands, assigns, meta_from_config(DedupeConfig())
    )

    st = IncrementalState(spark, root)  # backend picked up from meta
    assert st.n_buckets == 4
    drops = []
    orig_sql = spark.sql

    def spy(query, *args, **kwargs):
        if query.lstrip().upper().startswith("DROP TABLE"):
            drops.append(query)
        return orig_sql(query, *args, **kwargs)

    monkeypatch.setattr(spark, "sql", spy)
    assert st.read_bands().count() == 2  # first touch registers both tables
    assert st.read_assignments().count() == 1
    st.append(
        spark.createDataFrame([(2, 12)], "band_key long, node long"),
        spark.createDataFrame([(12, 12)], "u long, rep long"),
    )
    assert len(drops) == 2  # one DROP per table, only on the first touch
    # and the post-registration append is still visible through the catalog
    assert st.read_bands().count() == 3


def test_no_meta_legacy_batches_demote_bucketed_request(spark, tmp_path):
    """Batches on disk with NO _META.json at all (state predating
    fingerprinting) are plain parquet — a bucketed open request must be
    demoted exactly like the tagless-meta case, or CLUSTERED BY tables get
    created over non-bucketed files."""
    import json
    from pathlib import Path

    bands = spark.createDataFrame([(1, 10), (1, 11)], "band_key long, node long")
    assigns = spark.createDataFrame([(11, 10)], "u long, rep long")

    root = str(tmp_path / "nometa")
    IncrementalState(spark, root).bootstrap(
        bands, assigns, meta_from_config(DedupeConfig())
    )
    meta_path = Path(root) / "_META.json"
    meta_path.unlink()
    (meta_path.parent / "._META.json.crc").unlink(missing_ok=True)

    reopened = IncrementalState(spark, root, n_buckets=8)
    assert reopened.n_buckets is None
    assert reopened.is_state_root()
    assert {(r["u"], r["rep"]) for r in reopened.read_assignments().collect()} == {
        (11, 10)
    }


def test_legacy_meta_missing_kernel_means_arrow(spark, tmp_path):
    """State fingerprinted before minhash_kernel was a _META_KEY was built by
    the arrow kernel: a fold with a different kernel family must be refused
    (incomparable band keys silently under-merge), while the arrow default
    still validates."""
    import json
    from pathlib import Path

    import pytest

    bands = spark.createDataFrame([(1, 10)], "band_key long, node long")
    assigns = spark.createDataFrame([(10, 10)], "u long, rep long")

    root = str(tmp_path / "prekernel")
    st = IncrementalState(spark, root)
    st.bootstrap(bands, assigns, meta_from_config(DedupeConfig()))
    meta_path = Path(root) / "_META.json"
    m = json.loads(meta_path.read_text())
    del m["minhash_kernel"]
    meta_path.write_text(json.dumps(m))
    (meta_path.parent / "._META.json.crc").unlink(missing_ok=True)

    reopened = IncrementalState(spark, root)
    reopened.validate_config(DedupeConfig())  # arrow default: accepted
    with pytest.raises(ValueError, match="minhash_kernel"):
        reopened.validate_config(DedupeConfig(minhash_kernel="oph"))


def test_bucketed_read_recovers_externally_added_partitions(spark, tmp_path):
    """Reads re-run RECOVER PARTITIONS (no DROP/CREATE) so batches appended
    by another session — whose insertInto updated ITS catalog, not ours —
    are visible. Simulated by dropping a partition from the catalog after
    registration: the stale-catalog read must still see every batch."""
    bands = spark.createDataFrame([(1, 10), (2, 20)], "band_key long, node long")
    assigns = spark.createDataFrame([(10, 10)], "u long, rep long")

    root = str(tmp_path / "xsession")
    IncrementalState(spark, root, n_buckets=4).bootstrap(
        bands, assigns, meta_from_config(DedupeConfig())
    )
    st = IncrementalState(spark, root)
    assert st.read_bands().count() == 2  # registers tables
    st.append(
        spark.createDataFrame([(3, 30)], "band_key long, node long"),
        spark.createDataFrame([(30, 30)], "u long, rep long"),
    )
    # simulate the stale catalog a DIFFERENT session would have: forget the
    # appended partition, then read — RECOVER must re-discover it
    spark.sql(f"ALTER TABLE {st._bands_table} DROP PARTITION (batch_id=1)")
    assert st.read_bands().count() == 3
