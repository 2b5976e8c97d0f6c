"""MinHashDedupePipeline — the flagship end-to-end pipeline.

Spark-first rebuild of the reference ``MinHashDedupePipeline``
(workload/minhash_dedupe.py:131-647). Stage DAG (each stage boundary is a
resumable parquet/Iceberg checkpoint with per-partition metrics):

    input (url, warc_ts, html, text, lang)  [input_hint table]
      → prep (select natural key + text; deterministic node_id = xxhash64)
      → normalize (Catalyst + one NFD pandas UDF)
      → signatures (JVM shingle hashing + numpy permutation kernel)   [ckpt]
      → bands (posexplode banded slices → 8-byte band_key)            [ckpt]
      → pairs (salted bucket-min star edges; optional exact-Jaccard
               verification)                                          [ckpt]
      → components (hash-to-min CC with star accelerators)            [ckpt]
      → merge (keep-rule) + cluster assignment write-back

Keep-rule, representative and edge semantics are bit-for-bit the reference's
(SURVEY §2 "semantics worth pinning" 1-5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from daft_minhash_dedupe_spark.config import DedupeConfig
from daft_minhash_dedupe_spark.functions.hashing import doc_id_from_url
from daft_minhash_dedupe_spark.functions.minhash import (
    add_shingles,
    minhash_signature,
    minhash_signature_jvm,
    minhash_signature_oph,
)
from daft_minhash_dedupe_spark.functions.normalize import (
    normalize_dataframe,
    normalize_text,
)
from daft_minhash_dedupe_spark.io import StageCheckpointer
from daft_minhash_dedupe_spark.operators.banding import lsh_band_buckets
from daft_minhash_dedupe_spark.operators.components import connected_components
from daft_minhash_dedupe_spark.operators.edges import (
    build_edges_from_buckets,
    build_pair_edges_from_buckets,
)
from daft_minhash_dedupe_spark.operators.merge import cluster_assignments, merge_results
from daft_minhash_dedupe_spark.operators.verify import verify_pairs_exact_jaccard


def prepare_web_pages(
    df: DataFrame, index_col: str = "block_id", content_col: str = "block_text"
) -> DataFrame:
    """Adapt the input_hint web-pages table (url, warc_ts, html, text, lang)
    to the pipeline's (index_col, content_col) contract.

    Replaces the reference's WARC preprocessing (workload/minhash_dedupe.py:50-76)
    — extraction already happened upstream (byte-identical text per url), so
    this is a pure projection plus latest-crawl-per-url selection (window max,
    a new convenience the reference lacks)."""
    # xxhash64(text) tiebreak → deterministic pick when a url was crawled
    # twice at the same timestamp (row_number over ts alone would be
    # partition-order dependent)
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc(), F.xxhash64("text").asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col("url").alias(index_col), F.col("text").alias(content_col))
    )


def _python_stage_parallelism(
    n_rows: int, default_par: int, rows_per_task: int = 200_000
) -> int:
    """Partition count for the CPU-heavy narrow Python stages.

    Three regimes:
    - tiny inputs clamp DOWN to ceil(rows/1000): fanning 500 docs over 32+
      partitions spawns a Python worker per core for milliseconds of work
      each (measured 2.6s of a 9s cold flagship run);
    - the middle band pins to the cluster's core count (``default_par``) —
      byte-based AQE/split sizing is wrong here (150MB of text is 3 input
      splits but hours of per-core work);
    - big inputs scale UP to ceil(rows/rows_per_task): capping at core count
      put 625k docs in ONE Python task at 2x10^7 docs on 32 cores — a
      15-minute task whose single worker crash (host OOM-kill, throttled
      node) forfeits the whole task on retry, and at real cluster scale a
      100-TB input needs thousands of tasks, not #cores. 200k/task keeps the
      proven headline-shape task size (5x10^6/32 = 156k).
    """
    par = max(default_par, -(-n_rows // rows_per_task))
    return max(1, min(par, -(-n_rows // 1000)))


class MinHashDedupePipeline:
    """End-to-end near-duplicate dedup (reference parity + scale hardening)."""

    def __init__(self, config: DedupeConfig | None = None, **overrides):
        if config is None:
            config = DedupeConfig(**overrides)
        self.cfg = config

    # -- stages ------------------------------------------------------------

    def prep(self, df: DataFrame) -> DataFrame:
        """Projection + deterministic integer node id (reference :189-194 and
        :241-246; monotonically_increasing_id regret fixed per
        FRICTION_LOG.md:88-91)."""
        c = self.cfg
        return df.select(
            c.index_col,
            c.content_col,
            doc_id_from_url(F.col(c.index_col)).alias("node_id"),
        )

    def normalize(self, df: DataFrame) -> DataFrame:
        c = self.cfg
        return normalize_dataframe(
            df,
            c.content_col,
            "content_normalized",
            remove_punct=c.remove_punct,
            lowercase=c.lowercase,
            nfd_unicode=c.nfd_unicode,
            white_space=c.white_space,
        )

    def signatures(self, df: DataFrame) -> DataFrame:
        """(index, node_id, shingles, min_hashes) — reference :218-239.

        Shingle hashing is pure Catalyst; the permutation kernel is either
        the Arrow pandas-UDF (reference-parity default) or the pure-codegen
        xxhash64 family (cfg.minhash_kernel — see functions/minhash.py)."""
        c = self.cfg
        shingled = add_shingles(
            df, "content_normalized", c.ngram_size, "shingles"
        ).select(c.index_col, "node_id", "shingles")
        out = self._attach_signatures(shingled)
        # the shingle arrays (~ngram_size × tokens × 8B/row) are only needed
        # downstream by exact-Jaccard verification — don't checkpoint them
        # otherwise (column pruning at the stage boundary)
        if not c.verify_pairs:
            out = out.drop("shingles")
        return out

    def _attach_signatures(self, shingled: DataFrame) -> DataFrame:
        """Add ``min_hashes`` to a (…, node_id, shingles) frame via the
        configured kernel. The JVM kernel aggregates (node_id → signature)
        and joins back only when other columns must survive."""
        c = self.cfg
        if c.minhash_kernel == "jvm":
            sig = minhash_signature_jvm(
                shingled, "shingles", c.num_perm, c.seed, id_col="node_id"
            )
            extra = [f for f in shingled.columns if f != "node_id"]
            if not extra or extra == ["shingles"] and not c.verify_pairs:
                return sig
            return shingled.join(sig, "node_id")
        kernel = (
            minhash_signature_oph if c.minhash_kernel == "oph" else minhash_signature
        )
        return shingled.withColumn(
            "min_hashes", kernel(F.col("shingles"), c.num_perm, c.seed)
        )

    def bands(self, df: DataFrame) -> DataFrame:
        # band_idx is already folded into band_key (functions/hashing.py:36-44)
        # and nothing downstream of the persisted stage reads it — drop it so
        # the checkpoint writes and downstream scans carry 16B/row, not 20B
        return lsh_band_buckets(df, self.cfg.R, self.cfg.B).select("band_key", "node")

    def candidate_edges(self, buckets: DataFrame, signatures: DataFrame) -> DataFrame:
        c = self.cfg
        if c.verify_pairs:
            # pairwise within-bucket candidates so verification can't orphan
            # a true pair via a dropped star edge (see operators/verify.py)
            edges = build_pair_edges_from_buckets(
                buckets.select("band_key", "node"),
                max_bucket_pairwise=c.pairwise_cap,
                num_salts=c.num_salts,
            )
            edges = verify_pairs_exact_jaccard(
                edges, signatures, c.threshold, node_col="node_id", shingle_col="shingles"
            )
        else:
            edges = build_edges_from_buckets(buckets, num_salts=c.num_salts)
        return edges

    # -- orchestration -----------------------------------------------------

    def run(self, df: DataFrame, checkpointer: StageCheckpointer | None = None) -> dict:
        """Execute all stages; returns dict with results/assignments/id_map.

        ``checkpointer`` enables per-stage resume (north rule); without one,
        stage boundaries fall back to localCheckpoint (lineage severing only).
        """
        c = self.cfg
        ck = checkpointer or StageCheckpointer(df.sparkSession, root=c.checkpoint_dir)

        prepped = ck.stage("prepped", self.prep(df))
        id_map = prepped.select(c.index_col, "node_id").distinct()

        # CPU-heavy narrow stages (regex/UDF text work) are row-count
        # partitioned, not byte-partitioned — see _python_stage_parallelism.
        # The count is a cheap job on the just-materialized stage.
        n_rows = prepped.count()
        par = _python_stage_parallelism(
            n_rows, df.sparkSession.sparkContext.defaultParallelism
        )

        # normalize is its own stage boundary: chaining the NFD pandas UDF and
        # the minhash Arrow kernel inside ONE stage measured ~6× slower (two
        # ArrowEvalPython nodes pipelined back-to-back); the reference makes
        # the same call eagerly (FRICTION_LOG.md:32)
        # downstream of prep, rows travel by integer node_id only — the string
        # key stays in id_map and rejoins at merge (smaller caches, and the
        # pandas-UDF stage doesn't ship passthrough strings to Python)
        norm = ck.stage(
            "normalized",
            self.normalize(prepped.repartition(par)).select(
                "node_id", "content_normalized"
            ),
        )
        # materialize the shingle arrays BEFORE the pandas-UDF kernel: feeding
        # the ArrowEvalPython node an expensive unmaterialized projection
        # measured ~8× slower than a bound column (the JVM re-buffers/spills
        # the full input rows around the Python exchange)
        shingled = ck.iter_checkpoint(
            add_shingles(
                norm.repartition(par), "content_normalized", c.ngram_size, "shingles"
            ).select("node_id", "shingles"),
            "shingled",
        )
        sigs_df = self._attach_signatures(shingled)
        if not c.verify_pairs:
            sigs_df = sigs_df.drop("shingles") if "shingles" in sigs_df.columns else sigs_df
        sigs = ck.stage("signatures", sigs_df)
        buckets = ck.stage("bands", self.bands(sigs))
        edges = ck.stage("pairs", self.candidate_edges(buckets, sigs))
        assignments = ck.stage(
            "components",
            connected_components(
                edges,
                algorithm=c.algorithm,
                max_loops=c.max_loops,
                checkpoint=ck.iter_checkpoint,
                driver_fallback_edges=c.cc_driver_fallback_edges,
            ),
        )
        results = merge_results(
            prepped.select(c.index_col, c.content_col),
            assignments,
            id_map,
            index_col=c.index_col,
            component_col=c.component_col,
        )
        clusters = cluster_assignments(
            prepped.select(c.index_col, c.content_col),
            assignments,
            id_map,
            index_col=c.index_col,
            component_col=c.component_col,
        )
        ck.flush_metrics_table()
        return {
            "results": results,
            "assignments": assignments,
            "id_map": id_map,
            "clusters": clusters,
            # intermediate stage handles (already materialized at the stage
            # boundary) — lets callers reuse the run instead of re-executing
            # the pipeline for band-level or prep-level questions
            "prepped": prepped,
            "bands": buckets,
            "shingled": shingled,
            "signatures": sigs,
        }

    def __call__(self, df: DataFrame) -> DataFrame:
        """Reference-shaped entry point: input → deduplicated survivors
        (workload/minhash_dedupe.py:176-185)."""
        return self.run(df)["results"]
