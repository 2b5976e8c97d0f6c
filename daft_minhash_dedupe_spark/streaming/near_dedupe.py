"""Streaming NEAR-duplicate suppression — the streaming analogue of the
flagship MinHash/LSH pipeline (the round-2 streaming surface had exact dedup
only).

Semantics: a document is suppressed when ANY of its LSH band keys was seen
within the ``horizon`` before its event time (the same any-band candidate
rule the batch pipeline uses), against both earlier stream history and
earlier rows of its own micro-batch. A near-duplicate arriving after the
horizon has passed is kept — it starts a new "epoch" for its content, the
``dropDuplicatesWithinWatermark`` TTL contract generalized from exact keys
to LSH band keys.

Why ``foreachBatch`` and not a chained stateful-operator plan: the any-band
rule needs TWO keyed stateful steps (band-key ownership, then an all-bands
verdict per doc), and Spark rejects chained ``applyInPandasWithState``
("Multiple applyInPandasWithStates are not supported"); the Spark 4 API that
lifts this (``transformWithStateInPandas`` with ``eventTimeColumnName``)
needs the protobuf package, absent in this environment. ``foreachBatch`` is
the documented escape hatch for stateful logic beyond the operator algebra,
and it lets the stream share the engine's append-only ``IncrementalState``
layout: each micro-batch appends ONE (band_key, last_ts) partition — O(batch)
state writes, idempotent on batch replay (the batch id names the partition,
a retried batch overwrites only its own directory), restart-safe via the
normal streaming checkpoint.

State reads prune by event time (band rows older than the horizon can't
suppress), so state files older than the horizon can be garbage-collected
out-of-band at any time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from daft_minhash_dedupe_spark.config import DedupeConfig
from daft_minhash_dedupe_spark.streaming.sessionize import _parse_duration_seconds


class StreamingNearDedupe:
    """foreachBatch processor: near-dup suppression with band-key TTL state.

    Usage::

        snd = StreamingNearDedupe(cfg, state_dir, survivors_dir, horizon="1 hour")
        query = (stream.writeStream.foreachBatch(snd)
                 .option("checkpointLocation", ckpt).start())
    """

    def __init__(
        self,
        cfg: DedupeConfig,
        state_dir: str,
        survivors_dir: str,
        horizon: str = "1 hour",
        text_col: str = "block_text",
        id_col: str = "block_id",
        ts_col: str = "warc_ts",
    ):
        self.cfg = cfg
        self.state_dir = state_dir.rstrip("/")
        self.survivors_dir = survivors_dir.rstrip("/")
        self.horizon_s = _parse_duration_seconds(horizon)
        self.text_col = text_col
        self.id_col = id_col
        self.ts_col = ts_col

    # -- state ---------------------------------------------------------------
    def _bands_of(self, batch: DataFrame) -> DataFrame:
        """(band_key, node, id, ts) via the batch pipeline's signature kernel."""
        from daft_minhash_dedupe_spark.pipeline import MinHashDedupePipeline

        pipe = MinHashDedupePipeline(self.cfg)
        prepped = pipe.prep(batch).localCheckpoint(eager=False)
        bands = pipe.bands(pipe.signatures(pipe.normalize(prepped)))
        meta = batch.select(
            F.col(self.id_col), F.col(self.ts_col).alias("_ts")
        ).join(
            prepped.select(self.id_col, "node_id"), self.id_col
        )
        return bands.select("band_key", "node").join(
            meta.withColumnRenamed("node_id", "node"), "node"
        )

    def _read_state(self, spark) -> DataFrame:
        from daft_minhash_dedupe_spark.operators.state import _exists

        path = f"{self.state_dir}/bands"
        if not _exists(spark, path):
            return spark.createDataFrame([], "band_key long, last_ts timestamp")
        return (
            spark.read.parquet(path)
            .groupBy("band_key")
            .agg(F.max("last_ts").alias("last_ts"))
        )

    # -- the micro-batch fold ------------------------------------------------
    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        bands = self._bands_of(batch).localCheckpoint(eager=True)
        horizon = F.expr(f"INTERVAL {int(self.horizon_s)} SECONDS")

        # history suppression: any band seen within the horizon before ts
        state = self._read_state(spark)
        hist_hit = (
            bands.join(state, "band_key")
            .where(F.col("last_ts") >= F.col("_ts") - horizon)
            .select(self.id_col)
            .distinct()
        )
        # within-batch suppression: the earliest (ts, id) row of a band owns
        # it; any OTHER doc sharing that band is a near-dup candidate of an
        # earlier row (greedy first-wins, like dropDuplicatesWithinWatermark)
        owner = bands.groupBy("band_key").agg(
            F.min(F.struct(F.col("_ts"), F.col(self.id_col))).alias("_own")
        )
        intra_hit = (
            bands.join(owner, "band_key")
            .where(F.col("_own." + self.id_col) != F.col(self.id_col))
            .select(self.id_col)
            .distinct()
        )
        suppressed = hist_hit.unionByName(intra_hit).distinct()
        survivors = batch.join(suppressed, self.id_col, "left_anti")
        survivors.write.mode("overwrite").parquet(
            f"{self.survivors_dir}/batch_id={batch_id}"
        )
        # O(batch) state append — ALL seen bands enter state (suppressed docs
        # included: chains A~B~C collapse onto the first survivor); the batch
        # id names the partition so a replayed batch is idempotent
        (
            bands.groupBy("band_key")
            .agg(F.max("_ts").alias("last_ts"))
            .write.mode("overwrite")
            .parquet(f"{self.state_dir}/bands/batch_id={batch_id}")
        )


def streaming_near_dedupe(
    stream: DataFrame,
    cfg: DedupeConfig,
    state_dir: str,
    survivors_dir: str,
    checkpoint_dir: str,
    horizon: str = "1 hour",
    text_col: str = "block_text",
    id_col: str = "block_id",
    ts_col: str = "warc_ts",
    trigger_available_now: bool = True,
):
    """Start the near-dup-suppressing stream; survivors land under
    ``survivors_dir/batch_id=N`` as they clear the band-key horizon check."""
    snd = StreamingNearDedupe(
        cfg, state_dir, survivors_dir, horizon, text_col, id_col, ts_col
    )
    writer = stream.writeStream.foreachBatch(snd).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
