"""Streaming near-duplicate suppression: a NEAR duplicate (not byte-equal)
arriving within the horizon is dropped; the same content arriving after the
horizon has passed is kept; exact-novel docs always pass."""

import datetime as dt

from daft_minhash_dedupe_spark.config import DedupeConfig
from daft_minhash_dedupe_spark.streaming import streaming_near_dedupe


def _text(seed_tokens, edit=None):
    toks = [f"tok{i:04d}" for i in seed_tokens]
    if edit is not None:
        toks[edit] = "EDITED"
    return " ".join(toks)


def test_streaming_near_dedupe_horizon(spark, tmp_path):
    base = _text(range(500))
    near = _text(range(500), edit=250)        # 1 of 500 tokens changed
    near2 = _text(range(500), edit=100)       # different edit, still near-dup
    other = _text(range(1000, 1500))          # unrelated

    def t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    schema = "block_id string, block_text string, warc_ts timestamp"
    src = tmp_path / "src"
    src.mkdir()

    def write(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / name))

    # b1: original + an IN-BATCH near-dup with later ts + an unrelated doc
    write("b1", [("A", base, t(1, 0)), ("A2", near2, t(1, 5)), ("U1", other, t(1, 0))])
    # b2: near-dup 30 min later (within 1h horizon) -> suppressed
    write("b2", [("B", near, t(1, 30))])
    # b3: the SAME near-dup text 5 hours later (outside horizon) -> kept
    write("b3", [("C", near, t(6, 0))])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = streaming_near_dedupe(
        stream,
        DedupeConfig(),
        state_dir=str(tmp_path / "state"),
        survivors_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        horizon="1 hour",
    )
    q.awaitTermination(300)

    kept = {
        r["block_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert kept == {"A", "U1", "C"}, kept


def test_streaming_near_dedupe_restart_resumes(spark, tmp_path):
    """Restarting the stream against the same checkpoint must not reprocess
    (idempotent batch-id-named state/survivor partitions) and must keep
    suppressing against state built before the restart."""
    base = _text(range(400))
    near = _text(range(400), edit=7)

    def t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    schema = "block_id string, block_text string, warc_ts timestamp"
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame([("A", base, t(1))], schema).coalesce(1).write.parquet(
        str(src / "b1")
    )

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        return streaming_near_dedupe(
            stream,
            DedupeConfig(),
            state_dir=str(tmp_path / "state"),
            survivors_dir=str(tmp_path / "out"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            horizon="1 hour",
        )

    q = start()
    q.awaitTermination(300)
    # new file lands while "offline"; restart picks it up from the checkpoint
    spark.createDataFrame([("B", near, t(1, 20))], schema).coalesce(1).write.parquet(
        str(src / "b2")
    )
    q = start()
    q.awaitTermination(300)
    kept = {r["block_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert kept == {"A"}, kept
