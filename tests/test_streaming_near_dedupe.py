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


def _mk_snd(tmp_path, horizon="1 hour"):
    from daft_minhash_dedupe_spark.streaming.near_dedupe import StreamingNearDedupe

    return StreamingNearDedupe(
        DedupeConfig(),
        state_dir=str(tmp_path / "state"),
        survivors_dir=str(tmp_path / "out"),
        horizon=horizon,
    )


def test_near_dedupe_crash_replay_is_idempotent(spark, tmp_path):
    """A retried micro-batch (state written, streaming checkpoint not yet
    committed) must reproduce its ORIGINAL survivors: the state read excludes
    batch_id >= current, so a batch never suppresses against its own
    half-committed band partition."""
    snd = _mk_snd(tmp_path)
    schema = "block_id string, block_text string, warc_ts timestamp"
    b0 = spark.createDataFrame(
        [("A", _text(range(300)), dt.datetime(2024, 1, 1, 1))], schema
    )
    snd(b0, 0)
    first = {r["block_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert first == {"A"}
    snd(b0, 0)  # crash-replay of the same batch id
    again = {r["block_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert again == {"A"}, "replayed batch suppressed itself against its own state"
    # and a genuinely later near-dup batch is still suppressed by batch 0
    b1 = spark.createDataFrame(
        [("B", _text(range(300), edit=5), dt.datetime(2024, 1, 1, 1, 20))], schema
    )
    snd(b1, 1)
    kept = {r["block_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert kept == {"A"}


def test_near_dedupe_future_sighting_does_not_suppress(spark, tmp_path):
    """History check is bounded above: an out-of-order doc whose event time
    PRECEDES every stored sighting of its bands is kept (the documented
    'seen within the horizon BEFORE its event time' semantics)."""
    snd = _mk_snd(tmp_path)
    schema = "block_id string, block_text string, warc_ts timestamp"
    snd(
        spark.createDataFrame(
            [("A", _text(range(300)), dt.datetime(2024, 1, 1, 10))], schema
        ),
        0,
    )
    # near-dup of A but event time 2h EARLIER than A's sighting
    snd(
        spark.createDataFrame(
            [("B", _text(range(300), edit=3), dt.datetime(2024, 1, 1, 8))], schema
        ),
        1,
    )
    kept = {r["block_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert kept == {"A", "B"}, kept


def test_near_dedupe_state_read_prunes_expired_partitions(spark, tmp_path):
    """The per-batch state scan must exclude bucket partitions outside
    [min_doc_bucket - 1, max_doc_bucket] and the current batch's own
    partition — verified via input_file_name on the candidate scan."""
    from pyspark.sql import functions as F

    snd = _mk_snd(tmp_path)  # horizon 3600s -> bucket = floor(epoch/3600)
    schema = "block_id string, block_text string, warc_ts timestamp"
    old_ts = dt.datetime(2024, 1, 1, 1)
    new_ts = dt.datetime(2024, 1, 10, 1)
    snd(spark.createDataFrame([("A", _text(range(300)), old_ts)], schema), 0)
    snd(spark.createDataFrame([("B", _text(range(900, 1200)), new_ts)], schema), 1)

    bucket = lambda t: int(t.timestamp() // 3600)  # noqa: E731
    cand = snd._state_candidates(spark, 2, bucket(new_ts), bucket(new_ts))
    files = {
        r[0] for r in cand.select(F.input_file_name()).distinct().collect()
    }
    assert files, "recent partition must be read"
    assert all(f"ts_bucket={bucket(new_ts)}" in f for f in files), files
    assert not any(f"ts_bucket={bucket(old_ts)}" in f for f in files), (
        "expired bucket partition was read"
    )
    # replay view for batch 1 must not see batch 1's own partition
    cand1 = snd._state_candidates(spark, 1, bucket(old_ts), bucket(new_ts))
    files1 = {
        r[0] for r in cand1.select(F.input_file_name()).distinct().collect()
    }
    assert files1 and not any("batch_id=1" in f for f in files1), files1


def test_near_dedupe_expire_state_gc(spark, tmp_path):
    """expire_state deletes bucket dirs older than the frontier horizon and
    keeps live ones; suppression against retained state still works."""
    snd = _mk_snd(tmp_path)
    schema = "block_id string, block_text string, warc_ts timestamp"
    old_ts = dt.datetime(2024, 1, 1, 1)
    new_ts = dt.datetime(2024, 1, 10, 1)
    snd(spark.createDataFrame([("A", _text(range(300)), old_ts)], schema), 0)
    snd(spark.createDataFrame([("B", _text(range(900, 1200)), new_ts)], schema), 1)

    removed = snd.expire_state(spark, new_ts)
    assert removed == 1, removed
    import glob

    live = glob.glob(str(tmp_path / "state" / "bands" / "batch_id=*" / "ts_bucket=*"))
    assert len(live) == 1 and "batch_id=1" in live[0], live
    # retained state still suppresses a within-horizon near-dup of B
    snd(
        spark.createDataFrame(
            [("C", _text(range(900, 1200), edit=10), new_ts + dt.timedelta(minutes=30))],
            schema,
        ),
        2,
    )
    kept = {r["block_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert kept == {"A", "B"}, kept


def test_streaming_near_dedupe_custom_column_names(spark, tmp_path):
    """text_col/id_col/ts_col that differ from the cfg contract must work —
    and must win even when the frame ALSO carries columns named like the
    cfg defaults (regression: _bands_of fed the raw batch to pipe.prep,
    which read cfg.content_col='block_text' regardless of text_col)."""
    from daft_minhash_dedupe_spark.streaming.near_dedupe import StreamingNearDedupe

    base = _text(range(400))
    near = _text(range(400), edit=3)
    decoy = _text(range(2000, 2400))  # unrelated text planted in block_text

    def t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    schema = (
        "doc_id string, text string, event_ts timestamp, "
        "block_id string, block_text string"
    )
    snd = StreamingNearDedupe(
        DedupeConfig(),
        state_dir=str(tmp_path / "state"),
        survivors_dir=str(tmp_path / "out"),
        horizon="1 hour",
        text_col="text",
        id_col="doc_id",
        ts_col="event_ts",
    )
    # decoy block_text columns are DIFFERENT texts: if dedup ran on them,
    # B would survive; dedup on `text` suppresses B as a near-dup of A
    snd(
        spark.createDataFrame(
            [("A", base, t(1), "zA", decoy)], schema
        ),
        0,
    )
    snd(
        spark.createDataFrame(
            [("B", near, t(1, 30), "zB", _text(range(3000, 3400)))], schema
        ),
        1,
    )
    kept = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert kept == {"A"}, kept


def test_streaming_near_dedupe_null_event_times(spark, tmp_path):
    """An all-null event-time micro-batch must not kill the query
    (regression: int(None) TypeError inside foreachBatch), and null-ts
    rows mixed into a batch pass through without entering state."""
    from daft_minhash_dedupe_spark.streaming.near_dedupe import StreamingNearDedupe

    base = _text(range(400))
    near = _text(range(400), edit=5)
    schema = "block_id string, block_text string, warc_ts timestamp"
    snd = StreamingNearDedupe(
        DedupeConfig(),
        state_dir=str(tmp_path / "state"),
        survivors_dir=str(tmp_path / "out"),
        horizon="1 hour",
    )
    # batch 0: every row has null ts -> all survive, no state written
    snd(spark.createDataFrame([("N1", base, None), ("N2", near, None)], schema), 0)
    # batch 1: valid ts + one null-ts row; the null row survives even
    # though its text near-dups A (it has no place on the timeline)
    snd(
        spark.createDataFrame(
            [
                ("A", base, dt.datetime(2024, 1, 1, 1)),
                ("N3", near, None),
            ],
            schema,
        ),
        1,
    )
    # batch 2: in-horizon near-dup of A -> suppressed by state
    snd(
        spark.createDataFrame(
            [("B", near, dt.datetime(2024, 1, 1, 1, 30))], schema
        ),
        2,
    )
    kept = {r["block_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert kept == {"N1", "N2", "A", "N3"}, kept
