"""io layer: partitioned save, Iceberg-or-parquet fallback, stage metrics."""

import json
from pathlib import Path

from pyspark.sql import functions as F

from daft_minhash_dedupe_spark.io import (
    StageCheckpointer,
    iceberg_available,
    partitioned_save,
    read_table,
    write_table,
)


def test_iceberg_gating(spark):
    # sandbox has no Iceberg runtime jar → parquet fallback must engage
    assert iceberg_available(spark) is False


def test_write_read_table_parquet_fallback(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    target = str(tmp_path / "tbl")
    write_table(df, target)
    got = read_table(spark, target)
    assert {(r["id"], r["s"]) for r in got.collect()} == {(1, "a"), (2, "b")}


def test_partitioned_save_shape(spark, tmp_path):
    df = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "out")
    partitioned_save(df, out, chunk_size=100, max_partitions=4)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    # partition column materialized as directory partitioning
    assert "__pid__" in back.columns
    assert any(p.name.startswith("__pid__=") for p in Path(out).iterdir() if p.is_dir())


def test_stage_checkpointer_metrics_and_resume(spark, tmp_path):
    root = str(tmp_path / "ck")
    ck = StageCheckpointer(spark, root=root, resume=True)
    df = spark.range(0, 100)
    out1 = ck.stage("s1", df)
    assert out1.count() == 100
    assert ck.has("s1")
    m = ck.metrics[0]
    assert m["stage"] == "s1" and m["rows"] == 100
    assert sum(r for _, r in m["partition_rows"]) == 100
    assert (Path(root) / "metrics.jsonl").exists()
    rec = json.loads((Path(root) / "metrics.jsonl").read_text().splitlines()[0])
    assert rec["stage"] == "s1"

    # resume path: a different frame is IGNORED because s1 is complete
    ck2 = StageCheckpointer(spark, root=root, resume=True)
    out2 = ck2.stage("s1", spark.range(0, 5))
    assert out2.count() == 100

    # metrics table flush (parquet fallback)
    ck.flush_metrics_table()
    mt = spark.read.parquet(str(Path(root) / "_metrics"))
    assert mt.where(F.col("stage") == "s1").count() == 1


def test_streaming_lang_counts(spark, tmp_path):
    from daft_minhash_dedupe_spark.streaming import streaming_lang_counts

    src = tmp_path / "src"
    batch = spark.createDataFrame(
        [
            ("u1", "2024-01-01 00:01:00", "en"),
            ("u2", "2024-01-01 00:02:00", "en"),
            ("u3", "2024-01-01 00:15:00", "fr"),
        ],
        "url string, warc_ts string, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    batch.write.parquet(str(src))
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    q = (
        streaming_lang_counts(stream)
        .writeStream.format("memory")
        .queryName("lang_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.awaitTermination(120)
    rows = {(r["lang"], r["n_docs"]) for r in spark.sql("select * from lang_counts").collect()}
    assert ("en", 2) in rows and ("fr", 1) in rows
