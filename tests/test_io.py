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


def test_iceberg_dispatch_logic(monkeypatch):
    """The Iceberg branch can't run live here (no runtime jar on the box),
    so pin its dispatch contract with recording stand-ins: a dotted table
    identifier + available catalog routes through writeTo(...).using(
    'iceberg') / spark.read.table, any path (or no catalog) routes through
    parquet, and a failed createOrReplace falls back to
    overwritePartitions."""
    from daft_minhash_dedupe_spark import io as io_mod

    calls = []

    class FakeV2Writer:
        def __init__(self, target, fail_create=False):
            self.target, self.fail_create = target, fail_create

        def using(self, fmt):
            calls.append(("using", self.target, fmt))
            return self

        def createOrReplace(self):
            if self.fail_create:
                raise RuntimeError("no create privileges")
            calls.append(("createOrReplace", self.target))

        def overwritePartitions(self):
            calls.append(("overwritePartitions", self.target))

    class FakeV1Writer:
        def mode(self, m):
            calls.append(("mode", m))
            return self

        def option(self, *a):
            return self

        def partitionBy(self, *cols):
            calls.append(("partitionBy", cols))
            return self

        def parquet(self, path):
            calls.append(("parquet_write", path))

    class FakeDF:
        def __init__(self, fail_create=False):
            self.sparkSession = FakeSpark()
            self.fail_create = fail_create
            self.write = FakeV1Writer()

        def writeTo(self, target):
            calls.append(("writeTo", target))
            return FakeV2Writer(target, self.fail_create)

    class FakeReader:
        def table(self, name):
            calls.append(("read_table", name))
            return "iceberg_df"

        def parquet(self, path):
            calls.append(("read_parquet", path))
            return "parquet_df"

    class FakeSpark:
        read = FakeReader()

    # catalog available + dotted identifier -> Iceberg v2 writer
    monkeypatch.setattr(io_mod, "iceberg_available", lambda s: True)
    io_mod.write_table(FakeDF(), "cat.db.tbl")
    assert calls == [
        ("writeTo", "cat.db.tbl"),
        ("using", "cat.db.tbl", "iceberg"),
        ("createOrReplace", "cat.db.tbl"),
    ]
    calls.clear()

    # createOrReplace failure -> overwritePartitions fallback
    io_mod.write_table(FakeDF(fail_create=True), "cat.db.tbl")
    assert ("overwritePartitions", "cat.db.tbl") in calls
    calls.clear()

    # a slash means "path": parquet even with a catalog configured
    io_mod.write_table(FakeDF(), "/tmp/somewhere", partition_by=["lang"])
    assert ("parquet_write", "/tmp/somewhere") in calls
    assert ("partitionBy", ("lang",)) in calls
    assert not any(c[0] == "writeTo" for c in calls)
    calls.clear()

    assert io_mod.read_table(FakeSpark(), "cat.db.tbl") == "iceberg_df"
    assert io_mod.read_table(FakeSpark(), "/tmp/somewhere") == "parquet_df"

    # catalog unavailable -> identifier-shaped target still goes parquet
    monkeypatch.setattr(io_mod, "iceberg_available", lambda s: False)
    io_mod.write_table(FakeDF(), "cat.db.tbl")
    assert [c for c in calls if c[0] == "parquet_write"] == [
        ("parquet_write", "cat.db.tbl")
    ]
    assert io_mod.read_table(FakeSpark(), "cat.db.tbl") == "parquet_df"
