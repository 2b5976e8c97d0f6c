#!/usr/bin/env python
"""Round-6 optimization micro-benchmarks (guide §1.4 noop-sink isolation).

``bench.py`` is the frozen driver-contract harness; this file holds the
same-session A/B comparisons that justified each round-6 change, so they
can be re-run and cited from OPTIMIZATION_r06.md. Every timing noop-sinks
the frame (computes every column, discards the write).

Usage:
    python bench_extra.py --suite scan_skew      # repartition-after-read A/B
    python bench_extra.py --suite media_fanout   # 120-row media slice fan-out
    python bench_extra.py --suite curate_gates   # fused vs split gate stages
    python bench_extra.py --suite stage_timing   # flagship per-stage wall
All suites default to $SPARK_GRAFT_SF_DIR (sf1.0 for the round-6 numbers)
and local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    from daft_minhash_dedupe_spark.session import get_spark

    return get_spark(
        master=f"local[{CPUS}]",
        app_name="bench_extra",
        extra_confs={"spark.sql.shuffle.partitions": str(max(8 * CPUS, 64))},
    )


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def suite_scan_skew(spark) -> dict:
    """The round-6 headline fix: documents.parquet is ONE parquet row group,
    so an un-repartitioned scan runs every narrow stage on one core. A/B a
    window-hash-heavy operator (substring_dup_pairs) on the plain scan vs
    the hash-repartitioned read, interleaved, best of 2 per arm."""
    from pyspark.sql import functions as F

    from daft_minhash_dedupe_spark.extras.substring_dedupe import substring_dup_pairs

    docs_plain = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs_par = docs_plain.repartition(CPUS, F.col("doc_id"))
    runs = {"par": [], "plain": []}
    for _ in range(2):
        runs["par"].append(
            _noop(substring_dup_pairs(docs_par, window_tokens=20, max_posting=500))
        )
        runs["plain"].append(
            _noop(substring_dup_pairs(docs_plain, window_tokens=20, max_posting=500))
        )
    return {
        "suite": "scan_skew",
        "scan_partitions_plain": docs_plain.rdd.getNumPartitions(),
        "best": {k: min(v) for k, v in runs.items()},
        "all_runs": runs,
    }


def suite_media_fanout(spark) -> dict:
    """Why the 120-row media slice uses a SMALL fixed fan-out: the codec
    arms stack ~18 pandas-UDF stages, so a 32-way split leaves ~4 rows per
    Python task and per-task Arrow overhead dominates."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    out = {}
    base = e._docs(spark, SF_DIR).where(F.col("doc_id") < e.MEDIA_DOC_CAP)
    orig = e._media_docs
    try:
        for label, frame in (
            ("plain", base),
            ("par4", base.repartition(4, F.col("doc_id"))),
            (f"par{CPUS}", base.repartition(CPUS, F.col("doc_id"))),
        ):
            e._media_docs = lambda s, d, _f=frame: _f
            out[label] = _noop(e.queries()["media_fp_stats"](spark, SF_DIR))
    finally:
        e._media_docs = orig
    return {"suite": "media_fanout", "seconds": out}


def suite_curate_gates(spark) -> dict:
    """Fused quality+lang single projection vs the shipped split gates:
    the fused expression tree falls off the fast codegen path."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    from daft_minhash_dedupe_spark.extras.text_analysis import (
        language_id,
        quality_score,
    )

    docs = e._docs_par(spark, SF_DIR)
    corpus = docs.where(F.col("doc_id") >= 25)
    fused = (
        corpus.withColumn("quality", quality_score(F.col("text")))
        .withColumn("lang", language_id(F.col("text")))
        .where((F.col("quality") >= 0.5) & F.col("lang").isin("en"))
    )
    split = (
        corpus.withColumn("quality", quality_score(F.col("text")))
        .where(F.col("quality") >= 0.5)
        .localCheckpoint(eager=False)
        .withColumn("lang", language_id(F.col("text")))
        .where(F.col("lang").isin("en"))
    )
    runs = {"fused": [], "split": []}
    for _ in range(2):
        runs["fused"].append(_noop(fused))
        runs["split"].append(_noop(split))
    return {"suite": "curate_gates", "best": {k: min(v) for k, v in runs.items()}, "all_runs": runs}


def suite_stage_timing(spark) -> dict:
    """Per-stage wall clock of the flagship pipeline (warm second run is the
    steady-state number; the cold first run shows session warmup effects)."""
    import __spark_entry__ as e
    from daft_minhash_dedupe_spark.config import DedupeConfig
    from daft_minhash_dedupe_spark.io import StageCheckpointer
    from daft_minhash_dedupe_spark.pipeline import MinHashDedupePipeline

    results = []

    class TimedCk(StageCheckpointer):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.times: dict[str, float] = {}

        def stage(self, name, df):
            t0 = time.time()
            out = super().stage(name, df)
            self.times[name] = round(time.time() - t0, 2)
            return out

    for run in range(2):
        df = e._docs_as_blocks(spark, SF_DIR).localCheckpoint(eager=True)
        df.count()
        ck = TimedCk(spark, root=None)
        t0 = time.time()
        res = MinHashDedupePipeline(DedupeConfig()).run(df, checkpointer=ck)
        res["clusters"].write.format("noop").mode("overwrite").save()
        results.append({"run": run, "total": round(time.time() - t0, 2), "stages": ck.times})
    return {"suite": "stage_timing", "runs": results}


SUITES = {
    "scan_skew": suite_scan_skew,
    "media_fanout": suite_media_fanout,
    "curate_gates": suite_curate_gates,
    "stage_timing": suite_stage_timing,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=sorted(SUITES), required=True)
    args = ap.parse_args()
    spark = _spark()
    try:
        print(json.dumps(SUITES[args.suite](spark)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
