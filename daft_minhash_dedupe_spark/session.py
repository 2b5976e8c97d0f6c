"""SparkSession factory with the engine's scale-oriented defaults.

AQE on (runtime re-plan, partition coalescing, skew-join splitting) replaces
the prior art's static shuffle-partition tuning
(references/chengmao_minhash_spark.py:382-397). Arrow is enabled for the two
pandas UDFs. Iceberg catalog config is attached only when the runtime jar is
actually present (the sandbox has none — parquet fallback in io.py).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # NOTE: AQE's byte-based partition coalescing is correct for the
    # shuffle-heavy relational stages (joins/CC iterations) — forcing a
    # smaller minPartitionSize floor measured INVERSE scaling (tiny-task
    # overhead). CPU-heavy narrow text stages are instead pinned to core
    # count with explicit repartition() in the pipeline.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # bound each Arrow batch handed to the minhash kernel (memory ceiling)
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
    "spark.sql.session.timeZone": "UTC",
    # generous INITIAL shuffle partitioning: AQE coalesces small shuffles
    # down (so tiny runs don't pay tiny-task overhead) but cannot split a
    # too-coarse initial count — 64 measured a 35% throughput loss vs 256 at
    # 10^7 docs (27.9k → 37.7k docs/s, spill-bound CC/band shuffles)
    "spark.sql.shuffle.partitions": "256",
    # Straggler defense: relaunch tasks that run far past their stage's
    # 90th percentile. Observed failure this defends against (round 5, this
    # sandbox): a hypervisor-throttle window (39% CPU steal) lost a
    # JVM<->Python-worker socket wakeup — the executor thread parked in
    # EPoll.wait on PythonRunner's reader while the worker slept in
    # wait_woken, deadlocking one task of 32 forever at 0% CPU. On a real
    # cluster the same class of hang (bad node, flaky NIC) is routine;
    # speculation re-runs the task and the OutputCommitCoordinator
    # deduplicates commits. Conservative multiplier/quantile so healthy
    # skewed tasks aren't double-run.
    # CAVEAT (verified against spark-core 4.1.2 bytecode): TaskSchedulerImpl
    # only starts the speculation scheduler when NOT in local mode, so these
    # settings are cluster-only. In-sandbox resilience to the same hang comes
    # from task retries instead — get_spark() rewrites bare local[N] masters
    # to local[N,4] below, matching the cluster default spark.task.maxFailures
    # (local mode otherwise allows exactly ONE task failure per job).
    "spark.speculation": "true",
    "spark.speculation.multiplier": "4",
    "spark.speculation.quantile": "0.9",
    # when a Python worker dies mid-task (host OOM kill, hard fault), dump its
    # traceback into the executor log so the retry is diagnosable
    "spark.python.worker.faulthandler.enabled": "true",
    "spark.ui.enabled": "false",
}


def _with_local_task_retries(master: str, max_failures: int = 4) -> str:
    """Rewrite ``local[N]``/``local[*]``/``local`` to ``local[N,F]``.

    Local mode defaults to maxFailures=1: one Python-worker crash (a
    throttle-window casualty on this sandbox — see BENCH/BASELINE.md §1) kills
    the whole job, where a real cluster would retry the task up to
    spark.task.maxFailures=4 times. Masters that already carry a failure count
    (``local[8,2]``) and non-local masters pass through untouched. Bare
    ``local`` means ONE thread in Spark, so it rewrites to ``local[1,4]`` —
    preserving parallelism, only adding retries.
    """
    m = re.fullmatch(r"local(?:\[(\*|\d+)\])?", master.strip())
    if not m:
        return master
    return f"local[{m.group(1) or '1'},{max_failures}]"


def get_spark(
    master: str | None = None,
    app_name: str = "daft_minhash_dedupe_spark",
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    master = _with_local_task_retries(master)
    builder = SparkSession.builder.master(master).appName(app_name)
    for k, v in DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    if master.startswith("local"):
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
        )
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if os.environ.get("SPARK_GRAFT_NO_WARMUP") != "1":
        _warm_python_workers(spark)
    return spark


def _warm_python_workers(spark: SparkSession) -> None:
    """Session-bootstrap warmup: spawn the reusable Python UDF workers and pay
    their pandas/pyarrow import cost (~2 s, concurrent) HERE rather than
    inside the first pandas-UDF query a user times. One task per scheduler
    slot so EVERY reusable worker exists warm — a single-row warmup left the
    other cores' workers to spawn (and import pandas) inside the first wide
    pandas-UDF stage, charging ~2-4 s to whichever query hit it first
    (guide §4.5: heavyweight init once per task, amortized — here once per
    session)."""
    try:
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _noop(s: pd.Series) -> pd.Series:
            return s

        n = spark.sparkContext.defaultParallelism
        spark.range(n).repartition(n).select(_noop(F.col("id"))).collect()
    except Exception:
        pass  # warmup is best-effort; never block session creation
