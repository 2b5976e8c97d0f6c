"""Physical-plan audits: the optimizations we rely on must be visible in
.explain output (pushdown, pruning, broadcast, whole-stage codegen, partial
aggregation) — these tests pin them so regressions surface as failures."""

from pyspark.sql import functions as F

from daft_minhash_dedupe_spark.operators.banding import salted_bucket_min

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_parquet_filter_pushdown_and_column_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .where(F.col("l_shipdate") < "1996-01-01")
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # only the 3 referenced columns are read
    assert "l_extendedprice" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_broadcast_join_for_small_dimension(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    df = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    assert "BroadcastHashJoin" in _plan(df)


def test_min_agg_has_partial_aggregation(spark):
    buckets = spark.createDataFrame([(1, 2)], "band_key long, node long")
    plan = _plan(buckets.groupBy("band_key").agg(F.min("node")))
    # two HashAggregate nodes: partial (map-side) + final
    assert plan.count("HashAggregate") >= 2


def test_salted_min_two_phase_shape(spark):
    buckets = spark.createDataFrame([(1, 2)], "band_key long, node long")
    plan = _plan(salted_bucket_min(buckets, num_salts=4))
    # stage 1 partial+final on (key, salt), stage 2 partial+final on key
    assert plan.count("HashAggregate") >= 4
    assert "pmod" in plan


def test_whole_stage_codegen_on_agg_path(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    agg.collect()  # AQE shows codegen spans only in the final executed plan
    # formatted mode marks whole-stage-codegen spans with `* ` / codegen ids
    assert "[codegen id :" in _plan(agg)


def test_shingle_path_is_single_scan_no_shuffle(spark):
    # higher-order transform() exprs are CodegenFallback in Spark (expected),
    # but the shingle path must stay a narrow single-scan plan: no Exchange
    from daft_minhash_dedupe_spark.functions.minhash import add_shingles

    df = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(add_shingles(df, "text", 5, "sh").select("doc_id", "sh"))
    assert "Exchange" not in plan
    assert "Scan parquet" in plan


def test_left_anti_join_plan(spark):
    a = spark.createDataFrame([(1, 2)], "u long, v long")
    b = spark.createDataFrame([(1, 2)], "u long, v long")
    plan = _plan(a.join(b, ["u", "v"], "left_anti"))
    assert "LeftAnti" in plan


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Co-located join: two tables bucketed on the join key must join with
    ZERO Exchange nodes (the shuffle-free lever for reused 100-TB tables)."""
    from daft_minhash_dedupe_spark.io import bucketed_save

    a = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("x"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("y"))
    bucketed_save(a, "bkt_a", "k", n_buckets=8, sort_col="k")
    bucketed_save(b, "bkt_b", "k", n_buckets=8, sort_col="k")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = _plan(joined)
        # sort-merge join straight off the bucket layout: no ShuffleExchange
        # (broadcast disabled so the small test tables don't sidestep it)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_incremental_state_bucketed_fold_and_semijoin_shuffle_free(spark, tmp_path):
    """The two per-batch state touches of incremental dedup must never
    shuffle the corpus-sized side when the state uses the bucketed backend:
    (a) the assignment fold (groupBy u over components CLUSTERED BY u) has
    ZERO Exchange; (b) the old-bands semi-join on band_key shuffles ONLY the
    new batch's touched-keys side (exactly one Exchange, none above the
    bucketed scan)."""
    from daft_minhash_dedupe_spark.operators.state import IncrementalState

    state = IncrementalState(spark, str(tmp_path / "bstate"), n_buckets=8)
    bands = spark.range(0, 2000).select(
        (F.col("id") % 97).alias("band_key"), F.col("id").alias("node")
    )
    assigns = spark.range(0, 500).select(
        F.col("id").alias("u"), (F.col("id") % 50).alias("rep")
    )
    state.bootstrap(bands, assigns, {"num_perm": 64})
    state.append(bands.where("node >= 1900"), assigns.where("u >= 450"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fold_plan = _plan(state.read_assignments())
        assert "Exchange" not in fold_plan, fold_plan
        assert "Bucketed: true" in fold_plan

        touched = (
            spark.range(0, 10).select((F.col("id") * 7).alias("band_key")).distinct()
        )
        joined = state.read_bands().join(touched, "band_key")
        plan = _plan(joined)
        import re

        # formatted mode prints each node in the tree AND a detail section —
        # count distinct Exchange node ids
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan  # touched side only
        assert "Bucketed: true" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_curate_corpus_gates_in_scan_stage(spark):
    """The curation pipeline's quality and language gates must stay pure
    Catalyst (no Python nodes anywhere in the plan) and be evaluated against
    the scan (the corpus id predicate reaches PushedFilters), with the
    exact-dedup keep-set and decontamination index joined by broadcast.

    Round 6: the gate survivors sit behind lazy localCheckpoint barriers
    (each downstream stage re-read them 2-4x), so the final plan roots at a
    LogicalRDD and the scan node is only visible in the GATE stage's own
    plan — assert each property where it is observable."""
    from daft_minhash_dedupe_spark.extras.curate import curate_corpus
    from daft_minhash_dedupe_spark.extras.text_analysis import quality_score

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus = docs.where(F.col("doc_id") >= 25)
    bench = docs.where(F.col("doc_id") < 25)
    plan = _plan(curate_corpus(corpus, bench, languages=("en",)))
    assert "Python" not in plan, plan  # no UDF fell into the hot path
    assert "BroadcastHashJoin" in plan
    gate = corpus.withColumn("quality", quality_score(F.col("text"))).where(
        F.col("quality") >= 0.5
    )
    gate_plan = _plan(gate)
    assert "Python" not in gate_plan, gate_plan
    assert (
        "PushedFilters: [IsNotNull(doc_id), GreaterThanOrEqual(doc_id,25"
        in gate_plan
    )


def test_exact_substring_removal_plan_shape(spark):
    """The span-removal hot path must stay JVM-side and partial-aggregated:
    no Python eval anywhere (window hashing is pure Catalyst), and the
    duplicated-window count partial-combines map-side so a corpus-wide
    window reaches its reducer as O(tasks) rows."""
    from daft_minhash_dedupe_spark.extras.exact_substring import (
        duplicated_windows,
        remove_duplicate_spans,
        window_postings,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    full = _plan(remove_duplicate_spans(docs, window_tokens=8))
    assert "BatchEvalPython" not in full and "ArrowEvalPython" not in full
    bl = _plan(duplicated_windows(window_postings(docs, window_tokens=8), "doc_id"))
    # distinct (partial+final) then count (partial+final)
    assert bl.count("HashAggregate") >= 4


def test_deterministic_sample_is_scan_stage(spark):
    """The sampling predicate is a pure per-row filter over the scan — no
    Exchange, no join, no aggregate anywhere in the plan (the property that
    makes it 100-TB-safe and repartition-stable)."""
    from daft_minhash_dedupe_spark.extras.sampling import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(stratified_sample(docs, {"en": 0.5, "fr": 0.1}, strata_col="lang"))
    for node in ("Exchange", "Join", "Aggregate", "Generate"):
        assert node not in plan, node
    assert "Filter" in plan
