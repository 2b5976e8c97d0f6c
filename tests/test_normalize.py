"""Normalization semantics pinned by the reference
(tests/test_minhash_dedupe_unit.py:194-214)."""

import pytest
from pyspark.sql import functions as F

from daft_minhash_dedupe_spark.functions.normalize import normalize_text

# composed form on input; NFD keeps the combining acute after decomposition
PINNED_IN = "Hello, World! cafés  \t\n"


def _norm(spark, text, flags):
    df = spark.createDataFrame([(text,)], "block_text string")
    remove_punct, lowercase, nfd, ws = flags
    return df.select(
        normalize_text(F.col("block_text"), remove_punct, lowercase, nfd, ws).alias("n")
    ).first()["n"]


def test_normalize_all_flags_pinned(spark):
    # reference pin: all-flags → "hello world cafés"
    # (tests/test_minhash_dedupe_unit.py:202-214)
    assert _norm(spark, PINNED_IN, (True, True, True, True)) == "hello world cafés"


def test_normalize_no_flags_identity(spark):
    assert _norm(spark, PINNED_IN, (False, False, False, False)) == PINNED_IN


def test_normalize_pipeline_default_flags(spark):
    # pipeline defaults: remove_punct=True, lowercase=False, nfd=True, ws=True
    assert _norm(spark, PINNED_IN, (True, False, True, True)) == "Hello World cafés"


@pytest.mark.parametrize(
    "flags",
    [
        (True, True, True, True),
        (True, False, True, True),
        (False, True, False, True),
        (True, True, False, False),
    ],
)
def test_normalize_idempotent(spark, flags):
    samples = [
        PINNED_IN,
        "  a  b\tc\nd  ",
        "ABC!!! def??? Ééñ",
        "",
        "no-punct but-dashes",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    once = df.select(normalize_text(F.col("t"), *flags).alias("n"))
    twice = once.select(normalize_text(F.col("n"), *flags).alias("n"))
    assert [r["n"] for r in once.collect()] == [r["n"] for r in twice.collect()]


def test_normalize_null_safe(spark):
    df = spark.createDataFrame([(None,)], "t string")
    out = df.select(normalize_text(F.col("t")).alias("n")).first()["n"]
    assert out is None


def test_normalize_dataframe_matches_column_expr(spark):
    from daft_minhash_dedupe_spark.functions.normalize import normalize_dataframe

    samples = [PINNED_IN, "pure ascii text  here", "", None, "mixé ascii ñon", "Ünïcode  only"]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i long, t string")
    for flags in [(True, True, True, True), (True, False, True, True), (False, False, True, False)]:
        via_df = {
            r["i"]: r["n"]
            for r in normalize_dataframe(df, "t", "n", *flags).collect()
        }
        via_col = {
            r["i"]: r["n"]
            for r in df.select("i", normalize_text(F.col("t"), *flags).alias("n")).collect()
        }
        assert via_df == via_col, flags
