"""Tiered dedup cascade: planted corpus where each tier removes exactly one
known family, with hand-derived per-tier counts."""

from pyspark.sql import functions as F

from daft_minhash_dedupe_spark.extras.tiered import tiered_dedupe, tiered_stats

BANNER1 = "banner one"
BANNER2 = "banner two"


def _corpus(spark):
    rows = []
    # exact-dup family: tier 0 keeps id 0
    for i in (0, 1, 2):
        rows.append((i, "the quick brown fox jumps over the lazy dog tonight"))
    # banner-one hosts (unique bodies, shared boilerplate line)
    for i in range(10, 15):
        rows.append((i, f"unique body number {i}\n{BANNER1}"))
    # revealed exact dup: same body, different (boilerplate) banners
    rows.append((20, f"shared body text here\n{BANNER1}"))
    rows.append((21, f"shared body text here\n{BANNER2}"))
    # banner-two hosts
    for i in range(30, 35):
        rows.append((i, f"other body number {i}\n{BANNER2}"))
    # pure-boilerplate doc: dropped once its only line is stripped
    rows.append((40, BANNER1))
    # near-dup pair for the minhash tier: 40 tokens, last token differs
    base = " ".join(f"tok{j}" for j in range(39))
    rows.append((50, base + " ending"))
    rows.append((51, base + " finale"))
    # untouched singleton
    rows.append((60, "completely standalone document text"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tiered_dedupe_each_tier_removes_its_family(spark, tmp_path):
    res = tiered_dedupe(_corpus(spark), line_min_dup_docs=5)
    by_tier = {m["tier"]: m for m in res["metrics"]}

    assert by_tier["exact"] == {"tier": "exact", "docs_in": 19, "docs_out": 17}
    assert by_tier["line_boilerplate"]["docs_out"] == 16  # id 40 dropped
    assert by_tier["exact_after_line"]["docs_out"] == 15  # id 21 dropped
    assert by_tier["minhash"]["docs_out"] == 14  # id 51 merged into 50

    kept = {r["doc_id"] for r in res["survivors"].select("doc_id").collect()}
    # the minhash tier keeps the flagship's representative = min deterministic
    # node HASH, so either of {50, 51} may be the survivor (but exactly one)
    assert len(kept & {50, 51}) == 1
    assert kept - {50, 51} == {0, 10, 11, 12, 13, 14, 20, 30, 31, 32, 33, 34, 60}

    assert by_tier["minhash"]["docs_in"] == 15

    # cleaned text: banners stripped, bodies intact
    cleaned = dict(
        res["survivors"].select("doc_id", "cleaned_text").collect()
    )
    assert cleaned[20] == "shared body text here"
    assert cleaned[10] == "unique body number 10"
    assert cleaned[60] == "completely standalone document text"


def test_tiered_stats_dataframe(spark):
    res = tiered_dedupe(_corpus(spark), line_min_dup_docs=5, run_minhash=False)
    stats = tiered_stats(res).orderBy("tier").collect()
    assert [r["tier"] for r in stats] == [
        "exact",
        "exact_after_line",
        "line_boilerplate",
    ]
    # docs_out of one tier == docs_in of the next in cascade order
    m = {r["tier"]: r for r in stats}
    assert m["line_boilerplate"]["docs_in"] == m["exact"]["docs_out"]
    assert m["exact_after_line"]["docs_in"] == m["line_boilerplate"]["docs_out"]


def test_tiered_without_line_tier(spark):
    res = tiered_dedupe(_corpus(spark), line_min_dup_docs=None, run_minhash=False)
    # only the exact tier runs; banner docs all survive (distinct raw texts)
    assert [m["tier"] for m in res["metrics"]] == ["exact"]
    assert res["survivors"].count() == 17
    assert res["cleaned_col"] == "text"


def test_tiered_substr_tier_and_reveal(spark):
    """substr tier (k=4): shared 4-token runs are cut; two docs that become
    identical after the cut merge at exact_after_substr; a doc that IS a
    shared run is dropped empty. Hand-derived counts."""
    r1 = "r1a r1b r1c r1d"
    r2 = "r2a r2b r2c r2d"
    rows = [
        (0, f"ppp qqq {r1}"),            # cleaned -> "ppp qqq"
        (1, f"sss ttt {r2}"),            # cleaned -> "sss ttt"
        (2, f"{r1} tail tok trio"),      # cleaned -> "tail tok trio"
        (3, f"{r2} tail tok trio"),      # cleaned -> "tail tok trio" (= doc 2)
        (4, r1),                          # fully covered -> dropped
        (5, "totally unrelated words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = tiered_dedupe(
        df,
        line_min_dup_docs=None,
        substring_window_tokens=4,
        run_minhash=False,
    )
    by_tier = {m["tier"]: m for m in res["metrics"]}
    assert [m["tier"] for m in res["metrics"]] == [
        "exact", "substr_spans", "exact_after_substr",
    ]
    assert by_tier["exact"] == {"tier": "exact", "docs_in": 6, "docs_out": 6}
    assert by_tier["substr_spans"]["docs_out"] == 5   # doc 4 emptied
    assert by_tier["exact_after_substr"]["docs_out"] == 4  # doc 3 merged into 2

    assert res["cleaned_col"] == "substr_text"
    cleaned = dict(res["survivors"].select("doc_id", "substr_text").collect())
    assert cleaned == {
        0: "ppp qqq",
        1: "sss ttt",
        2: "tail tok trio",
        5: "totally unrelated words here",
    }


def test_tiered_line_then_substr_composition(spark):
    """Both rewrite tiers together: the banner line goes at the line tier,
    then the cross-line shared run goes at the substr tier."""
    banner = "cookie banner text"
    run = "w1 w2 w3 w4"
    rows = [(i, f"doc body {i}\n{banner}") for i in range(5)]
    rows.append((10, f"lead in {run}\n{banner}"))
    rows.append((11, f"{run} trailing words"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = tiered_dedupe(
        df,
        line_min_dup_docs=5,
        substring_window_tokens=4,
        run_minhash=False,
    )
    assert [m["tier"] for m in res["metrics"]] == [
        "exact", "line_boilerplate", "exact_after_line",
        "substr_spans", "exact_after_substr",
    ]
    cleaned = dict(res["survivors"].select("doc_id", "substr_text").collect())
    # line tier cut the banner (5+ docs), substr tier cut the shared run
    # (3-token banner is below k=4, so it could only fall to the line tier)
    assert cleaned[10] == "lead in"
    assert cleaned[11] == "trailing words"
    assert cleaned[0] == "doc body 0"
