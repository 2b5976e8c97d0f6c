"""Bloom-filter membership dedup + fuzzy (Jaccard) decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, texts, id_offset=0):
    return spark.createDataFrame(
        [(i + id_offset, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


# -- fuzzy contamination -----------------------------------------------------


def test_fuzzy_contamination_hand_derived_jaccard(spark):
    """bench 'a b c d e f' has 2 distinct 5-gram windows; corpus doc 10 adds
    one token → 3 windows sharing 2 → J = 2/(2+3-2) = 2/3."""
    from daft_minhash_dedupe_spark.extras.decontaminate import (
        fuzzy_contamination_pairs,
    )

    bench = _docs(spark, ["a b c d e f"])
    corpus = _docs(spark, ["a b c d e f g", "totally unrelated words here now"], 10)
    pairs = {
        (r["doc_id"], r["bench_id"], r["jaccard"])
        for r in fuzzy_contamination_pairs(corpus, bench, ngram=5, threshold=0.5).collect()
    }
    assert pairs == {(10, 0, 0.666667)}


def test_fuzzy_contamination_identical_doc_is_jaccard_one(spark):
    from daft_minhash_dedupe_spark.extras.decontaminate import (
        fuzzy_contamination_pairs,
    )

    bench = _docs(spark, ["the quick brown fox jumps over the lazy dog"])
    corpus = _docs(spark, ["the quick brown fox jumps over the lazy dog"], 10)
    [(doc, b, j)] = [
        (r["doc_id"], r["bench_id"], r["jaccard"])
        for r in fuzzy_contamination_pairs(corpus, bench).collect()
    ]
    assert (doc, b, j) == (10, 0, 1.0)


def test_fuzzy_contamination_threshold_excludes_light_overlap(spark):
    """One shared window out of many stays below a 0.5 bar (the case the
    verbatim 13-gram rule would flag but the overlap-ratio rule keeps)."""
    from daft_minhash_dedupe_spark.extras.decontaminate import (
        contamination_pairs,
        fuzzy_contamination_pairs,
    )

    bench = _docs(spark, ["one two three four five"])
    corpus = _docs(
        spark, ["w1 w2 w3 w4 w5 w6 w7 w8 one two three four five w9 w10 w11"], 10
    )
    verbatim = contamination_pairs(corpus, bench, ngram=5).count()
    fuzzy = fuzzy_contamination_pairs(corpus, bench, ngram=5, threshold=0.5).count()
    assert verbatim == 1 and fuzzy == 0


def test_fuzzy_decontaminate_removes_near_dup_docs(spark):
    from daft_minhash_dedupe_spark.extras.decontaminate import fuzzy_decontaminate

    bench = _docs(spark, ["alpha beta gamma delta epsilon zeta eta theta"])
    corpus = _docs(
        spark,
        [
            "alpha beta gamma delta epsilon zeta eta theta iota",  # near-dup
            "completely different text with other words in it",
        ],
        10,
    )
    kept = {r["doc_id"] for r in fuzzy_decontaminate(corpus, bench).collect()}
    assert kept == {11}


# -- bloom dedup ---------------------------------------------------------


def test_bloom_no_false_negatives_any_sizing(spark):
    """Every verbatim re-occurrence flags true — the Bloom guarantee —
    even at a pathologically small (saturated) filter."""
    from daft_minhash_dedupe_spark.extras.bloom_dedupe import flag_bloom_duplicates

    texts = [f"document number {i} with some body text" for i in range(50)]
    seen = _docs(spark, texts)
    batch = _docs(spark, texts, 1000)  # all verbatim recrawls
    for m in (64, 1 << 20):
        flags = flag_bloom_duplicates(seen, batch, m=m, k=3).collect()
        assert all(r["bloom_hit"] for r in flags) and len(flags) == 50


def test_bloom_unseen_docs_pass_at_adequate_m(spark):
    from daft_minhash_dedupe_spark.extras.bloom_dedupe import (
        bloom_dedupe,
        expected_fpr,
        flag_bloom_duplicates,
    )

    seen = _docs(spark, [f"seen doc {i} text body" for i in range(100)])
    batch = _docs(
        spark,
        [f"fresh doc {i} other words" for i in range(100)]
        + ["seen doc 7 text body"],  # one recrawl
        1000,
    )
    m, k = 1 << 20, 4
    assert expected_fpr(100, m, k) < 1e-10
    flags = {r["doc_id"]: r["bloom_hit"] for r in
             flag_bloom_duplicates(seen, batch, m=m, k=k).collect()}
    assert flags[1100] is True
    assert sum(flags.values()) == 1  # no false positives at this sizing
    kept = {r["doc_id"] for r in bloom_dedupe(seen, batch, m=m, k=k).collect()}
    assert kept == set(range(1000, 1100))


def test_bloom_false_positives_exist_when_saturated_and_are_deterministic(spark):
    """At m=64 with 150 inserted texts the filter saturates: unseen docs DO
    flag true (the documented trade), and the flag set is identical across
    runs (pure hash arithmetic, no RNG)."""
    from daft_minhash_dedupe_spark.extras.bloom_dedupe import flag_bloom_duplicates

    seen = _docs(spark, [f"filler item {i} padding words" for i in range(150)])
    batch = _docs(spark, [f"novel text {i} never inserted" for i in range(20)], 1000)
    run1 = sorted(
        (r["doc_id"], r["bloom_hit"])
        for r in flag_bloom_duplicates(seen, batch, m=64, k=3).collect()
    )
    run2 = sorted(
        (r["doc_id"], r["bloom_hit"])
        for r in flag_bloom_duplicates(seen, batch, m=64, k=3).collect()
    )
    assert run1 == run2
    assert any(hit for _, hit in run1)  # saturated filter → false positives


def test_bloom_filter_is_incrementally_unionable(spark):
    """bits(seen_a ∪ seen_b) == bits(seen_a) ∪ bits(seen_b): the filter
    updates by appending a new batch's bits, never rebuilding."""
    from daft_minhash_dedupe_spark.extras.bloom_dedupe import bloom_build

    a = _docs(spark, [f"first wave {i}" for i in range(30)])
    b = _docs(spark, [f"second wave {i}" for i in range(30)], 100)
    both = a.unionByName(b)
    union_of_parts = {
        r["bit"]
        for r in bloom_build(a, m=4096, k=3)
        .unionByName(bloom_build(b, m=4096, k=3))
        .distinct()
        .collect()
    }
    direct = {r["bit"] for r in bloom_build(both, m=4096, k=3).collect()}
    assert union_of_parts == direct


def test_bloom_bitmap_flags_bit_identical_to_relational(spark):
    """The packed-bitmap probe (broadcast + mapInPandas, zero shuffle) must
    produce EXACTLY the relational path's flags — including the
    deterministic false positives at a saturated m=512 — because both use
    the same md5('seed:i:text') position scheme."""
    from daft_minhash_dedupe_spark.extras.bloom_dedupe import (
        bloom_bitmap_build,
        flag_bloom_duplicates,
        flag_bloom_duplicates_bitmap,
    )

    seen = _docs(spark, [f"history doc {i} body" for i in range(120)])
    batch = _docs(
        spark,
        [f"novel doc {i} words" for i in range(60)]
        + [f"history doc {i} body" for i in range(0, 120, 7)],  # recrawls
        1000,
    )
    for m in (512, 1 << 16):
        rel = sorted(
            (r["doc_id"], r["bloom_hit"])
            for r in flag_bloom_duplicates(seen, batch, m=m, k=3).collect()
        )
        bm = bloom_bitmap_build(seen, m=m, k=3)
        bit = sorted(
            (r["doc_id"], r["bloom_hit"])
            for r in flag_bloom_duplicates_bitmap(bm, batch, m=m, k=3).collect()
        )
        assert bit == rel
        # sanity: every recrawl flagged on both paths
        hits = dict(bit)
        assert all(hits[1060 + j] for j in range(len(range(0, 120, 7))))


def test_bloom_paths_agree_on_duplicate_doc_ids(spark):
    """Batch rows sharing a doc_id but carrying DIFFERENT texts must each
    get their own text's flag on BOTH paths (the relational probe groups by
    (id, text-digest), not id alone — an id-only group would let an unseen
    text's unset bits veto a seen sibling row)."""
    from daft_minhash_dedupe_spark.extras.bloom_dedupe import (
        bloom_bitmap_build,
        flag_bloom_duplicates,
        flag_bloom_duplicates_bitmap,
    )

    seen = _docs(spark, ["the seen text body"])
    batch = spark.createDataFrame(
        [(7, "the seen text body"), (7, "a never inserted text"), (8, "also new")],
        "doc_id long, text string",
    )
    m, k = 1 << 16, 3
    rel = sorted(
        (r["doc_id"], r["text"], r["bloom_hit"])
        for r in flag_bloom_duplicates(seen, batch, m=m, k=k).collect()
    )
    bm = bloom_bitmap_build(seen, m=m, k=k)
    bit = sorted(
        (r["doc_id"], r["text"], r["bloom_hit"])
        for r in flag_bloom_duplicates_bitmap(bm, batch, m=m, k=k).collect()
    )
    assert rel == bit
    assert rel == [
        (7, "a never inserted text", False),
        (7, "the seen text body", True),
        (8, "also new", False),
    ]


def test_bloom_bitmap_accepts_prebuilt_broadcast(spark):
    from daft_minhash_dedupe_spark.extras.bloom_dedupe import (
        bloom_bitmap_build,
        flag_bloom_duplicates_bitmap,
    )

    seen = _docs(spark, ["alpha", "beta"])
    batch = _docs(spark, ["alpha", "gamma"], 10)
    m = 1 << 16
    bm = bloom_bitmap_build(seen, m=m, k=3)
    bc = spark.sparkContext.broadcast(bm)
    via_bytes = sorted(
        (r["doc_id"], r["bloom_hit"])
        for r in flag_bloom_duplicates_bitmap(bm, batch, m=m, k=3).collect()
    )
    via_bc = sorted(
        (r["doc_id"], r["bloom_hit"])
        for r in flag_bloom_duplicates_bitmap(bc, batch, m=m, k=3).collect()
    )
    assert via_bytes == via_bc == [(10, True), (11, False)]


def test_bloom_python_position_twin_matches_catalyst(spark):
    """_md5_positions_py is the documented pure-Python reference for the
    Catalyst position scheme — pin them equal, including the NULL-text
    concat_ws edge."""
    from daft_minhash_dedupe_spark.extras.bloom_dedupe import (
        _md5_positions_py,
        bloom_positions,
    )

    df = spark.createDataFrame(
        [("hello world",), ("",), (None,), ("päge ünïcode",)], "text string"
    )
    m, k, seed = 1 << 20, 4, 3
    got = [
        list(r["p"])
        for r in df.select(bloom_positions(F.col("text"), m, k, seed).alias("p")).collect()
    ]
    want = [
        _md5_positions_py(t, m, k, seed)
        for t in ["hello world", "", None, "päge ünïcode"]
    ]
    assert got == want


def test_bloom_bitmap_union_equals_bitmap_of_union(spark):
    from daft_minhash_dedupe_spark.extras.bloom_dedupe import (
        bloom_bitmap_build,
        bloom_bitmap_union,
    )

    a = _docs(spark, [f"wave one {i}" for i in range(40)])
    b = _docs(spark, [f"wave two {i}" for i in range(40)], 100)
    direct = bloom_bitmap_build(a.unionByName(b), m=4096, k=3)
    ored = bloom_bitmap_union(
        bloom_bitmap_build(a, m=4096, k=3), bloom_bitmap_build(b, m=4096, k=3)
    )
    assert direct == ored


def test_bloom_bitmap_null_text_matches_relational(spark):
    """concat_ws skips NULLs on the Catalyst side; the Python twin must hash
    the same 'seed:i' key for a null text so the paths stay bit-identical."""
    from daft_minhash_dedupe_spark.extras.bloom_dedupe import (
        bloom_bitmap_build,
        flag_bloom_duplicates,
        flag_bloom_duplicates_bitmap,
    )

    seen = spark.createDataFrame(
        [(0, None), (1, "real text")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, None), (11, "real text"), (12, "unseen")],
        "doc_id long, text string",
    )
    m, k = 1 << 16, 3
    rel = sorted(
        (r["doc_id"], r["bloom_hit"])
        for r in flag_bloom_duplicates(seen, batch, m=m, k=k).collect()
    )
    bm = bloom_bitmap_build(seen, m=m, k=k)
    bit = sorted(
        (r["doc_id"], r["bloom_hit"])
        for r in flag_bloom_duplicates_bitmap(bm, batch, m=m, k=k).collect()
    )
    assert bit == rel
    assert dict(bit)[10] is True and dict(bit)[11] is True


def test_bloom_rejects_internal_column_collisions(spark):
    """The probes add temp columns _th / _bp; a batch already carrying one
    must fail loudly instead of having user data silently clobbered."""
    import pytest

    from daft_minhash_dedupe_spark.extras.bloom_dedupe import (
        bloom_bitmap_build,
        flag_bloom_duplicates,
        flag_bloom_duplicates_bitmap,
    )

    seen = _docs(spark, ["x"])
    with pytest.raises(ValueError, match="_th"):
        flag_bloom_duplicates(
            seen, _docs(spark, ["y"]).withColumn("_th", F.lit(1)), m=4096
        )
    bm = bloom_bitmap_build(seen, m=4096, k=3)
    with pytest.raises(ValueError, match="_bp"):
        flag_bloom_duplicates_bitmap(
            bm, _docs(spark, ["y"]).withColumn("_bp", F.lit(1)), m=4096, k=3
        )


def test_bloom_bitmap_rejects_bad_sizing(spark):
    import pytest

    from daft_minhash_dedupe_spark.extras.bloom_dedupe import (
        bloom_bitmap_build,
        bloom_bitmap_union,
        flag_bloom_duplicates_bitmap,
    )

    with pytest.raises(ValueError):
        bloom_bitmap_build(_docs(spark, ["x"]), m=100, k=3)  # not mult of 8
    with pytest.raises(ValueError):
        bloom_bitmap_union(b"\x00" * 8, b"\x00" * 16)
    with pytest.raises(ValueError):
        flag_bloom_duplicates_bitmap(b"\x00" * 8, _docs(spark, ["x"]), m=4096)


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_bloom_texts = st.lists(
    st.text(min_size=0, max_size=25), min_size=1, max_size=12, unique=True
)


@given(seen_texts=_bloom_texts, batch_texts=_bloom_texts)
@settings(max_examples=6, deadline=None)
def test_bloom_paths_match_python_oracle_on_random_texts(
    spark, seen_texts, batch_texts
):
    """Three-way pin over arbitrary unicode: relational flags == bitmap
    flags == a dependency-free pure-Python Bloom oracle, at a deliberately
    tiny m=256 where false positives are common (so the FP sets must agree
    too, not just the planted hits)."""
    from daft_minhash_dedupe_spark.extras.bloom_dedupe import (
        _md5_positions_py,
        bloom_bitmap_build,
        flag_bloom_duplicates,
        flag_bloom_duplicates_bitmap,
    )

    m, k, seed = 256, 3, 0
    seen = _docs(spark, seen_texts)
    batch = _docs(spark, batch_texts, 1000)
    bits = set()
    for t in seen_texts:
        bits.update(_md5_positions_py(t, m, k, seed))
    want = {
        1000 + i: all(p in bits for p in _md5_positions_py(t, m, k, seed))
        for i, t in enumerate(batch_texts)
    }
    rel = {
        r["doc_id"]: r["bloom_hit"]
        for r in flag_bloom_duplicates(seen, batch, m=m, k=k, seed=seed).collect()
    }
    bm = bloom_bitmap_build(seen, m=m, k=k, seed=seed)
    bit = {
        r["doc_id"]: r["bloom_hit"]
        for r in flag_bloom_duplicates_bitmap(bm, batch, m=m, k=k, seed=seed).collect()
    }
    assert rel == want
    assert bit == want


def test_bloom_positions_rejects_bad_sizing(spark):
    import pytest

    from daft_minhash_dedupe_spark.extras.bloom_dedupe import bloom_positions

    with pytest.raises(ValueError):
        bloom_positions(F.lit("x"), m=0, k=3)
    with pytest.raises(ValueError):
        bloom_positions(F.lit("x"), m=64, k=0)


def test_bloom_out_col_collision_rejected(spark):
    """ADVICE r5: a batch already carrying the out_col name must be rejected
    (both probe paths), not silently produce duplicate/ambiguous columns."""
    import pytest

    from daft_minhash_dedupe_spark.extras.bloom_dedupe import (
        bloom_bitmap_build,
        flag_bloom_duplicates,
        flag_bloom_duplicates_bitmap,
    )

    seen = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(2, "b", True)], "doc_id long, text string, bloom_hit boolean"
    )
    with pytest.raises(ValueError, match="out_col"):
        flag_bloom_duplicates(seen, batch, m=64, k=2)
    bitmap = bloom_bitmap_build(seen, m=64, k=2)
    with pytest.raises(ValueError, match="out_col"):
        flag_bloom_duplicates_bitmap(bitmap, batch, m=64, k=2)
