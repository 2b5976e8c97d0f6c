"""Driver-contract mimic: run every queries() entry at sf0.01 (and sf0.001
for the heavy pipeline ones), compare against oracle_sql() via DuckDB exactly
like the driver does (row count + column names + order-insensitive values)."""

import math
import os
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_val(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_norm_val(x) for x in v)
    return v


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_val(r[i]) for i in idx) for r in rows]
    # None-safe ordering (rollup grouping NULLs)
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_duckdb_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(entry_mod.oracle_sql()[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"
    # the driver hashes pandas values, so a dtype drift (DuckDB HUGEINT →
    # Decimal vs Spark int64) is a red row even when values are equal —
    # compare cell TYPES per column too (CORRECTNESS_r01 user_sessions lesson)
    def _type_fp(cols, rows):
        idx = sorted(range(len(cols)), key=lambda i: cols[i])
        fp = {}
        for j, i in enumerate(idx):
            kinds = {type(r[i]).__name__ for r in rows if r[i] is not None}
            fp[sorted(cols)[j]] = kinds
        return fp

    assert _type_fp(s_cols, s_rows) == _type_fp(d_cols, d_rows), f"{name}: cell dtypes"
    assert _rows_to_set(s_cols, s_rows) == _rows_to_set(d_cols, d_rows), f"{name}: values"


# Opt-in cross-scale sweep: the driver adjudicates at sf0.01; this re-runs
# every oracle at sf0.001 and sf0.1 to catch data-dependent latent mismatches
# (ties, precision edges). ~5 min — run with SPARK_GRAFT_FULL_ORACLE=1.
_FULL = os.environ.get("SPARK_GRAFT_FULL_ORACLE") == "1"


@pytest.mark.skipif(not _FULL, reason="set SPARK_GRAFT_FULL_ORACLE=1")
@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"])
@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle_other_sf(spark, sf, name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    try:
        sdf = entry_mod.queries()[name](spark, sf)
        s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
        res = con.execute(entry_mod.oracle_sql()[name])
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
        assert sorted(s_cols) == sorted(d_cols)
        assert len(s_rows) == len(d_rows)
        assert _rows_to_set(s_cols, s_rows) == _rows_to_set(d_cols, d_rows)
    finally:
        con.close()


NO_ORACLE = sorted(set(entry_mod.queries()) - set(ORACLE_KEYS))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_queries_run(spark, name):
    # heavy pipeline queries exercised at sf0.001 to keep the suite fast;
    # the driver runs them at sf0.01
    sf = "/root/testdata/sf0.001"
    df = entry_mod.queries()[name](spark, sf)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    out = entry_mod.entry(spark)
    n = out.count()
    assert n > 0
    assert out.columns == ["block_id", "cluster_id"]


def test_oracle_rows_fit_driver_adjudication_window():
    """The driver's correctness file adjudicates only the FIRST 50 queries()
    entries (round-3 lesson: 5 green oracle rows fell off the end). Pin the
    packing invariant: every oracle-backed row sits inside the window and
    every rows-only entry sits after it."""
    q = list(entry_mod.queries().keys())
    o = set(entry_mod.oracle_sql().keys())
    assert o <= set(q)
    assert len(o) <= 50
    assert [k for k in q[50:] if k in o] == []
    assert [k for k in q[:len(o)] if k not in o] == []


def test_media_doc_cap_in_sync_with_oracles():
    """_media_docs filters Spark-side at MEDIA_DOC_CAP; the media oracles
    hand-write the same literal in SQL. Changing the cap in one place but
    not the other would silently compare different doc populations."""
    import re

    media = ("media_", "image_", "audio_", "video_", "wav_", "ppm_")
    caps = [
        int(m)
        for name, sql in entry_mod.oracle_sql().items()
        if name.startswith(media)
        for m in re.findall(r"doc_id < (\d+)", sql)
        if int(m) > 100  # below 100 = planted-structure slices, not the cap
    ]
    assert caps and all(c == entry_mod.MEDIA_DOC_CAP for c in caps)
