"""Temporal joins Spark lacks as built-ins, composed from shuffle-once
primitives.

``asof_join``: for each left row, the most recent right row with
right.ts <= left.ts and equal key — the kdb/pandas ``merge_asof`` / DuckDB
``ASOF JOIN`` semantics. The naive formulation is a range join (quadratic
per key); this implementation is the union+window trick: tag both sides,
union, one window sorted by (ts, side) per key, and carry the last non-null
right value forward — ONE shuffle on the key, linear work, no range join.

Scale note: each key's rows sort within one task (inherent to per-key
ordered semantics), so a pathological hot key (one user with 10^8 events)
serializes on that task. ``split_buckets=N`` implements the standard
mitigation: rows are pre-split into N coarse time buckets, the window runs
per (key, bucket) — a hot key now spreads over up to N tasks — and bucket
boundaries are stitched with a per-(key, bucket) carry-in computed on the
tiny (keys × buckets) aggregate table. Semantics are exactly identical to
the single-window path (equal timestamps always land in the same bucket, so
the tie rules never straddle a boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
    split_buckets: int | None = None,
) -> DataFrame:
    """Left as-of join: left rows + ``value_cols`` from the latest right row
    at-or-before each left row's ``ts`` (null when none exists).

    Ties: right rows order before left rows at equal ``ts`` (inclusive
    <= semantics); equal-ts right rows are ordered among themselves by
    ``value_cols`` for determinism.

    ``split_buckets``: hot-key mitigation — split the time range into that
    many coarse buckets, run the window per (key, bucket), stitch boundaries
    via a carry-in computed on the per-(key, bucket) aggregate (see module
    doc). Identical results; use when one key can dominate a task.
    """
    # carry the right row as ONE struct so all value_cols come from the SAME
    # matched row — per-column last(ignorenulls) would stitch values from
    # different right rows whenever the latest row holds a NULL
    from pyspark.sql import types as T

    struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tag = left.select(
        "*",
        F.lit(1).alias("_side"),
        F.lit(None).cast(struct_type).alias("_rv"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_rv"),
    )
    # align schemas: right side lacks the other left columns
    for c in left.columns:
        if c not in (key, ts):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l_tag.unionByName(r_tag)

    if split_buckets and split_buckets > 1:
        # range-bucket the time axis (NOT hash: a bucket must contain a
        # contiguous ts interval so earlier buckets are wholly <= later ones).
        # datetime types can't cast straight to double (TIMESTAMP_NTZ) —
        # route through timestamp_ltz; numeric ts columns cast directly.
        ts_type = dict(u.dtypes)[ts]
        if ts_type in ("timestamp", "timestamp_ntz", "date"):
            ts_num = F.col(ts).cast("timestamp_ltz").cast("double")
        else:
            ts_num = F.col(ts).cast("double")
        lo, hi = u.agg(F.min(ts_num), F.max(ts_num)).first()
        if lo is not None and hi is not None and hi > lo:
            width = (hi - lo) / split_buckets
            bucket = F.least(
                F.floor((ts_num - F.lit(lo)) / F.lit(width)),
                F.lit(split_buckets - 1),
            ).cast("int")
            u = u.withColumn("_bucket", bucket)
            w_in = (
                Window.partitionBy(key, "_bucket")
                .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_rv").asc())
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            carried = u.select(
                "*", F.last("_rv", ignorenulls=True).over(w_in).alias("_rv_in")
            )
            # last right value of each (key, bucket): tiny aggregate (the
            # same (ts, _rv) ordering the window uses — _side is constant 0);
            # joined onto the full (key, bucket) spine so the carry window
            # propagates PAST buckets that hold no right rows at all
            spine = u.select(key, "_bucket").distinct()
            last_per_bucket = (
                u.where(F.col("_side") == 0)
                .groupBy(key, "_bucket")
                .agg(F.max_by("_rv", F.struct(F.col(ts), F.col("_rv"))).alias("_rv_last"))
            )
            w_carry = (
                Window.partitionBy(key)
                .orderBy(F.col("_bucket").asc())
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            carry_in = (
                spine.join(last_per_bucket, [key, "_bucket"], "left")
                .select(
                    key,
                    "_bucket",
                    F.last("_rv_last", ignorenulls=True).over(w_carry).alias("_carry"),
                )
                .where(F.col("_carry").isNotNull())
            )
            # no broadcast hint: carry_in is (distinct keys × buckets) rows —
            # small for the hot-key corpora this path targets, but unbounded
            # in key cardinality; let AQE pick broadcast vs shuffle from the
            # measured size instead of forcing it into driver memory
            stitched = carried.join(carry_in, [key, "_bucket"], "left")
            out = stitched.where(F.col("_side") == 1).select(
                "*",
                *[
                    F.coalesce(F.col("_rv_in"), F.col("_carry"))
                    .getField(c)
                    .alias(f"{c}{suffix}")
                    for c in value_cols
                ],
            )
            return out.drop("_side", "_rv", "_rv_in", "_carry", "_bucket")
        # degenerate time range (or empty input): fall through to one window

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_rv").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select("*", F.last("_rv", ignorenulls=True).over(w).alias("_rv_asof"))
    out = carried.where(F.col("_side") == 1).select(
        "*",
        *[
            F.col("_rv_asof").getField(c).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return out.drop("_side", "_rv", "_rv_asof")
