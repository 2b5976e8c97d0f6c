"""Temporal joins Spark lacks as built-ins, composed from shuffle-once
primitives.

``asof_join``: for each left row, the most recent right row with
right.ts <= left.ts and equal key — the kdb/pandas ``merge_asof`` / DuckDB
``ASOF JOIN`` semantics. The naive formulation is a range join (quadratic
per key); this implementation is the union+window trick: tag both sides,
union, one window sorted by (ts, side) per key, and carry the last non-null
right value forward — ONE shuffle on the key, linear work, no range join.

Scale note: each key's rows sort within one task (inherent to per-key
ordered semantics). A pathological hot key (one user with 10^8 events)
serializes on that task — pre-split such keys by coarse time bucket and
stitch boundaries, the standard mitigation; unnecessary for web-event key
cardinalities.
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
) -> DataFrame:
    """Left as-of join: left rows + ``value_cols`` from the latest right row
    at-or-before each left row's ``ts`` (null when none exists).

    Ties: right rows order before left rows at equal ``ts`` (inclusive
    <= semantics); equal-ts right rows are ordered among themselves by
    ``value_cols`` for determinism.
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
