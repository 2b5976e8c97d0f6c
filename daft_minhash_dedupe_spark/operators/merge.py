"""Result merge + keep-rule.

Reference semantics (workload/minhash_dedupe.py:616-647, pinned by its tests
:388-394 and :492-498): a row survives iff it is *isolated* (never appeared in
any candidate edge → no assignment) or it is *its own representative* (its id
equals the global minimum id of its component).

Unlike the reference (which drops the component column, :646), we also expose
the full cluster-assignment table — the north rule requires cluster_id
write-back, and keeping assignments as a first-class output costs nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assignments_to_index(
    assignments: DataFrame, id_map: DataFrame, index_col: str, component_col: str
) -> DataFrame:
    """Map integer (u, rep) assignments back to natural-key space via two
    joins on the id_map (reference :616-624). With deterministic hashed ids
    the id_map is (index_col, node_id) and both joins are plain equi-joins;
    Catalyst/AQE picks broadcast when the map is small."""
    u_map = id_map.select(
        F.col("node_id").alias("u"), F.col(index_col)
    )
    rep_map = id_map.select(
        F.col("node_id").alias("rep"), F.col(index_col).alias(component_col)
    )
    return (
        assignments.join(u_map, "u")
        .join(rep_map, "rep")
        .select(index_col, component_col)
    )


def cluster_assignments(
    df: DataFrame,
    assignments: DataFrame,
    id_map: DataFrame,
    index_col: str = "block_id",
    component_col: str = "component",
) -> DataFrame:
    """Every input row with its cluster id (north-rule write-back table).

    Isolated rows (no candidate edge ever touched them) are their own
    cluster: ``component = coalesce(rep, own index)``.
    """
    uniq = assignments.groupBy("u").agg(F.min("rep").alias("rep"))
    assign_str = assignments_to_index(uniq, id_map, index_col, component_col)
    return df.join(assign_str, index_col, "left").withColumn(
        component_col, F.coalesce(component_col, index_col)
    )


def merge_results(
    df: DataFrame,
    assignments: DataFrame,
    id_map: DataFrame,
    index_col: str = "block_id",
    component_col: str = "component",
    keep_component: bool = False,
) -> DataFrame:
    """Left-join cluster assignments onto the original rows and apply the
    keep-rule (isolated OR own-representative), reference :626-647."""
    uniq = assignments.groupBy("u").agg(F.min("rep").alias("rep"))
    assign_str = assignments_to_index(uniq, id_map, index_col, component_col)
    joined = df.join(assign_str, index_col, "left")
    kept = joined.filter(
        F.col(component_col).isNull()
        | (F.col(component_col) == F.col(index_col))
    )
    return kept if keep_component else kept.drop(component_col)
