"""Exact-Jaccard verification of LSH candidate pairs (north-star addition).

The reference feeds LSH bucket edges straight into clustering — every LSH
false positive becomes a real (wrong) cluster merge. This stage re-checks each
candidate edge against the TRUE Jaccard similarity of the two documents'
distinct shingle-hash sets and keeps only pairs >= threshold.

Pure Catalyst: ``array_intersect`` / ``array_union`` on the already-computed
``array<bigint>`` shingle-hash columns (SURVEY §4 item 5).

RECALL CAVEAT (star edges): verification only removes edges, but removing a
STAR edge can disconnect a true pair — if a bucket's min node is
sub-threshold against two genuinely-duplicate members, both their star edges
drop and the pair stays connected only if another band rescues it. Feed this
filter pairwise-within-bucket candidates
(``edges.build_pair_edges_from_buckets``, the pipeline's verified path) for
exact recall on small buckets; with star edges it trades a small transitive-
recall loss for precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaccard_similarity(a, b):
    """Exact Jaccard of two array columns (set semantics)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def verify_pairs_exact_jaccard(
    edges: DataFrame,
    shingles: DataFrame,
    threshold: float,
    node_col: str = "node_id",
    shingle_col: str = "shingles",
) -> DataFrame:
    """Filter candidate (u, v) edges to those with exact Jaccard >= threshold.

    ``shingles``: (node_id, shingles array<bigint>) — the distinct shingle
    hashes already produced upstream of the minhash kernel (no recompute).
    Two equi-joins attach each side's shingle set; joins are shuffle joins on
    the 8-byte node id (AQE-coalesced), then one codegen'd filter.
    """
    su = shingles.select(
        F.col(node_col).alias("u"), F.col(shingle_col).alias("_su")
    )
    sv = shingles.select(
        F.col(node_col).alias("v"), F.col(shingle_col).alias("_sv")
    )
    return (
        edges.join(su, "u")
        .join(sv, "v")
        .where(jaccard_similarity(F.col("_su"), F.col("_sv")) >= F.lit(threshold))
        .select("u", "v")
    )
