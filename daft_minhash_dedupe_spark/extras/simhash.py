"""SimHash near-duplicate detection (Charikar 2002; the Google webdedup
fingerprint — see Manku, Jarvelin & Sarlos, WWW'07 for the banding trick).

Signature: 64-bit fingerprint where bit j is the sign of Σ over shingle
hashes of (±1 depending on the shingle's bit j). Computed from the SAME
shingle-hash arrays the MinHash pipeline produces (one JVM pass for the
strings, one Arrow-batched numpy pass for the bit accumulation).

Candidate generation at scale: split the 64-bit fingerprint into 4×16-bit
bands (Hamming distance ≤ 3 ⇒ at least one band identical), group on
(band_idx, band_value), star edges per bucket — i.e. exactly the dedup
engine's LSH machinery, reused with a different signature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def simhash64(col: Column) -> Column:
    """64-bit SimHash fingerprint from an ``array<bigint>`` shingle-hash
    column (Arrow-batched pandas UDF; numpy bit-unpack + sum per batch)."""

    @F.pandas_udf(T.LongType())
    def _simhash(hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=np.int64)
        for i, hs in enumerate(hashes):
            if hs is None or len(hs) == 0:
                out[i] = 0
                continue
            arr = np.asarray(hs, dtype=np.int64).astype(np.uint64)
            # bits (n_shingles, 64): 0/1 per bit position
            bits = (arr[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            votes = bits.sum(axis=0).astype(np.int64) * 2 - len(arr)  # ±1 votes (signed!)
            fp = np.uint64(0)
            for j in np.nonzero(votes > 0)[0]:
                fp |= np.uint64(1) << np.uint64(j)
            out[i] = fp.astype(np.int64) if fp < (1 << 63) else np.int64(fp - (1 << 64))
        return pd.Series(out)

    return _simhash(col)


def hamming_distance(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints: bit_count(a XOR b)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_bands(df: DataFrame, fp_col: str = "simhash", node_col: str = "node_id") -> DataFrame:
    """Explode each fingerprint into 4×16-bit band rows (band_idx, band_key,
    node) — same shape as the MinHash band table, so edges/CC are reused."""
    fp = F.col(fp_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.shiftrightunsigned(fp, 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("band_val"),
            )
            for i in range(4)
        ]
    )
    exploded = df.select(F.col(node_col).alias("node"), F.explode(bands).alias("b"))
    return exploded.select(
        F.col("b.band_idx").alias("band_idx"),
        F.xxhash64("b.band_idx", "b.band_val").alias("band_key"),
        "node",
    )


def simhash_candidates(
    df: DataFrame,
    fp_col: str = "simhash",
    node_col: str = "node_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs: band-bucket join, then exact Hamming filter.

    Bucket edges are pairwise-within-bucket (capped; star fallback for hot
    buckets) so the Hamming verification cannot orphan a true pair whose
    bucket min is dissimilar to both endpoints (the star-only failure mode)."""
    from daft_minhash_dedupe_spark.operators.edges import build_pair_edges_from_buckets

    bands = simhash_bands(df, fp_col, node_col)
    edges = build_pair_edges_from_buckets(bands)
    fa = df.select(F.col(node_col).alias("u"), F.col(fp_col).alias("_fa"))
    fb = df.select(F.col(node_col).alias("v"), F.col(fp_col).alias("_fb"))
    return (
        edges.join(fa, "u")
        .join(fb, "v")
        .where(hamming_distance(F.col("_fa"), F.col("_fb")) <= max_hamming)
        .select("u", "v")
    )
