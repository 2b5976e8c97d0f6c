"""MinHash signature kernel — the one real compute kernel of the engine.

Spark rebuild of Daft's native ``Expression.minhash(num_hashes, ngram_size,
seed, hash_function='xxhash')`` (reference call site:
workload/minhash_dedupe.py:218-239; shape pinned by reference
tests/test_minhash_dedupe_unit.py:219-228 — ``len(sig) == num_perm``, ints).

Split into two stages so the string-heavy half stays JVM-side:

1. ``shingle_hashes``: word n-gram shingling + xxhash64, entirely Catalyst
   expressions (``split`` / ``sequence`` / ``transform`` / ``slice`` /
   ``array_join`` / ``xxhash64`` / ``array_distinct``) → whole-stage codegen,
   zero Python.
2. ``minhash_signature``: the universal-hash permutation min-pluck
   ``sig_j = min_h ((a_j·h + b_j) mod p) & 0xFFFFFFFF`` as an Arrow-batched
   pandas UDF doing a single numpy outer-product + segmented min per batch —
   the same math as the prior-art PySpark impl the reference studied
   (references/chengmao_minhash_spark.py:222-226) but batched over many rows
   with ``np.minimum.reduceat`` (no per-row Python loop in the hot path).

Shingle semantics (matching chengmao ``ngrams``,
references/chengmao_minhash_spark.py:85-106): whitespace-tokenized word
shingles of size ``ngram_size``; a document with fewer than ``ngram_size``
tokens yields ONE shingle containing all its tokens; shingles are
deduplicated before hashing (set semantics → true Jaccard estimates).
Empty/whitespace-only documents get the all-``MAX_HASH`` signature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from daft_minhash_dedupe_spark.config import MAX_HASH_32, MERSENNE_PRIME

# Keep the (n_shingles × num_perm) uint64 intermediate under ~256 MB per chunk.
_CHUNK_CELLS = 32_000_000


def tokens(col: Column) -> Column:
    """Whitespace tokens of a (normalized) text column, empties removed."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))


def shingle_hashes(col: Column, ngram_size: int) -> Column:
    """Distinct xxhash64 values of the word ``ngram_size``-gram shingles.

    Pure Catalyst: returns ``array<bigint>``; empty docs → empty array.
    The 64-bit hashes are folded to 32 bits inside the permutation kernel
    (keeping the JVM side a single pass).
    """
    toks = tokens(col)
    n = F.size(toks)
    # one shingle per window; short docs (< ngram_size tokens) → one shingle
    n_shingles = F.greatest(n - F.lit(ngram_size - 1), F.least(n, F.lit(1)))
    windows = F.sequence(F.lit(1), n_shingles)
    shingles = F.transform(
        windows, lambda i: F.array_join(F.slice(toks, i, ngram_size), " ")
    )
    hashes = F.transform(shingles, lambda s: F.xxhash64(s))
    return F.when(n == 0, F.array().cast("array<bigint>")).otherwise(
        F.array_distinct(hashes)
    )


def _permutations(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) universal-hash parameters, seeded like chengmao."""
    gen = np.random.RandomState(seed)
    a = gen.randint(1, MERSENNE_PRIME, size=num_perm, dtype=np.uint64)
    b = gen.randint(0, MERSENNE_PRIME, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(col: Column, num_perm: int = 64, seed: int = 42) -> Column:
    """``array<bigint>`` MinHash signature (values in [0, 2^32)) of a
    distinct-shingle-hash array column.

    Arrow-batched pandas UDF; all math is numpy over the whole batch
    (flattened shingles → one outer product → ``np.minimum.reduceat``
    segmented min), chunked to bound the intermediate matrix.
    """
    a, b = _permutations(num_perm, seed)
    empty_sig = np.full(num_perm, MAX_HASH_32, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(hashes: pd.Series) -> pd.Series:
        n_rows = len(hashes)
        if n_rows == 0:
            return pd.Series([], dtype=object)
        lens = np.fromiter((len(h) for h in hashes), dtype=np.int64, count=n_rows)
        out = np.empty(n_rows, dtype=object)
        # process rows in chunks so (sum(lens) * num_perm) stays bounded
        row = 0
        while row < n_rows:
            end = row
            cells = 0
            while end < n_rows and (cells == 0 or cells <= _CHUNK_CELLS):
                cells += int(lens[end]) * num_perm
                end += 1
            chunk = hashes.iloc[row:end]
            clens = lens[row:end]
            nonempty = clens > 0
            if nonempty.any():
                flat = np.concatenate(
                    [np.asarray(h, dtype=np.int64) for h in chunk if len(h)]
                )
                h32 = flat.astype(np.uint64) & np.uint64(MAX_HASH_32)
                # (n_shingles, num_perm) — uint64 wrap-around modular family
                # (same convention as datasketch / chengmao :222-226)
                ph = ((np.multiply.outer(h32, a) + b) % np.uint64(MERSENNE_PRIME)) & np.uint64(
                    MAX_HASH_32
                )
                starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
                np.cumsum(clens[nonempty][:-1], out=starts[1:])
                mins = np.minimum.reduceat(ph, starts, axis=0).astype(np.int64)
            j = 0
            for i in range(row, end):
                if lens[i] > 0:
                    out[i] = mins[j]
                    j += 1
                else:
                    out[i] = empty_sig
            row = end
        return pd.Series(out)

    return _sig(col)
