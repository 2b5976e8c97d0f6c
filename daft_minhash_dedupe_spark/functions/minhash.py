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

# Keep the (n_shingles × num_perm) uint64 intermediate at ~32 MB per chunk —
# small enough to stay cache/TLB-friendly and to make first-touch page faults
# negligible (a 256 MB chunk measured 5s of fault time per fresh buffer).
_CHUNK_CELLS = 4_000_000

# worker-global scratch, reused across Arrow batches (python workers are
# long-lived under spark.python.worker.reuse): key = num_perm. Pinned memory
# is bounded: every request is ≤ _CHUNK_CELLS//num_perm rows, so the buffer
# never exceeds _CHUNK_CELLS cells = 32 MB per distinct num_perm.
_KERNEL_BUF: dict[int, np.ndarray] = {}


def _scratch(rows: int, num_perm: int) -> np.ndarray:
    buf = _KERNEL_BUF.get(num_perm)
    if buf is None or buf.shape[0] < rows:
        buf = np.empty((rows, num_perm), dtype=np.uint64)
        buf.fill(0)  # prefault every page once, here, not inside the hot loop
        _KERNEL_BUF[num_perm] = buf
    return buf


def tokens(col: Column) -> Column:
    """Whitespace tokens of a (normalized) text column, empties removed."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))


def shingle_hashes_from_token_hashes(th: Column, ngram_size: int) -> Column:
    """Distinct shingle hashes from an ALREADY-MATERIALIZED array of per-token
    xxhash64 values: each shingle hash is ``xxhash64(th[i], …, th[i+n-1])``
    (Spark's multi-column chain over fixed-width longs).

    Why token hashes instead of joined shingle strings: building 20M+ joined
    strings per million docs hits the JVM allocation/GC wall (string shingles
    measured ~0 scaling from 8→32 local cores); hashing each token ONCE and
    then hashing 8-byte windows is allocation-free per window. Shingle
    identity semantics are unchanged — distinct token windows ↔ distinct
    hash tuples (modulo 64-bit collisions).

    PERF: ``th`` must be a bound column reference — Catalyst does not CSE
    inside ``transform`` lambdas (an inline expression would be recomputed
    per window; measured 10×). Use ``add_shingles`` for the dataframe idiom.
    """
    n = F.size(th)
    windows = F.sequence(F.lit(1), F.greatest(n - F.lit(ngram_size - 1), F.lit(1)))
    full = F.transform(
        windows,
        lambda i: F.xxhash64(*[F.element_at(th, i + j) for j in range(ngram_size)]),
    )
    # short docs (< ngram_size tokens): ONE shingle over all n tokens
    short = F.xxhash64(F.element_at(th, 1))
    for c in range(2, ngram_size):
        short = F.when(
            n == c, F.xxhash64(*[F.element_at(th, k) for k in range(1, c + 1)])
        ).otherwise(short)
    return (
        F.when(n == 0, F.array().cast("array<bigint>"))
        .when(n < ngram_size, F.array(short))
        .otherwise(F.array_distinct(full))
    )


def add_shingles(
    df, text_col: str, ngram_size: int = 5, out_col: str = "shingles"
):
    """Two-step shingle computation: materialize token array and per-token
    hashes as columns once, then hash fixed-width windows over the bound
    references (the fast path — see ``shingle_hashes_from_token_hashes``)."""
    return (
        df.withColumn("__tok", tokens(F.col(text_col)))
        .withColumn("__th", F.transform(F.col("__tok"), lambda t: F.xxhash64(t)))
        .withColumn(out_col, shingle_hashes_from_token_hashes(F.col("__th"), ngram_size))
        .drop("__tok", "__th")
    )


def shingle_hashes(col: Column, ngram_size: int) -> Column:
    """Single-expression convenience form (small inputs / tests only —
    recomputes the token split per window; hot paths use ``add_shingles``)."""
    return shingle_hashes_from_token_hashes(
        F.transform(tokens(col), lambda t: F.xxhash64(t)), ngram_size
    )


def _min_signatures_flat(
    values: np.ndarray, offsets: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Core batched permutation min-pluck on a flattened shingle array.

    values: int64 shingle hashes for the whole batch; offsets: int64[n+1]
    row boundaries. Returns (n, num_perm) int64. One numpy outer product per
    chunk, ``np.minimum.reduceat`` for per-row minima — no per-row Python.
    """
    num_perm = len(a)
    n = len(offsets) - 1
    out = np.empty((n, num_perm), dtype=np.int64)
    lens = np.diff(offsets)
    empty = lens == 0
    row = 0
    max_cells = max(_CHUNK_CELLS // num_perm, 1)
    # reusable worker-global (shingles, num_perm) scratch: the naive
    # out-of-place expression allocates four fresh temporaries per chunk and
    # is page-fault-bound (measured ~10× slower than this in-place pipeline)
    buf = _scratch(min(max_cells, int(offsets[-1]) or 1), num_perm)
    mod = np.uint64(MERSENNE_PRIME)
    mask = np.uint64(MAX_HASH_32)
    while row < n:
        end = row + 1
        cells = int(lens[row])
        while end < n and cells + lens[end] <= max_cells:
            cells += int(lens[end])
            end += 1
        lo, hi = int(offsets[row]), int(offsets[end])
        if hi > lo:
            h32 = values[lo:hi].astype(np.uint64)
            h32 &= mask
            if hi - lo > buf.shape[0]:
                buf = _scratch(hi - lo, num_perm)
            ph = np.multiply.outer(h32, a, out=buf[: hi - lo])
            ph += b
            ph %= mod
            ph &= mask
            ne = ~empty[row:end]
            starts = (offsets[row:end][ne] - lo).astype(np.int64)
            out[row:end][ne] = np.minimum.reduceat(ph, starts, axis=0).astype(np.int64)
        out[row:end][empty[row:end]] = MAX_HASH_32
        row = end
    return out


def attach_minhash_signatures(
    df,
    shingle_col: str = "shingles",
    num_perm: int = 64,
    seed: int = 42,
    out_col: str = "min_hashes",
):
    """mapInArrow variant of the kernel: reads each batch's ListArray as
    (flat values, offsets) numpy views.

    EXPERIMENTAL — measured SLOWER than the pandas-UDF path in this runtime
    (mapInArrow serializes every passthrough column through Python; the
    pandas-UDF ArrowEvalPython node ships only the shingle column and keeps
    the rest JVM-side). Kept for environments where the UDF path regresses;
    the pipeline uses ``minhash_signature``.
    """
    import pyarrow as pa

    a, b = _permutations(num_perm, seed)
    in_schema = df.schema
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in in_schema.fields)
        + f", {out_col} array<bigint>"
    )
    col_idx = [f.name for f in in_schema.fields].index(shingle_col)

    def _map(batches):
        for batch in batches:
            arr = batch.column(col_idx)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            la = arr.cast(pa.list_(pa.int64()))
            offsets = np.asarray(la.offsets, dtype=np.int64)
            values = np.asarray(la.values, dtype=np.int64)
            # a sliced ListArray keeps absolute offsets into the full values
            # buffer — rebase both so offsets[0] == 0
            values = values[offsets[0] : offsets[-1]]
            offsets = offsets - offsets[0]
            mins = _min_signatures_flat(values, offsets, a, b)
            n = len(offsets) - 1
            sig_arr = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int64) * num_perm, type=pa.int32()),
                pa.array(mins.reshape(-1), type=pa.int64()),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)] + [sig_arr],
                names=[f.name for f in in_schema.fields] + [out_col],
            )

    return df.mapInArrow(_map, schema=out_schema)


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

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(hashes: pd.Series) -> pd.Series:
        n = len(hashes)
        if n == 0:
            return pd.Series([], dtype=object)
        lens = np.fromiter((len(h) for h in hashes), dtype=np.int64, count=n)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        if offsets[-1] > 0:
            values = np.concatenate([np.asarray(h, dtype=np.int64) for h in hashes if len(h)])
        else:
            values = np.empty(0, dtype=np.int64)
        mins = _min_signatures_flat(values, offsets, a, b)
        return pd.Series(list(mins))

    return _sig(col)


# -- pure-JVM kernel (no Python stage) ---------------------------------------

# Empty-document sentinel for the JVM hash family: the max of the family's
# range (full signed-64 space), playing the role MAX_HASH_32 plays for the
# 32-bit universal-hash family.
JVM_EMPTY_SENTINEL = (1 << 63) - 1


def minhash_signature_jvm(
    df,
    shingle_col: str = "shingles",
    num_perm: int = 64,
    seed: int = 42,
    id_col: str = "node_id",
    out_col: str = "min_hashes",
):
    """Whole-stage-codegen MinHash: NO Python worker anywhere in the stage.

    ``sig_j = min over shingles h of xxhash64(h, j, seed)`` — the j-th
    permutation is Spark's built-in xxhash64 re-mix of the shingle hash with
    the permutation index and seed folded in (multi-column xxhash64 chains
    the running hash through each operand, so each j yields an independent
    well-mixed draw). A DIFFERENT hash family than the Arrow kernel's
    universal ``(a·h+b) mod p`` — same MinHash estimator properties (the
    probability two shingle sets share their minimum under a uniform hash is
    their Jaccard similarity), so LSH banding and clustering behave
    identically in distribution; planted-pair recall is pinned by test.

    Physical shape: ``explode(shingles)`` → one HashAggregate keyed by
    ``id_col`` with ``num_perm`` ``min(xxhash64(...))`` columns. Explode,
    hash, and min all run inside whole-stage codegen with map-side partial
    aggregation, so each map task emits ONE 8·num_perm-byte row per document
    into the shuffle — the same volume the signature stage materializes
    anyway. Compared to the Arrow kernel this trades the Python exchange
    (two Arrow serialization hops + worker processes) for one doc-keyed
    shuffle; at web scale the shuffle is the cheaper side, and the stage
    becomes immune to Python-worker failure modes entirely.

    Documents with zero shingles (empty/whitespace-only text) get the
    all-``JVM_EMPTY_SENTINEL`` signature, mirroring the Arrow kernel's
    all-``MAX_HASH_32`` convention.

    Input df must carry (id_col, shingle_col); returns (id_col, out_col) —
    one row per DISTINCT id (explode_outer keeps empty docs). ``id_col``
    must be a per-row unique key: rows sharing an id collapse into one
    signature over the UNION of their shingle sets (a groupBy, unlike the
    Arrow kernel's per-row map). The pipeline satisfies this by
    construction — node_id is the xxhash64 of the unique block key — but
    direct callers with duplicate ids get merged signatures, not per-row
    ones.
    """
    sh = F.explode_outer(F.col(shingle_col)).alias("__sh")
    exploded = df.select(id_col, sh)
    # null __sh marks an empty shingle array: excluded from every min via the
    # when(), leaving NULL aggregates that coalesce to the sentinel below
    mins = [
        F.min(
            F.when(
                F.col("__sh").isNotNull(),
                F.xxhash64(F.col("__sh"), F.lit(j), F.lit(seed)),
            )
        ).alias(f"__m{j}")
        for j in range(num_perm)
    ]
    agg = exploded.groupBy(id_col).agg(*mins)
    sig = F.array(
        *[F.coalesce(F.col(f"__m{j}"), F.lit(JVM_EMPTY_SENTINEL)) for j in range(num_perm)]
    ).alias(out_col)
    return agg.select(id_col, sig)


# -- one-permutation hashing kernel (OPH + optimal densification) ------------

# splitmix64 constants (public domain, Steele et al. / Vigna)
_SM_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C2 = np.uint64(0x94D049BB133111EB)
_SM_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
# empty-bin sentinel: strictly above the 32-bit value domain, so detection
# is exact (a real min can never equal it)
_OPH_EMPTY = np.uint64(1) << np.uint64(33)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (uint64 wraparound is the intent)."""
    with np.errstate(over="ignore"):
        x = x + _SM_GOLDEN
        x = (x ^ (x >> np.uint64(30))) * _SM_C1
        x = (x ^ (x >> np.uint64(27))) * _SM_C2
        return x ^ (x >> np.uint64(31))


def _oph_signatures_flat(
    values: np.ndarray, offsets: np.ndarray, num_perm: int, seed: int
) -> np.ndarray:
    """One-permutation MinHash (Li et al., NIPS 2012) with optimal
    densification (Shrivastava, ICML 2017) on the same flattened batch
    layout ``_min_signatures_flat`` uses.

    Each shingle is hashed ONCE (splitmix64 remix of its xxhash64, seed
    folded in) and routed to bin ``u % num_perm``; ``sig[j]`` is the bin
    minimum — O(total_shingles) work vs the permutation kernel's
    O(total_shingles × num_perm). Empty bins are filled by probing bins in
    the order ``h(j, attempt)`` until an ORIGINALLY-occupied bin is hit;
    the probe sequence depends only on (bin, attempt, seed), so identical
    shingle sets always densify to identical signatures and the
    position-collision probability stays an unbiased Jaccard estimator
    (variance rises as docs get shorter than ~num_perm shingles — see the
    kernel-choice notes in config.py).

    Values live in [0, 2^32) like the universal-hash family; documents with
    zero shingles get the all-``MAX_HASH_32`` sentinel signature.
    """
    n = len(offsets) - 1
    lens = np.diff(offsets)
    seed_mix = _splitmix64(np.uint64(np.uint64(seed) & np.uint64(0xFFFFFFFFFFFFFFFF)))
    u = _splitmix64(values.astype(np.uint64) ^ seed_mix)
    bins = u % np.uint64(num_perm)
    vals = u & np.uint64(MAX_HASH_32)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    flat = row_of * num_perm + bins.astype(np.int64)
    sig = np.full(n * num_perm, _OPH_EMPTY, dtype=np.uint64)
    np.minimum.at(sig, flat, vals)
    sig = sig.reshape(n, num_perm)
    occupied = sig != _OPH_EMPTY
    no_shingles = lens == 0
    rows, cols = np.nonzero(~occupied & ~no_shingles[:, None])
    t = 0
    # probe only ORIGINALLY-occupied bins (frozen `occupied`): fills write
    # exclusively into originally-empty slots, so reading sig[occupied]
    # during the loop always reads true bin minima, never a densified copy
    while rows.size:
        with np.errstate(over="ignore"):
            probe_key = (
                cols.astype(np.uint64) * _SM_C1
                ^ np.uint64(t + 1) * _SM_C2
                ^ seed_mix
            )
        p = (_splitmix64(probe_key) % np.uint64(num_perm)).astype(np.int64)
        hit = occupied[rows, p]
        sig[rows[hit], cols[hit]] = sig[rows[hit], p[hit]]
        rows, cols = rows[~hit], cols[~hit]
        t += 1
        if t > 100 * num_perm:  # unreachable with >=1 occupied bin
            raise AssertionError("OPH densification failed to converge")
    sig[no_shingles] = np.uint64(MAX_HASH_32)
    return sig.astype(np.int64)


def minhash_signature_oph(col: Column, num_perm: int = 64, seed: int = 42) -> Column:
    """``array<bigint>`` OPH signature of a distinct-shingle-hash array
    column — same schema/value-domain/empty-doc convention as
    ``minhash_signature``, ~num_perm× less hash arithmetic per shingle.
    A different hash family: bit-different signatures, same estimator in
    distribution (planted recall pinned by test for the pipeline path).
    """

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(hashes: pd.Series) -> pd.Series:
        n = len(hashes)
        if n == 0:
            return pd.Series([], dtype=object)
        lens = np.fromiter((len(h) for h in hashes), dtype=np.int64, count=n)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        if offsets[-1] > 0:
            values = np.concatenate(
                [np.asarray(h, dtype=np.int64) for h in hashes if len(h)]
            )
        else:
            values = np.empty(0, dtype=np.int64)
        sigs = _oph_signatures_flat(values, offsets, num_perm, seed)
        return pd.Series(list(sigs))

    return _sig(col)
