"""Deterministic text hashing primitives shared by the dedup operators.

Everything here is a Spark SQL expression (no Python UDFs): shingling uses
`transform`+`sequence`, MinHash permutations are affine maps over xxhash64
with constants sized so `a*x + b` never overflows int64, and SimHash bit
votes are plain conditional aggregates. All constants are fixed (seeded) so
results are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# MinHash parameters: 32 hash functions = 16 bands x 2 rows. For Jaccard
# >= 0.7 the per-pair miss probability is (1 - j^2)^16 <= 2e-5 (and ~1e-11 at
# j = 0.9), so LSH candidates + exact verification reproduce the exact
# >=-threshold pair set with overwhelming probability.
MINHASH_K = 32
LSH_BANDS = 16
LSH_ROWS = 2
# modulus > 2^32; a < 2^30 and x < 2^32 keep a*x + b < 2^62 (no int64 overflow)
_MERSENNE_P = 4294967311
_rng = random.Random(42)
MINHASH_A = [_rng.randrange(1, 1 << 30) for _ in range(MINHASH_K)]
MINHASH_B = [_rng.randrange(0, 1 << 30) for _ in range(MINHASH_K)]


def hashed_ngram_tuples(words: Column, n: int) -> Column:
    """Raw overlapping n-gram hash array: position i holds
    ``xxhash64(w_i, …, w_{i+n-1})`` (the word TUPLE — no shingle string is
    ever materialized). Only valid when ``size(words) >= n``; callers guard.

    The expansion is zip_with over n shifted slices (the bigram zip_with
    recipe generalized by struct accumulation) instead of an interpreted
    transform(sequence) with n element_at lookups per position — measured
    ~8x faster per core on the sf0.1 corpus with bit-identical hashes
    (same xxhash64 argument tuple per position).
    """
    length = F.size(words) - (n - 1)
    slices = [F.slice(words, j + 1, length) for j in range(n)]
    if n == 1:
        return F.transform(words, lambda w: F.xxhash64(w))
    if n == 2:
        return F.zip_with(slices[0], slices[1], lambda a, b: F.xxhash64(a, b))
    acc = F.zip_with(
        slices[0],
        slices[1],
        lambda a, b: F.struct(a.alias("f0"), b.alias("f1")),
    )

    def _extend(width: int):
        return lambda s, c: F.struct(
            *[s[f"f{i}"].alias(f"f{i}") for i in range(width)],
            c.alias(f"f{width}"),
        )

    for j in range(2, n - 1):
        acc = F.zip_with(acc, slices[j], _extend(j))
    return F.zip_with(
        acc,
        slices[n - 1],
        lambda s, c: F.xxhash64(*[s[f"f{i}"] for i in range(n - 1)], c),
    )


def hashed_word_shingles(words: Column, n: int = 3) -> Column:
    """Distinct word n-gram hashes (``array<bigint>``) straight from a
    pre-split ``words`` array: ``xxhash64(w_i, …, w_{i+n-1})`` on the word
    TUPLE, never materializing the concatenated shingle string.

    Measured ~2x faster than building the n-gram string and hashing it at
    bench scale (the concat allocation dominates, not the hashing), with
    identical downstream semantics — every consumer treats the hash as an
    opaque set element, so Jaccard/containment/contamination outputs are
    unchanged w.h.p. (64-bit collisions only matter within one pair's
    union: p ~ 1e-16). NOTE: the hash VALUES differ from the old
    string-based definition — a persisted streaming band index built before
    this change must be rebuilt (the index and probe sides must share one
    definition).

    r15: the expansion is zip_with over n shifted slices (see
    hashed_ngram_tuples) instead of an interpreted transform(sequence)
    with n element_at lookups per position — measured ~8x faster per core
    on the sf0.1 corpus with bit-identical hashes (same xxhash64 argument
    tuple per position).
    """
    hashed = hashed_ngram_tuples(words, n)
    return F.when(
        F.size(words) >= n, F.array_distinct(hashed)
    ).otherwise(F.array().cast("array<bigint>"))


def minhash_signature(hashes: Column) -> Column:
    """Full K-element minhash signature via an Arrow-vectorized pandas UDF.

    Input is raw signed xxhash64 values; the UDF folds them to u32
    (``h mod 2^32``) before the affine permutations. The K x |shingles|
    permutation-min is a dense integer matrix op — exactly the shape numpy
    does in microseconds per document and Spark's higher-order functions do
    pathologically slowly (interpreted per-element evaluation; measured
    10-30x slower than this UDF at sf0.1). Constants are module-level so
    every executor builds the same permutations; arithmetic stays in int64
    (a < 2^30, x < 2^32 => a*x + b < 2^62, no overflow). The whole batch is
    permuted as ONE ragged-flattened matrix, then min-reduced per document
    with reduceat — no per-row Python loop.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NB: no type hints on the UDF — `from __future__ import annotations`
    # stringifies them, which pandas_udf's signature inspection rejects.
    @pandas_udf("array<bigint>")
    def _sig(batch):
        a = np.asarray(MINHASH_A, dtype=np.int64)[:, None]
        b = np.asarray(MINHASH_B, dtype=np.int64)[:, None]
        lens = np.fromiter((0 if h is None else len(h) for h in batch), dtype=np.int64)
        flat = (
            np.concatenate([np.asarray(h, dtype=np.int64) for h in batch if h is not None and len(h)])
            if lens.sum()
            else np.empty(0, dtype=np.int64)
        )
        flat %= 1 << 32  # fold signed 64-bit to u32 (matches pmod(xxhash64, 2^32))
        perm = (a * flat[None, :] + b) % _MERSENNE_P  # (K, total_shingles)
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        out = np.full((len(lens), MINHASH_K), _MERSENNE_P, dtype=np.int64)
        nz = lens > 0
        if nz.any():
            # reduceat needs strictly valid segment starts: run it over the
            # non-empty segments only, then scatter back.
            seg = np.minimum.reduceat(perm, starts[nz], axis=1)  # (K, n_nonempty)
            out[nz] = seg.T
        return pd.Series(list(out))

    return _sig(hashes)


def band_key_array(mh: Column) -> Column:
    """Signature array -> LSH band keys, one 8-byte bigint per band.

    Each key is xxhash64(band_id, row values of that band): the band id is
    folded INTO the hash, so a single bigint column both identifies the band
    and its bucket — half the shuffle bytes of the previous
    '<h_2b>_<h_2b+1>' string keys. A 64-bit key collision across bands
    merely creates a spurious CANDIDATE pair (p ~ 1e-7 at millions of
    buckets), which exact Jaccard verification then rejects — correctness
    is unaffected at any scale.
    """
    return F.array(
        *[
            F.xxhash64(
                F.lit(b),
                *[F.element_at(mh, b * LSH_ROWS + r + 1) for r in range(LSH_ROWS)],
            )
            for b in range(LSH_BANDS)
        ]
    )


def band_keys(df: DataFrame) -> DataFrame:
    """(doc_id, mh-array) -> exploded (doc_id, band_key bigint)."""
    return df.select(
        "doc_id", F.explode(band_key_array(F.col("mh"))).alias("band_key")
    )


# Mega-bucket guard: a degenerate corpus (thousands of docs sharing one band
# key / simhash chunk) would otherwise expand O(k^2) candidate pairs for a
# single bucket. Buckets are truncated to this many members (deterministic:
# sort_array keeps the lowest doc_ids), bounding per-bucket work at
# ~cap^2/2 pairs. Healthy buckets are far below the cap, so results are
# identical on non-adversarial data; real 100 TB deployments tune this.
MAX_BUCKET_MEMBERS = 1024


def capped_members(member: Column) -> Column:
    """``sort_array(collect_set(member))`` truncated to MAX_BUCKET_MEMBERS.

    The collect_set row is O(k) for a k-member bucket (8-16 B per member —
    fine even for very large buckets); the cap keeps the downstream pair
    expansion from going quadratic in k.
    """
    return F.slice(F.sort_array(F.collect_set(member)), 1, MAX_BUCKET_MEMBERS)


def expand_bucket_pairs(buckets: DataFrame, members: str, make_pair) -> DataFrame:
    """Expand each bucket's sorted member array into all i < j pairs.

    Returns a DataFrame with one struct column ``p`` = make_pair(m[i], m[j]).
    Two chained generators (posexplode, then explode of the per-member tail
    slice) stream the pairs through whole-stage codegen one row at a time —
    peak per-task memory is O(k) for a k-member bucket, never the O(k^2)
    single-row array a flatten-of-transforms would materialize. The
    ``_i + 2`` is the 1-based `slice` start for 'everything after element i'.
    Shared by the MinHash band buckets and the SimHash chunk buckets.
    """
    tails = buckets.select(
        F.col(members).alias("_ms"), F.posexplode(members).alias("_i", "_x")
    )
    return tails.select(
        F.col("_x"),
        F.explode(F.slice(F.col("_ms"), F.col("_i") + F.lit(2), F.size("_ms"))).alias("_y"),
    ).select(make_pair(F.col("_x"), F.col("_y")).alias("p"))


# SimHash geometry: 60 payload bits = 4 pigeonhole chunks x 15 bits, so any
# pair at Hamming distance <= 3 shares at least one whole chunk. 60 bits (not
# 63) because the base token hash is the first 15 hex chars of md5 — a value
# both Spark (conv(substr(md5),16,10)) and DuckDB (CAST('0x'||substr(md5)))
# compute identically, which is what makes the DuckDB oracle possible.
SIMHASH_BITS = 60
SIMHASH_CHUNKS = 4
SIMHASH_CHUNK_BITS = 15


def simhash_signature(token_hashes: Column, n_bits: int = SIMHASH_BITS) -> Column:
    """n_bits-wide SimHash from a per-doc array of int64 token hashes,
    computed row-wise in one Arrow batch (no token explode, no per-bit
    aggregate — signatures cost zero shuffle; measured ~4x over the
    exploded-vote formulation at sf0.1). Bit votes: +1 if bit set else -1
    per token; signature bit i = 1 iff the vote sum is positive. Matches
    the SQL shiftright semantics (arithmetic shift on int64)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def _sig(batch):
        bits_idx = np.arange(n_bits, dtype=np.int64)
        lens = np.fromiter((0 if h is None else len(h) for h in batch), dtype=np.int64)
        if lens.sum() == 0:
            return pd.Series(np.zeros(len(lens), dtype=np.int64))
        flat = np.concatenate(
            [np.asarray(h, dtype=np.int64) for h in batch if h is not None and len(h)]
        )
        # One pass per bit over the flat token vector: peak transient is
        # O(tokens) int64, never the (tokens, 63) matrix a single vectorized
        # pass would materialize (~500 B/token — an OOM risk for long docs
        # in big Arrow batches). Same op count, bounded memory.
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        out = np.zeros((len(lens), n_bits), dtype=np.int64)
        nz = lens > 0
        if nz.any():
            for i in range(n_bits):
                votes = (2 * ((flat >> i) & 1) - 1).astype(np.int8)
                out[nz, i] = np.add.reduceat(votes, starts[nz], dtype=np.int64)
        sig = ((out > 0).astype(np.int64) << bits_idx).sum(axis=1)
        return pd.Series(sig)

    return _sig(token_hashes)
