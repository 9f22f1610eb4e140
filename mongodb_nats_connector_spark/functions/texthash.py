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


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams of ``text`` (empty array when < n words)."""
    words = F.split(text, " ")
    # build grams for i = 1..(len-n+1); sequence bounds are inclusive
    return F.when(
        F.size(words) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(words) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(words, i + F.lit(j)) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_base_hash(shingle: Column) -> Column:
    """Non-negative 32-bit base hash of a shingle (xxhash64 folded to u32)."""
    return F.pmod(F.xxhash64(shingle), F.lit(1 << 32))


def minhash_aggs(x: Column) -> list[Column]:
    """The K min-over-permutation aggregate expressions for a grouped doc."""
    return [
        F.min((F.lit(MINHASH_A[i]) * x + F.lit(MINHASH_B[i])) % F.lit(_MERSENNE_P)).alias(
            f"mh{i}"
        )
        for i in range(MINHASH_K)
    ]


def band_keys(df: DataFrame) -> DataFrame:
    """doc-level minhash signature -> exploded (doc_id, band_id, band_key)."""
    bands = F.array(
        *[
            F.concat_ws(
                "_", *[F.col(f"mh{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
            )
            for b in range(LSH_BANDS)
        ]
    )
    return df.select(
        "doc_id", F.posexplode(bands).alias("band_id", "band_key")
    )


def simhash63(token_hash: Column, bit: int) -> Column:
    """Vote expression for one SimHash bit: +1 if bit set else -1."""
    return F.when(F.shiftright(token_hash, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
