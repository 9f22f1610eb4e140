"""Round-6 fixes: whole-symbol BPE merge semantics, size-aware broadcast,
unpersist discipline, NTZ-guard zone equivalence, asof-nearest NULL gaps."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.operators.mining5 import (
    _duck_merge,
    _merge_pair_arr,
)

# (word-as-spaced-symbols, pair, merged, expected greedy-BPE result).
# 'th t' + pair 'h t' is the boundary case: substring replace would
# rewrite it to 'tht' by matching the tail of merged symbol 'th'.
MERGE_CASES = [
    ("t h t h", "t h", "th", "th th"),
    ("t h t", "h t", "ht", "t ht"),
    ("th t", "h t", "ht", "th t"),
    ("a a a a a", "a a", "aa", "aa aa a"),
    ("a a a", "a a", "aa", "aa a"),
    ("", "a b", "ab", ""),
    ("x", "a b", "ab", "x"),
]


@pytest.mark.parametrize("w,pair,merged,expect", MERGE_CASES)
def test_bpe_merge_whole_symbols_spark(spark, w, pair, merged, expect):
    """The Spark fold merges whole symbols only, greedy left-to-right —
    never a substring match across a previously-merged symbol boundary."""
    p1, p2 = pair.split(" ")
    got = (
        spark.createDataFrame([(w,)], "w string")
        .select(
            F.array_join(
                _merge_pair_arr(F.split("w", " "), p1, p2, merged), " "
            ).alias("r")
        )
        .first()["r"]
    )
    assert got == expect


@pytest.mark.parametrize("w,pair,merged,expect", MERGE_CASES)
def test_bpe_merge_whole_symbols_duckdb(w, pair, merged, expect):
    """The DuckDB oracle fold implements the identical greedy semantics,
    so the parity gate actually exercises true BPE on both engines."""
    con = duckdb.connect()
    q = f"SELECT {_duck_merge(repr(w), repr(pair), repr(merged))} AS r"
    assert con.execute(q).fetchone()[0] == expect
    con.close()
