"""Registry mechanics: rotation of the driver's correctness window.

The external driver checks the FIRST 50 names in queries() order each round.
`all_queries()` therefore orders names without a green driver row first, by
reading past CORRECTNESS_r*.json artifacts — across rounds this converges to
full hard verification with no hand-maintained lists.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from mongodb_nats_connector_spark import registry


def test_driver_verified_parses_artifacts(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "green": {"hash_match": True, "rows_match": True, "err": None},
        "rows_only": {"hash_match": None, "err": "no_oracle"},
        "wrong": {"hash_match": False, "rows_match": True, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "late_green": {"hash_match": True, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r03.json").write_text("not json {")  # ignored
    hash_verified, rows_only = registry._driver_verified(root=Path(tmp_path))
    assert hash_verified == {"green", "late_green"}
    assert rows_only == {"rows_only"}
    # a hash MISMATCH is not verified: it must rotate back into the window
    assert "wrong" not in hash_verified


def test_all_queries_orders_unverified_first():
    """With the repo's real CORRECTNESS_r01.json present, round-1-verified
    names (e.g. q1_pricing_summary) must sort after never-checked ones, and
    every name must appear exactly once."""
    names = list(registry.all_queries())
    assert len(names) == len(set(names))
    root = Path(registry.__file__).resolve().parent.parent
    if not list(root.glob("CORRECTNESS_r*.json")):
        pytest.skip("no driver artifacts in this checkout")
    hash_verified, rows_only = registry._driver_verified()
    qs = registry.all_queries()
    pos = {n: i for i, n in enumerate(names)}
    # oracle-less queries already executed rows-only rank with the verified
    settled = hash_verified | {
        n for n in names if qs[n].oracle is None and n in rows_only
    }
    pending = [n for n in names if n not in settled]
    if pending and settled & set(names):
        assert max(pos[n] for n in pending) < min(
            pos[n] for n in (settled & set(names))
        ), "settled names must all sort after pending ones"


def test_duplicate_registration_rejected():
    with pytest.raises(ValueError, match="duplicate"):
        @registry.register("q1_pricing_summary")
        def dup(spark, sf_dir):  # pragma: no cover
            raise AssertionError
