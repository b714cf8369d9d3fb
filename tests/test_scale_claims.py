"""Bench <-> SCALE_NOTES consistency gate (round-4 VERDICT item 2):
the shipped BENCH_DETAIL.json scale_10x ratios must agree with the
machine-checked claims table in SCALE_NOTES.md. Round 4 shipped two
testimony/artifact mismatches (22.14 shipped vs 5.2 written); this
test makes the docs follow the artifact or fail CI."""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    import sys

    sys.path.insert(0, REPO)
    from bench import check_scale_claims, parse_scale_claims

    return parse_scale_claims, check_scale_claims


def test_claims_table_parses():
    parse_scale_claims, _ = _load()
    claims = parse_scale_claims()
    assert len(claims) >= 5
    assert "q_interval_join_anti" in claims
    assert all(0 < v < 50 for v in claims.values())


def test_shipped_ratios_match_claims():
    """Every shipped scale_10x ratio within 2x of its claim; every
    shipped ratio > 2.5 has a written claim. Skips when the current
    BENCH_DETAIL.json predates the claims check (no scale_10x), e.g.
    after an sf0.01 smoke run with the 10x tier disabled."""
    _, check_scale_claims = _load()
    path = os.path.join(REPO, "BENCH_DETAIL.json")
    detail = json.load(open(path))
    scale = detail.get("scale_10x") or {}
    if not scale:
        pytest.skip("BENCH_DETAIL.json has no scale_10x tier")
    result = check_scale_claims(scale)
    assert result["ok"], json.dumps(result, indent=1)
