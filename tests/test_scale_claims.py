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
    shipped ratio > 2.5 with a >= 0.75 s base has a written claim
    (sub-second bases are exempt from the unclaimed rule — a ratio
    of two sub-second timings on a contended box is noise; the r5/r6
    false reds q_prune_semi_join 2.55 and q_asof_join 2.69 were both
    this). Skips when the current BENCH_DETAIL.json predates the
    claims check (no scale_10x), e.g. after an sf0.01 smoke run with
    the 10x tier disabled."""
    _, check_scale_claims = _load()
    path = os.path.join(REPO, "BENCH_DETAIL.json")
    detail = json.load(open(path))
    scale = detail.get("scale_10x") or {}
    if not scale:
        pytest.skip("BENCH_DETAIL.json has no scale_10x tier")
    result = check_scale_claims(scale, detail.get("queries") or {})
    assert result["ok"], json.dumps(result, indent=1)


def test_unclaimed_gate_noise_robust():
    """The unclaimed rule must exempt sub-second-base queries (and
    report them) but still fire on a genuinely slow unclaimed query."""
    _, check_scale_claims = _load()
    scale = {"q_fake_subsecond": 3.1, "q_fake_slow": 3.1}
    base = {"q_fake_subsecond": 0.3, "q_fake_slow": 2.4}
    result = check_scale_claims(scale, base)
    assert [u["query"] for u in result["unclaimed_over_2_5"]] == [
        "q_fake_slow"
    ]
    assert [n["query"] for n in result["unclaimed_subsecond_noise"]] == [
        "q_fake_subsecond"
    ]
    assert not result["ok"]
    # with the slow one claimed, the sub-second wobble alone is ok
    assert check_scale_claims(
        {"q_fake_subsecond": 3.1}, {"q_fake_subsecond": 0.3}
    )["ok"]
    # no base time recorded -> conservative: still requires a claim
    assert not check_scale_claims({"q_fake_unknown": 3.1}, {})["ok"]
