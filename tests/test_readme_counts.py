"""README count gate (round-6 VERDICT item 3): the count-drift
disease was fixed twice in COVERAGE.md and then reappeared in
README.md (402 vs 413 queries, 257 vs 630 tests). This test greps
README.md and compares every stated count against the live registry
it describes, so a third drift site cannot recur silently.

The test-case count is the number of ``def test_`` definitions under
tests/ (a static count — env-gated modules like test_tws's
protobuf-gated cases still define their tests, they just skip at
collection), so the check is stable across environments.
"""

from __future__ import annotations

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _readme():
    with open(os.path.join(REPO, "README.md")) as fh:
        return fh.read()


def test_readme_query_counts_match_registry():
    import sys

    sys.path.insert(0, REPO)
    from pipeline_dataengineer_spark.contract import ORACLES, QUERIES

    text = _readme()
    m = re.search(r"(\d+) named queries", text)
    assert m, "README must state the named-query count"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} named queries; registry has "
        f"{len(QUERIES)} — update README.md"
    )
    m = re.search(r"(\d+) oracle-hash-checked", text)
    assert m and int(m.group(1)) == len(ORACLES), (
        f"README oracle-checked count vs registry {len(ORACLES)}"
    )
    m = re.search(r"(\d+) rows-only", text)
    assert m and int(m.group(1)) == len(QUERIES) - len(ORACLES)
    m = re.search(r"all (\d+) queries", text)
    assert m and int(m.group(1)) == len(QUERIES)


def test_readme_test_count_matches_defs():
    text = _readme()
    m = re.search(r"(\d+) pytest cases", text)
    assert m, "README must state the pytest case count"
    n_defs = 0
    for p in glob.glob(os.path.join(REPO, "tests", "*.py")):
        with open(p) as fh:
            n_defs += len(
                re.findall(r"^(?:    )?def test_", fh.read(), re.M)
            )
    assert int(m.group(1)) == n_defs, (
        f"README says {m.group(1)} pytest cases; tests/ defines "
        f"{n_defs} — update README.md"
    )


def test_readme_plan_check_count_matches_audit():
    import importlib.util

    text = _readme()
    m = re.search(r"(\d+) machine-checked plan shapes", text)
    assert m, "README must state the plan-check count"
    spec = importlib.util.spec_from_file_location(
        "explain_audit", os.path.join(REPO, "tools", "explain_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert int(m.group(1)) == len(mod.EXPECTATIONS), (
        f"README says {m.group(1)} plan shapes; explain_audit has "
        f"{len(mod.EXPECTATIONS)} — update README.md"
    )


def test_readme_headline_count_matches_bench():
    import importlib.util

    text = _readme()
    m = re.search(r"headline benchmark, (\d+) queries", text)
    assert m, "README must state the headline query count"
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert int(m.group(1)) == len(mod.HEADLINE), (
        f"README says {m.group(1)} headline queries; bench.HEADLINE "
        f"has {len(mod.HEADLINE)} — update README.md"
    )
