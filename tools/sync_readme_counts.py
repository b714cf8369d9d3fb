"""Rewrite every machine-checked count in README.md from the live
registries (queries / oracles / pytest defs / headline bench / plan
shapes). tests/test_readme_counts.py is the gate; this is the pen.
Run after adding queries, tests, headline entries or plan checks."""

from __future__ import annotations

import glob
import importlib.util
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pipeline_dataengineer_spark.contract import ORACLES, QUERIES

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    spec = importlib.util.spec_from_file_location(
        "explain_audit", os.path.join(REPO, "tools", "explain_audit.py")
    )
    audit = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(audit)

    nq, no = len(QUERIES), len(ORACLES)
    nd = sum(
        len(re.findall(r"^(?:    )?def test_", open(p).read(), re.M))
        for p in glob.glob(os.path.join(REPO, "tests", "*.py"))
    )
    path = os.path.join(REPO, "README.md")
    t = open(path).read()
    t = re.sub(r"\d+ named queries", f"{nq} named queries", t)
    t = re.sub(r"\d+ oracle-hash-checked", f"{no} oracle-hash-checked", t)
    t = re.sub(r"\d+ rows-only", f"{nq - no} rows-only", t)
    t = re.sub(r"all \d+ queries", f"all {nq} queries", t)
    t = re.sub(r"\d+ pytest cases", f"{nd} pytest cases", t)
    t = re.sub(
        r"\d+ queries\b(?=[^\n]*headline)|(?<=headline benchmark, )\d+ queries",
        f"{len(bench.HEADLINE)} queries",
        t,
    )
    t = re.sub(
        r"\d+ machine-checked plan shapes",
        f"{len(audit.EXPECTATIONS)} machine-checked plan shapes",
        t,
    )
    open(path, "w").write(t)
    print(
        f"queries={nq} oracles={no} rows_only={nq - no} tests={nd} "
        f"headline={len(bench.HEADLINE)} plan={len(audit.EXPECTATIONS)}"
    )


if __name__ == "__main__":
    main()
