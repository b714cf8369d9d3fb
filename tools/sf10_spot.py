"""One-off sf10 spot tier (round-10 VERDICT item 4): measure the
top-5 most expensive headline queries at ~100x the shipped bench
scale (sf10: 60M-row lineitem, 500k documents, 400k embeddings after
the in-query doubling) and record sf10/sf1 ratios — direct evidence
for the "plans you'd want at 100x" claim instead of extrapolating
from the bench's 10x tier.

Usage:
    python tools/sf10_spot.py build     # sf1 (bench 10x dir) -> sf10
    python tools/sf10_spot.py measure   # paired sf1 + sf10 legs

Build: second-level replication of the bench's sf1 tier (itself
built by bench.ensure_10x from /root/testdata/sf0.1). Keys shift by
i * 100M per replica (first level used i * 10M, so ranges stay
disjoint and within int64). Document text is passed through the i-th
power of a fixed 26-letter substitution cipher — NOT the first
level's alphabet rotation: composing a second rotation would make
(i1, i2) pairs with equal i1+i2 IDENTICAL documents, turning the
dedup queries into measurements of 10-way duplicate clusters instead
of corpus scaling. The builder asserts all 100 composite maps are
distinct. Embeddings replicate with shifted ids (same posture as the
first level: duplicate vectors with distinct ids — SemDeDup's
auto-k keeps per-cluster pair work constant regardless).

Measure: ONE fresh JVM runs sf1 legs then sf10 legs (paired — host
drift cancels in the ratio, the bench's round-8 lesson), 2 warm reps
per query per tier after the standard session/worker warmup; the
decided ratio is min(sf10 legs)/min(sf1 legs) (min per LEG only
removes contention inflation — the round-9/10 gate statistic).
Writes SF10_SPOT.json; the narrative lands in SCALE_NOTES.md.
"""

from __future__ import annotations

import json
import os
import shutil
import string
import sys
import time
from functools import reduce

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1_DIR = "/tmp/spark_graft_10x_sf0.1"
SF10_DIR = "/tmp/spark_graft_sf10"
BASE_SF_DIR = "/root/testdata/sf0.1"
REPLICAS = 10
KEY_OFFSET = 100_000_000  # first level used 10M; keep ranges disjoint

# One fixed substitution cipher (a permutation of a-z with order > 10
# and no power equal to an alphabet rotation — asserted below).
ALPHA = string.ascii_lowercase
CIPHER = "qwertyuiopasdfghjklzxcvbnm"

QUERY_NAMES = [
    "q_tpch_q21_shape",
    "q_minhash_neardup",
    "q_dup_spans",
    "q_boilerplate_segments",
    "q_semantic_dedup",
]


def _cipher_powers() -> list[str]:
    """CIPHER^i as translate targets, i in 0..REPLICAS-1, with the
    distinctness proof: no power may equal any alphabet rotation,
    else a (first-level rotation, second-level power) pair collides
    with another and plants cross-replica duplicate documents."""
    powers = [ALPHA]
    for _ in range(REPLICAS - 1):
        prev = powers[-1]
        powers.append("".join(CIPHER[ord(c) - 97] for c in prev))
    rotations = {ALPHA[i:] + ALPHA[:i] for i in range(26)}
    for i, p in enumerate(powers[1:], 1):
        assert p not in rotations, f"CIPHER^{i} is a rotation"
    assert len(set(powers)) == REPLICAS, "cipher powers not distinct"
    return powers


def build() -> None:
    from pyspark.sql import functions as F

    from bench import ensure_10x
    from pipeline_dataengineer_spark.catalog import table
    from pipeline_dataengineer_spark.session import get_spark

    spark = get_spark("sf10-build")
    ensure_10x(spark, BASE_SF_DIR, SF1_DIR)  # no-op if _READY

    ready = os.path.join(SF10_DIR, "_READY")
    if os.path.exists(ready):
        print("sf10 already built")
        return
    shutil.rmtree(SF10_DIR, ignore_errors=True)
    os.makedirs(SF10_DIR, exist_ok=True)
    powers = _cipher_powers()

    def replicate(name: str, shift_cols: list[str], text_col: str | None = None):
        base = table(spark, SF1_DIR, name)
        parts = []
        for i in range(REPLICAS):
            rep = base
            for c in shift_cols:
                rep = rep.withColumn(c, F.col(c) + F.lit(i * KEY_OFFSET))
            if text_col is not None and i:
                rep = rep.withColumn(
                    text_col, F.translate(F.col(text_col), ALPHA, powers[i])
                )
            parts.append(rep)
        out = reduce(lambda a, b: a.unionByName(b), parts)
        out.write.mode("overwrite").parquet(os.path.join(SF10_DIR, f"{name}.parquet"))
        print(f"  {name}: done")

    t0 = time.time()
    replicate("lineitem", ["l_orderkey"])
    replicate("orders", ["o_orderkey"])
    replicate("events", ["event_id"])
    replicate("documents", ["doc_id"], text_col="text")
    replicate("embeddings", ["vec_id"])
    for dim in ("region", "nation", "customer", "supplier", "part"):
        src = os.path.join(SF1_DIR, f"{dim}.parquet")
        dst = os.path.join(SF10_DIR, f"{dim}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copyfile(src, dst)
    with open(ready, "w") as fh:
        fh.write("ok")
    print(f"sf10 built in {time.time() - t0:.0f}s")


def child(name: str, out_path: str) -> None:
    """Measure ONE query at both tiers in THIS fresh JVM: 2 warm sf1
    legs, then 2 sf10 legs. Fresh JVM per query, not per tier or one
    shared session: a first shared-JVM attempt measured q_dup_spans'
    sf1 legs at 62-88 s vs ~6 s in the bench's fresh-JVM chunks —
    heap/GC state inherited from the queries before it swamped the
    signal (the round-3 in-sequence-inflation lesson, relearned).
    Pairing both tiers inside one JVM keeps host drift out of the
    ratio; sf10 running second inherits only its own query's sf1
    garbage, which can only OVERSTATE the ratio (conservative)."""
    from bench import _warm_session

    from pipeline_dataengineer_spark.contract.queries import QUERIES
    from pipeline_dataengineer_spark.session import get_spark

    spark = get_spark("sf10-spot")
    legs: dict[str, list[float]] = {}
    for label, data_dir in (("sf1", SF1_DIR), ("sf10", SF10_DIR)):
        _warm_session(spark, data_dir)
        per_run = []
        for _ in range(2):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.time()
            QUERIES[name](spark, data_dir).count()
            per_run.append(round(time.time() - t0, 3))
        legs[label] = per_run
    with open(out_path, "w") as fh:
        json.dump(legs, fh)


def measure(names: list[str]) -> None:
    import subprocess
    import tempfile

    out: dict[str, dict] = {}
    for name in names:
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            out_path = tf.name
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "child", name, out_path],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        if proc.returncode != 0:
            print(f"  {name}: CHILD FAILED\n{proc.stderr[-2000:]}")
            out[name] = {"error": proc.stderr.strip().splitlines()[-1][:200]
                         if proc.stderr.strip() else "child failed"}
            continue
        with open(out_path) as fh:
            legs = json.load(fh)
        os.unlink(out_path)
        s1, s10 = legs["sf1"], legs["sf10"]
        out[name] = {
            "sf1_legs": s1,
            "sf10_legs": s10,
            "ratio_min_leg": round(min(s10) / min(s1), 2),
        }
        print(f"  {name}: sf1 {s1} sf10 {s10} ratio "
              f"{out[name]['ratio_min_leg']} [{time.time() - t0:.0f}s]")
    path = os.path.join(REPO, "SF10_SPOT.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out, sort_keys=True))
    print(f"wrote {path}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "measure"
    if mode == "build":
        build()
    elif mode == "child":
        child(sys.argv[2], sys.argv[3])
    else:
        measure(sys.argv[2:] or QUERY_NAMES)
