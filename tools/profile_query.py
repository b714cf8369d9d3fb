"""Profile contract queries in isolation (guide §1: measure first).

Usage:
    python tools/profile_query.py q_bm25 q_rrf_fusion [--reps 3]
        [--explain-dir plans/r10] [--suffix before] [--noop]

For each named query: capture .explain("formatted") to
<explain-dir>/<name>_<suffix>.txt, then time `reps` executions with
the bench's own action (.count(), cache-cleared + GC-hinted between
reps, bench parity) and optionally the noop sink (guide §1.4 —
computes every column, so projection costs are not pruned away).
Prints one line per rep and a per-query summary (min/median).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_dataengineer_spark.contract import QUERIES  # noqa: E402
from pipeline_dataengineer_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    spark = get_spark("profile")
    sc = spark.sparkContext

    # bench-parity warmup: codegen + Arrow workers on every core
    from bench import _warm_session

    _warm_session(spark, args.sf_dir)

    for name in args.names:
        fn = QUERIES[name]
        df = fn(spark, args.sf_dir)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            path = os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt")
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"[{name}] explain -> {path}")
        counts, noops = [], []
        for i in range(args.reps):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            sc.setJobDescription(f"{name} count rep{i}")
            t0 = time.time()
            fn(spark, args.sf_dir).count()
            dt = time.time() - t0
            counts.append(dt)
            print(f"[{name}] count rep{i}: {dt:.3f}s", flush=True)
            if args.noop:
                sc.setJobDescription(f"{name} noop rep{i}")
                t0 = time.time()
                fn(spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                noops.append(dt)
                print(f"[{name}] noop  rep{i}: {dt:.3f}s", flush=True)
            sc.setJobDescription(None)
        msg = (
            f"[{name}] SUMMARY count min={min(counts):.3f} "
            f"med={statistics.median(counts):.3f}"
        )
        if noops:
            msg += (
                f" | noop min={min(noops):.3f} "
                f"med={statistics.median(noops):.3f}"
            )
        print(msg, flush=True)


if __name__ == "__main__":
    main()
