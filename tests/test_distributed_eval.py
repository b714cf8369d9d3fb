"""Round-5 VERDICT item 3: the eval/causal tier's distributed=True
paths (global_cumsum / global_running_last two-phase scans) must be
bit-identical to the default unkeyed-window paths on multi-partition,
tie-heavy fixtures — and their physical plans must contain no Window
at all."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------------------------
# primitives
# ------------------------------------------------------------------


def test_global_cumsum_matches_window(spark):
    from pipeline_dataengineer_spark.operators.order import global_cumsum

    df = spark.createDataFrame(
        [(i % 37, (i * 7) % 11, float(i % 5)) for i in range(500)],
        "k int, v int, w double",
    ).repartition(9)
    got = {
        (r["k"], r["v"], r["w"]): (r["cum_v"], r["cum_w"], r["idx"])
        for r in global_cumsum(
            df, ["k", "v", "w"], ["v", "w"], index_col="idx"
        ).collect()
    }
    rows = sorted(
        df.collect(), key=lambda r: (r["k"], r["v"], r["w"])
    )
    cv, cw = 0, 0.0
    seen = {}
    for i, r in enumerate(rows):
        cv += r["v"]
        cw += r["w"]
        seen[(r["k"], r["v"], r["w"])] = (cv, cw, i)
    # duplicate keys: compare on the LAST row of each tie run (the
    # dict keeps the last), which pins both orders identically
    for key, (ev, ew, ei) in seen.items():
        gv, gw, gi = got[key]
        assert gv == ev and gw == pytest.approx(ew) and gi == ei


def test_global_cumsum_exclusive(spark):
    from pipeline_dataengineer_spark.operators.order import global_cumsum

    df = spark.createDataFrame(
        [(i, 1) for i in range(100)], "k int, one int"
    ).repartition(7)
    out = {
        r["k"]: r["cum_one"]
        for r in global_cumsum(
            df, ["k"], ["one"], exclusive=True
        ).collect()
    }
    assert out == {i: i for i in range(100)}


def test_global_running_last(spark):
    from pipeline_dataengineer_spark.operators.order import (
        global_running_last,
    )

    rows = [(i, float(i * 10), i % 3 == 0) for i in range(50)]
    df = spark.createDataFrame(rows, "k int, v double, ok boolean")
    out = {
        r["k"]: r["last_v"]
        for r in global_running_last(
            df.repartition(8), ["k"], ["v"], "ok"
        ).collect()
    }
    for k in range(50):
        assert out[k] == pytest.approx(float((k // 3) * 3 * 10))


def test_global_running_last_no_predecessor_null(spark):
    from pipeline_dataengineer_spark.operators.order import (
        global_running_last,
    )

    df = spark.createDataFrame(
        [(1, 1.0, False), (2, 2.0, True), (3, 3.0, False)],
        "k int, v double, ok boolean",
    )
    out = {
        r["k"]: r["last_v"]
        for r in global_running_last(
            df.repartition(3), ["k"], ["v"], "ok"
        ).collect()
    }
    assert out[1] is None
    assert out[2] == 2.0
    assert out[3] == 2.0


# ------------------------------------------------------------------
# eval tier parity: tie-heavy, multi-partition
# ------------------------------------------------------------------


def _scored(spark):
    # 9 distinct scores over 600 rows -> massive ties; labels mixed
    # within every score group so tie-handling is actually exercised
    rows = [
        (float((i * i) % 9) / 10.0, int((i * 13) % 7 < 3))
        for i in range(600)
    ]
    return spark.createDataFrame(rows, "score double, label int").repartition(
        11
    )


def test_roc_auc_distributed_parity(spark):
    from pipeline_dataengineer_spark.operators.calibration import roc_auc

    df = _scored(spark)
    a = roc_auc(df, "score", "label").collect()[0]
    b = roc_auc(df, "score", "label", distributed=True).collect()[0]
    assert 0.0 < a["auc"] < 1.0  # non-degenerate fixture
    assert a == b


def test_average_precision_distributed_parity(spark):
    from pipeline_dataengineer_spark.operators.calibration import (
        average_precision,
    )

    df = _scored(spark)
    a = average_precision(df, "score", "label").collect()[0]
    b = average_precision(
        df, "score", "label", distributed=True
    ).collect()[0]
    assert 0.0 < a["ap"] < 1.0
    assert a == b


def test_propensity_att_distributed_parity(spark):
    from pipeline_dataengineer_spark.operators.causal import (
        propensity_match_att,
    )

    # tied control scores (the round-5 ADVICE case) + treated units
    # below the lowest / above the highest control
    rows = []
    for i in range(300):
        s = float(i % 20) / 20.0
        rows.append((0, float((i * 7) % 50), s))
    for i in range(80):
        rows.append((1, float(i % 30), float((i * 3) % 23) / 22.0))
    rows += [(1, 5.0, -0.5), (1, 6.0, 1.5)]  # outside control range
    df = spark.createDataFrame(rows, "t int, y double, s double")
    a = propensity_match_att(
        df.repartition(13), "t", "y", "s", caliper=0.25
    ).collect()[0]
    b = propensity_match_att(
        df.repartition(13), "t", "y", "s", caliper=0.25, distributed=True
    ).collect()[0]
    assert a == b
    assert a["n_treated"] == 82


def test_distributed_plans_have_no_window(spark):
    from pipeline_dataengineer_spark.operators.calibration import (
        average_precision,
        roc_auc,
    )
    from pipeline_dataengineer_spark.operators.causal import (
        propensity_match_att,
    )

    df = _scored(spark)
    assert "Window" not in _plan(roc_auc(df, "score", "label", distributed=True))
    assert "Window" not in _plan(
        average_precision(df, "score", "label", distributed=True)
    )
    p = spark.createDataFrame(
        [(i % 2, float(i), float(i % 10) / 10.0) for i in range(50)],
        "t int, y double, s double",
    )
    assert "Window" not in _plan(
        propensity_match_att(p, "t", "y", "s", distributed=True)
    )
    # the default paths DO carry the (documented) unkeyed window
    assert "Window" in _plan(roc_auc(df, "score", "label"))


def test_global_cummin(spark):
    from pipeline_dataengineer_spark.operators.order import global_cummin

    vals = [float((i * 17) % 29) for i in range(200)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k int, v double"
    ).repartition(9)
    got = {
        r["k"]: r["cummin_v"]
        for r in global_cummin(df, ["k"], ["v"]).collect()
    }
    run = float("inf")
    for i, v in enumerate(vals):
        run = min(run, v)
        assert got[i] == run


def test_benjamini_hochberg_distributed_parity(spark):
    from pipeline_dataengineer_spark.operators.stats_tests import (
        benjamini_hochberg,
    )

    rows = [(i, float(((i * 37) % 101) + 1) / 101.0) for i in range(300)]
    df = spark.createDataFrame(rows, "hyp_id int, p double").repartition(
        11
    )
    a = sorted(benjamini_hochberg(df, "hyp_id", "p").collect())
    b = sorted(
        benjamini_hochberg(df, "hyp_id", "p", distributed=True).collect()
    )
    assert a == b
    assert "Window" not in _plan(
        benjamini_hochberg(df, "hyp_id", "p", distributed=True)
    )
