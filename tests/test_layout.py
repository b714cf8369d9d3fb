"""Z-order layout: Morton interleave correctness, content
preservation, and the actual pruning win (file bounding boxes)."""

from __future__ import annotations

import glob

import pandas as pd

from pipeline_dataengineer_spark.operators.layout import zorder_layout, zvalue


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zvalue_matches_python_morton(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zvalue(["x", "y"], bits=3).alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton(x, y, 3), (x, y)


def test_zorder_layout_preserves_content(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 64, float(i)) for i in range(512)], ["x", "y", "payload"]
    )
    out = zorder_layout(df, ["x", "y"], num_files=8)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, df.collect()))
    assert out.columns == df.columns


def test_zorder_files_prune_secondary_column(spark, tmp_path):
    """On a 64x64 grid split into 16 files, a filter on the SECOND
    column alone must skip most z-ordered files; an x-sorted layout
    can't skip any (every file spans the full y range)."""
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, ["x", "y"])

    zdir = str(tmp_path / "zord")
    xdir = str(tmp_path / "xsort")
    zorder_layout(df, ["x", "y"], num_files=16).write.parquet(zdir)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xdir)

    def files_intersecting(path, lo, hi):
        n = 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            pdf = pd.read_parquet(f, columns=["y"])
            if not (pdf["y"].max() < lo or pdf["y"].min() > hi):
                n += 1
        return n

    # y in [8, 15]: z-order confines y-locality to a few files
    z_hit = files_intersecting(zdir, 8, 15)
    x_hit = files_intersecting(xdir, 8, 15)
    assert x_hit == 16  # x-sorted layout: every file spans all y
    assert z_hit <= 8, z_hit  # z-order: at most half the files


def test_zvalue_rejects_overflowing_interleave():
    import pytest

    with pytest.raises(ValueError, match="63"):
        zvalue(["a", "b", "c", "d", "e", "f"], bits=12)


def test_hilbert_index_bijection_and_adjacency(spark):
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.operators.layout import (
        with_hilbert_index,
    )

    grid = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    rows = with_hilbert_index(grid, "x", "y", out="h", order=4).collect()
    d2xy = {r["h"]: (r["x"], r["y"]) for r in rows}
    assert len(d2xy) == 256 and set(d2xy) == set(range(256))  # bijection
    assert all(
        abs(d2xy[i][0] - d2xy[i + 1][0]) + abs(d2xy[i][1] - d2xy[i + 1][1]) == 1
        for i in range(255)
    )  # consecutive curve positions are ADJACENT cells (Morton isn't)


def test_hilbert_layout_preserves_rows(spark):
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.operators.layout import hilbert_layout

    df = spark.range(1000).select(
        "id",
        (F.col("id") * 37 % 101).cast("double").alias("a"),
        (F.col("id") * 53 % 97).cast("double").alias("b"),
    )
    out = hilbert_layout(df, ["a", "b"], num_files=4, bits=6)
    assert sorted(r["id"] for r in out.collect()) == list(range(1000))
    assert set(out.columns) == {"id", "a", "b"}

    import pytest

    with pytest.raises(ValueError):
        hilbert_layout(df, ["a"], num_files=4)
