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
