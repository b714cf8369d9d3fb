"""Perceptual image hashing + banded Hamming near-dup join.

dHash invariance (multimodal/media.py:image_dhash) and the generic
pigeonhole-banded Hamming join (operators/dedup.py:
hamming_near_duplicates) vs brute force.
"""

import random

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.multimodal.media import image_dhash
from pipeline_dataengineer_spark.operators.dedup import (
    hamming_near_duplicates,
)
from tests.test_multimodal import make_png


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_hamming_join_matches_bruteforce(spark):
    rng = random.Random(3)
    base = [rng.getrandbits(63) for _ in range(40)]
    rows = []
    for i, h in enumerate(base):
        rows.append((2 * i, h))
        flipped = h
        for b in rng.sample(range(63), rng.randint(0, 6)):
            flipped ^= 1 << b
        rows.append((2 * i + 1, flipped))
    df = spark.createDataFrame(rows, "id long, h long")
    d = 4
    got = {
        (r["id_a"], r["id_b"], r["hamming_distance"])
        for r in hamming_near_duplicates(df, "id", "h", max_distance=d).collect()
    }
    want = {
        (ia, ib, _ham(ha, hb))
        for ia, ha in rows
        for ib, hb in rows
        if ia < ib and _ham(ha, hb) <= d
    }
    assert got == want and len(want) >= 10


def test_hamming_join_exact_boundary(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, (1 << 3) | (1 << 40)), (3, 7)], "id long, h long"
    )
    out = {
        (r["id_a"], r["id_b"]): r["hamming_distance"]
        for r in hamming_near_duplicates(df, "id", "h", max_distance=2).collect()
    }
    assert out == {(1, 2): 2}  # (1,3) distance 3 excluded


def test_hamming_join_negative_hashes(spark):
    """Sign bit set (negative long) must work through the unsigned
    band shifts and popcount."""
    h1 = -(1 << 62)  # top bits set
    df = spark.createDataFrame([(1, h1), (2, h1 ^ 1)], "id long, h long")
    out = hamming_near_duplicates(df, "id", "h", max_distance=1).collect()
    assert len(out) == 1 and out[0]["hamming_distance"] == 1


def test_image_dhash_perceptual(spark):
    def scene(x, y):
        return (x * 13 % 256, (x + y) * 7 % 256, y * 11 % 256)

    def scene_bright(x, y):
        r, g, b = scene(x, y)
        return (min(r + 12, 255), min(g + 12, 255), min(b + 12, 255))

    def other(x, y):
        return (y * 29 % 256, x * 3 % 256, (x * y) % 256)

    rows = [
        (1, bytearray(make_png(40, 32, scene))),
        (2, bytearray(make_png(40, 32, scene_bright))),
        (3, bytearray(make_png(40, 32, other))),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert got[4] is None
    assert _ham(got[1], got[2]) <= 6, "brightness shift must stay near"
    assert _ham(got[1], got[3]) > 12, "different scene must be far"


def test_image_neardup_pipeline(spark):
    """End to end: PNG bytes → dhash → hamming join finds the
    perceptual pair and not the unrelated image."""
    def scene(x, y):
        return (x * 5 % 256, y * 9 % 256, (x ^ y) % 256)

    def scene_tweak(x, y):
        r, g, b = scene(x, y)
        return (min(r + 6, 255), g, min(b + 6, 255))

    def noise(x, y):
        return ((x * y * 31) % 256, (x * 17 + y * 57) % 256, (y * y) % 256)

    rows = [
        (10, bytearray(make_png(24, 24, scene))),
        (11, bytearray(make_png(24, 24, scene_tweak))),
        (12, bytearray(make_png(24, 24, noise))),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    hashed = image_dhash(df).filter(F.col("dhash").isNotNull())
    pairs = {
        (r["id_a"], r["id_b"])
        for r in hamming_near_duplicates(
            hashed, "id", "dhash", max_distance=6
        ).collect()
    }
    assert (10, 11) in pairs and (10, 12) not in pairs
