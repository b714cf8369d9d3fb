"""Grid-bucketed spatial joins — distance joins without the
cross-product trap.

A naive ``dist(l, r) <= radius`` join condition has no equi-join key,
so Spark plans a broadcast-nested-loop (or worse, a cartesian) —
quadratic at corpus scale. The standard fix (used by every spatial
engine: PostGIS, Sedona, DBSCAN partitioners) is grid bucketing:

- choose cell width = ``radius``;
- map every LEFT point to the single cell containing it;
- map every RIGHT point to its cell plus the 8 neighbors (a fixed 9x
  explode factor, independent of data size);
- equi-join on the cell key — a plain shuffle hash/sort-merge join —
  then re-check the EXACT distance predicate on the candidates.

Any pair within ``radius`` differs by at most one cell per axis, so
the neighbor expansion is complete; the exact re-check makes the
bucketing invisible to the result. Each qualifying pair meets in
exactly one cell (the left point's own cell), so no dedup pass is
needed.

At 100 TB: the shuffle key is the cell id, so cost tracks point
*density* per cell, not corpus size squared. Hot cells (urban-core
skew) are ordinary hot join keys — AQE skew-join splitting applies,
and the fixed 9x right-side expansion stays a constant factor. The
reference has no spatial operator (SURVEY.md §2); this is a
north-star extension in the same family as ``range_join``
(operators/joins.py) — bucketize an inequality predicate into an
equi-join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_xy: tuple[str, str],
    right_xy: tuple[str, str],
    radius: float,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs with Euclidean distance <= ``radius``.

    Column name collisions between the two sides must be resolved by
    the caller (select/alias) before the call, as with any self-join.
    ``how='inner'`` returns matching pairs; ``how='left_semi'`` /
    ``'left_anti'`` return left rows with / without a neighbor.
    """
    lx, ly = left_xy
    rx, ry = right_xy
    lb = left.withColumn(
        "__cx", F.floor(F.col(lx) / radius)
    ).withColumn("__cy", F.floor(F.col(ly) / radius))
    # Fixed 3x3 neighborhood explode on the right side only: the
    # blow-up is a constant 9x regardless of scale, and every pair
    # within radius shares the LEFT point's own cell with one of the
    # right replicas — complete, and duplicate-free without a
    # distinct.
    rb = (
        right.withColumn(
            "__dx", F.explode(F.sequence(F.lit(-1), F.lit(1)))
        )
        .withColumn("__dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("__cx", F.floor(F.col(rx) / radius) + F.col("__dx"))
        .withColumn("__cy", F.floor(F.col(ry) / radius) + F.col("__dy"))
        .drop("__dx", "__dy")
    )
    dist2 = (lb[lx] - rb[rx]) ** 2 + (lb[ly] - rb[ry]) ** 2
    cond = (
        (lb["__cx"] == rb["__cx"])
        & (lb["__cy"] == rb["__cy"])
        & (dist2 <= F.lit(float(radius) ** 2))
    )
    out = lb.join(rb, cond, how)
    return out.drop("__cx", "__cy")


def distance_semi_filter(
    points: DataFrame,
    anchors: DataFrame,
    point_xy: tuple[str, str],
    anchor_xy: tuple[str, str],
    radius: float,
    keep_near: bool = True,
) -> DataFrame:
    """Keep points within (or beyond) ``radius`` of ANY anchor —
    the geofence filter, as a semi/anti grid join. Output schema is
    exactly ``points``; no anchor columns, no duplicate points."""
    how = "left_semi" if keep_near else "left_anti"
    return grid_distance_join(
        points, anchors, point_xy, anchor_xy, radius, how=how
    )


def dbscan(
    points: DataFrame,
    id_col: str,
    xy: tuple[str, str],
    eps: float,
    min_pts: int,
    max_iterations: int = 20,
) -> DataFrame:
    """DBSCAN density clustering, fully relational — the composition
    the grid join exists for.

    1. Neighbor pairs within ``eps`` via ``grid_distance_join`` (the
       point itself counts as its own neighbor, standard DBSCAN);
    2. core points = ``>= min_pts`` neighbors (one combinable count);
    3. clusters = connected components over core-core edges
       (operators/graph.py min-label propagation — deterministic
       labels: the min core id of the cluster);
    4. border points attach to the min cluster label among their core
       neighbors (deterministic tie-break where classic DBSCAN is
       arbitrary); everything else is noise.

    Returns (id_col, cluster, role) with cluster NULL for noise and
    role in ('core', 'border', 'noise') — total over the input.

    Scale: neighbor generation is the grid equi-join (density-bounded,
    no BNLJ); the CC iteration count is bounded by cluster diameter in
    graph hops, and every other step is a combinable aggregate or a
    key join. The classic single-machine DBSCAN is O(n^2) or needs an
    R-tree; this is the MR-DBSCAN-family formulation.
    """
    from pipeline_dataengineer_spark.operators.graph import (
        connected_components,
    )

    x, y = xy
    pts = points.select(
        F.col(id_col).alias("__pid"), F.col(x).alias("__px"), F.col(y).alias("__py")
    )
    a = pts.select(
        F.col("__pid").alias("id_a"),
        F.col("__px").alias("__ax"),
        F.col("__py").alias("__ay"),
    )
    b = pts.select(
        F.col("__pid").alias("id_b"),
        F.col("__px").alias("__bx"),
        F.col("__py").alias("__by"),
    )
    pairs = grid_distance_join(
        a, b, ("__ax", "__ay"), ("__bx", "__by"), eps
    ).select("id_a", "id_b")
    pairs = pairs.localCheckpoint()  # reused 3x below; cut the grid-join plan

    core = (
        pairs.groupBy("id_a")
        .agg(F.count(F.lit(1)).alias("__deg"))
        .filter(F.col("__deg") >= min_pts)
        .select(F.col("id_a").alias("__cid"))
    )
    core_edges = (
        pairs.filter(F.col("id_a") < F.col("id_b"))
        .join(core.withColumnRenamed("__cid", "id_a"), "id_a")
        .join(core.withColumnRenamed("__cid", "id_b"), "id_b")
    )
    # singleton cores (no core neighbor) still form their own cluster:
    # union self-loops so every core node enters the component table
    comp = connected_components(
        core_edges.select("id_a", "id_b").union(
            core.select(
                F.col("__cid").alias("id_a"), F.col("__cid").alias("id_b")
            )
        ),
        max_iterations=max_iterations,
    )  # (node, component)

    core_lab = comp.select(
        F.col("node").alias("__pid"), F.col("component").alias("__cluster")
    )
    # border: non-core with >= 1 core neighbor — min core-cluster label
    border_lab = (
        pairs.join(
            core_lab.withColumnRenamed("__pid", "id_b").withColumnRenamed(
                "__cluster", "__nblab"
            ),
            "id_b",
        )
        .join(core_lab.withColumnRenamed("__pid", "id_a"), "id_a", "left_anti")
        .groupBy("id_a")
        .agg(F.min("__nblab").alias("__cluster"))
        .withColumnRenamed("id_a", "__pid")
    )
    labels = core_lab.withColumn("role", F.lit("core")).union(
        border_lab.withColumn("role", F.lit("border"))
    )
    return (
        pts.select("__pid")
        .join(labels, "__pid", "left")
        .select(
            F.col("__pid").alias(id_col),
            F.col("__cluster").alias("cluster"),
            F.coalesce(F.col("role"), F.lit("noise")).alias("role"),
        )
    )


# ------------------------------------------------------------------
# Great-circle (haversine) variant — lat/lon degrees, radius in km.
# ------------------------------------------------------------------

_EARTH_R_KM = 6371.0088
_KM_PER_DEG = 111.19492664455873  # _EARTH_R_KM * pi / 180


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km between two (lat, lon) degree
    pairs, as a codegen column expression (no UDF)."""
    import math

    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2) - F.radians(lat1)
    dlmb = F.radians(lon2) - F.radians(lon1)
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(p1) * F.cos(p2) * F.sin(dlmb / 2) * F.sin(dlmb / 2)
    )
    return F.lit(2.0 * _EARTH_R_KM) * F.asin(F.sqrt(a))


def haversine_join(
    left: DataFrame,
    right: DataFrame,
    left_ll: tuple[str, str],
    right_ll: tuple[str, str],
    radius_km: float,
    max_abs_lat: float = 70.0,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs within great-circle ``radius_km``.

    Same complete-and-duplicate-free grid scheme as
    ``grid_distance_join`` but with per-axis cell widths in degrees:
    height = radius / km-per-degree-latitude (an exact bound), width
    = radius / (km-per-degree * cos(max_abs_lat)) — the worst-case
    longitude shrink over the data's latitude range. ``max_abs_lat``
    is a declared data bound (default 70°): points poleward of it can
    silently miss pairs, so the caller owns the promise — the same
    contract a fixed-grid spatial index (S2/geohash level choice)
    imposes. The exact haversine residual on candidates makes the
    bucketing invisible to the result.

    At 100 TB this is the same story as the Euclidean join: shuffle
    key = grid cell, urban-core hot cells are ordinary AQE-splittable
    skew, and the 9x right-side explode is a constant.
    """
    import math

    llat, llon = left_ll
    rlat, rlon = right_ll
    h_deg = radius_km / _KM_PER_DEG
    w_deg = radius_km / (
        _KM_PER_DEG * math.cos(math.radians(max_abs_lat))
    )
    lb = left.withColumn(
        "__cy", F.floor(F.col(llat) / h_deg)
    ).withColumn("__cx", F.floor(F.col(llon) / w_deg))
    rb = (
        right.withColumn(
            "__dx", F.explode(F.sequence(F.lit(-1), F.lit(1)))
        )
        .withColumn("__dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("__cy", F.floor(F.col(rlat) / h_deg) + F.col("__dy"))
        .withColumn("__cx", F.floor(F.col(rlon) / w_deg) + F.col("__dx"))
        .drop("__dx", "__dy")
    )
    d = haversine_km(lb[llat], lb[llon], rb[rlat], rb[rlon])
    cond = (
        (lb["__cx"] == rb["__cx"])
        & (lb["__cy"] == rb["__cy"])
        & (d <= F.lit(float(radius_km)))
    )
    return lb.join(rb, cond, how).drop("__cx", "__cy")


_GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash(lat: Column | str, lng: Column | str, precision: int = 6) -> Column:
    """Standard geohash cell id (base32, ``precision`` chars) as a
    PURE CODEGEN expression — quantize lat/lng, interleave bits
    longitude-first from the MSB, map 5-bit groups through the
    geohash alphabet. No UDF, no shuffle: the classic spatial
    bucketing/join key (neighboring points share prefixes), the
    string-keyed sibling of ``layout.zvalue``'s integer Morton code.
    Precision 6 ≈ 1.2 km × 0.6 km cells."""
    if not (1 <= precision <= 12):
        raise ValueError("precision must be in [1, 12]")
    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lng) if isinstance(lng, str) else lng
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lon_q = F.floor((lo + 180.0) / 360.0 * (1 << nlon)).cast("long")
    lat_q = F.floor((la + 90.0) / 180.0 * (1 << nlat)).cast("long")
    # clamp the degenerate upper boundary (lat=90 / lng=180)
    lon_q = F.least(lon_q, F.lit((1 << nlon) - 1))
    lat_q = F.least(lat_q, F.lit((1 << nlat) - 1))
    # interleave MSB-first: even positions (0,2,...) take lon bits
    # from its MSB down, odd positions take lat bits
    terms = []
    for i in range(nbits):
        if i % 2 == 0:
            src_bit = nlon - 1 - (i // 2)
            src = F.shiftright(lon_q, src_bit).bitwiseAND(F.lit(1))
        else:
            src_bit = nlat - 1 - (i // 2)
            src = F.shiftright(lat_q, src_bit).bitwiseAND(F.lit(1))
        terms.append(F.shiftleft(src, nbits - 1 - i))
    code = terms[0]
    for t in terms[1:]:
        code = code.bitwiseOR(t)
    chars = [
        F.substring(
            F.lit(_GEOHASH_ALPHABET),
            (
                F.shiftright(code, 5 * (precision - 1 - g)).bitwiseAND(
                    F.lit(31)
                )
                + 1
            ).cast("int"),
            1,
        )
        for g in range(precision)
    ]
    return F.concat(*chars)


def point_in_polygon_join(
    points: DataFrame,
    x_col: str,
    y_col: str,
    polygons: list[tuple[str, list[tuple[float, float]]]],
    how: str = "inner",
) -> DataFrame:
    """Tag each point with the (simple, possibly concave) polygons
    containing it — geofencing, zone attribution, service-area
    rollups. ``polygons`` is a small driver-side list of
    ``(name, [(x, y), ...])`` rings (closing edge implied; a few
    thousand zones is the intended regime — city districts, DMAs).

    Algorithm: even-odd ray casting. For each edge (x1,y1)-(x2,y2)
    that straddles the point's y, flip parity when the point lies
    left of the edge — tested with the division-free cross product
    ``cross = (x2-x1)*(py-y1) - (px-x1)*(y2-y1)`` (sign flipped for
    downward edges). Equivalent to the classic PNPOLY
    ``px < (x2-x1)*(py-y1)/(y2-y1)+x1`` but with no division: Spark's
    vectorized eval does not short-circuit the straddle guard, and a
    horizontal edge would make the quotient raise under ANSI. Points
    exactly on an edge follow the test's half-open convention.

    Plan shape: the polygon table (name, min/max bbox, edge array) is
    a broadcast literal; candidates are pruned by the codegen bbox
    test BEFORE the edge fold, and the fold itself is
    ``F.aggregate`` over the edge structs — pure Catalyst
    higher-order expressions, no UDF, no shuffle of the points at
    all. Cost per point = bbox compares + edges-of-matching-bboxes;
    at 100 TB the points stream map-side while the zone table rides
    the broadcast."""
    from pyspark.sql import functions as F

    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    spark = points.sparkSession
    rows = []
    for name, ring in polygons:
        if len(ring) < 3:
            raise ValueError(f"polygon {name!r} needs >= 3 vertices")
        edges = [
            {
                "x1": float(ring[i][0]),
                "y1": float(ring[i][1]),
                "x2": float(ring[(i + 1) % len(ring)][0]),
                "y2": float(ring[(i + 1) % len(ring)][1]),
            }
            for i in range(len(ring))
        ]
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        rows.append(
            (name, min(xs), max(xs), min(ys), max(ys), edges)
        )
    poly = spark.createDataFrame(
        rows,
        "zone string, xmin double, xmax double, ymin double, "
        "ymax double, edges array<struct<x1:double,y1:double,"
        "x2:double,y2:double>>",
    )
    px, py = F.col(x_col), F.col(y_col)
    bbox = (
        (px >= F.col("xmin"))
        & (px <= F.col("xmax"))
        & (py >= F.col("ymin"))
        & (py <= F.col("ymax"))
    )
    def _flip(acc, e):
        cross = (e["x2"] - e["x1"]) * (py - e["y1"]) - (px - e["x1"]) * (
            e["y2"] - e["y1"]
        )
        left_of_edge = F.when(e["y2"] > e["y1"], cross > 0).otherwise(
            cross < 0
        )
        straddles = (e["y1"] > py) != (e["y2"] > py)
        return F.when(straddles & left_of_edge, ~acc).otherwise(acc)

    inside = F.aggregate(F.col("edges"), F.lit(False), _flip)
    j = points.join(F.broadcast(poly), bbox & inside, how)
    return j.drop("xmin", "xmax", "ymin", "ymax", "edges")
