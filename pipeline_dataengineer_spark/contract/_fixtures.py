"""Literal fixtures shared between contract queries and their DuckDB
oracles (both sides must see byte-identical constants)."""

# q_point_in_polygon: three disjoint zones on the synthetic plane
# px = custkey % 97, py = custkey % 89 (so [0,96] x [0,88]); the
# C-shape is concave to force the ray-cast parity path.
PIP_POLYGONS = [
    ("tri", [(5.0, 5.0), (45.0, 8.0), (20.0, 40.0)]),
    (
        "cshape",
        [
            (50.0, 10.0), (90.0, 10.0), (90.0, 22.0), (62.0, 22.0),
            (62.0, 46.0), (90.0, 46.0), (90.0, 58.0), (50.0, 58.0),
        ],
    ),
    ("diamond", [(20.0, 50.0), (40.0, 68.0), (20.0, 86.0), (0.0, 68.0)]),
]
