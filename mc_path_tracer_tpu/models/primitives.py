"""Procedural mesh primitives (spheres, cubes, planes) used by tests,
benchmarks and the material-preview scene.

The reference ships these as .glb assets (models/sphere.glb, Cube.glb,
mat_preview.glb); generating them procedurally keeps the framework
self-contained while the GLB loader covers on-disk assets.
"""

from __future__ import annotations

import numpy as np


def uv_sphere(radius=1.0, center=(0, 0, 0), rings=32, segments=64):
    """Returns (positions [V,3], normals [V,3], uvs [V,2], indices [F,3])."""
    c = np.asarray(center, np.float32)
    vs, ns, uv = [], [], []
    for i in range(rings + 1):
        theta = np.pi * i / rings
        for j in range(segments + 1):
            phi = 2 * np.pi * j / segments
            n = np.array(
                [np.sin(theta) * np.cos(phi), np.cos(theta), np.sin(theta) * np.sin(phi)],
                np.float32,
            )
            vs.append(c + radius * n)
            ns.append(n)
            uv.append([j / segments, i / rings])
    idx = []
    stride = segments + 1
    for i in range(rings):
        for j in range(segments):
            a = i * stride + j
            b = a + stride
            # CCW winding for outward faces under backface culling
            idx.append([a, a + 1, b])
            idx.append([a + 1, b + 1, b])
    return (
        np.asarray(vs, np.float32),
        np.asarray(ns, np.float32),
        np.asarray(uv, np.float32),
        np.asarray(idx, np.int64),
    )


def box(size=(1, 1, 1), center=(0, 0, 0)):
    """Axis-aligned box with outward faces (per-face normals)."""
    sx, sy, sz = [s / 2 for s in size]
    c = np.asarray(center, np.float32)
    faces = [
        # (normal, corner offsets in CCW order seen from outside)
        ((1, 0, 0), [(sx, -sy, -sz), (sx, sy, -sz), (sx, sy, sz), (sx, -sy, sz)]),
        ((-1, 0, 0), [(-sx, -sy, sz), (-sx, sy, sz), (-sx, sy, -sz), (-sx, -sy, -sz)]),
        ((0, 1, 0), [(-sx, sy, -sz), (-sx, sy, sz), (sx, sy, sz), (sx, sy, -sz)]),
        ((0, -1, 0), [(-sx, -sy, sz), (-sx, -sy, -sz), (sx, -sy, -sz), (sx, -sy, sz)]),
        ((0, 0, 1), [(-sx, -sy, sz), (sx, -sy, sz), (sx, sy, sz), (-sx, sy, sz)]),
        ((0, 0, -1), [(sx, -sy, -sz), (-sx, -sy, -sz), (-sx, sy, -sz), (sx, sy, -sz)]),
    ]
    vs, ns, uvs, idx = [], [], [], []
    for n, corners in faces:
        base = len(vs)
        for k, p in enumerate(corners):
            vs.append(c + np.asarray(p, np.float32))
            ns.append(np.asarray(n, np.float32))
            uvs.append([float(k in (1, 2)), float(k in (2, 3))])
        idx.append([base, base + 1, base + 2])
        idx.append([base, base + 2, base + 3])
    return (
        np.asarray(vs, np.float32),
        np.asarray(ns, np.float32),
        np.asarray(uvs, np.float32),
        np.asarray(idx, np.int64),
    )


def plane(size=20.0, center=(0, 0, 0), normal_axis="y"):
    """Two-triangle quad facing +axis."""
    h = size / 2
    c = np.asarray(center, np.float32)
    if normal_axis == "y":
        p = np.array(
            [[-h, 0, -h], [h, 0, -h], [h, 0, h], [-h, 0, h]], np.float32
        ) + c
        n = np.tile([[0, 1, 0]], (4, 1)).astype(np.float32)
        idx = np.array([[0, 2, 1], [0, 3, 2]], np.int64)
    elif normal_axis == "z":
        p = np.array(
            [[-h, -h, 0], [h, -h, 0], [h, h, 0], [-h, h, 0]], np.float32
        ) + c
        n = np.tile([[0, 0, 1]], (4, 1)).astype(np.float32)
        idx = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    else:
        raise ValueError(normal_axis)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    return p, n, uv, idx
