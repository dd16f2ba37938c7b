"""BVH construction front-end: native C++ builders with a numpy fallback.

Replaces the reference's host SAH build + thrust reorder pipeline
(Scene.cu:400-469, BVH.cu:53-334) with: per-triangle world bounds -> native
builder (SAH/Middle/EqualCounts/LBVH, native/bvh.cpp) -> threaded depth-first
node arrays + triangle reorder, consumed by ops/intersect.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mc_path_tracer_tpu.ops.intersect import BVHArrays, TriangleSoA, pack_bvh
from mc_path_tracer_tpu.utils import native


def triangle_bounds(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray):
    """World AABBs per triangle (reference init_BVH_triangle_info,
    mesh_initialization_kernels.cu:63-94)."""
    v1 = v0 + e1
    v2 = v0 + e2
    bmin = np.minimum(np.minimum(v0, v1), v2)
    bmax = np.maximum(np.maximum(v0, v1), v2)
    return bmin, bmax


def _numpy_build(bmin, bmax, max_leaf):
    """Median (EqualCounts) recursive fallback builder in pure numpy."""
    n = bmin.shape[0]
    centroid = 0.5 * (bmin + bmax)
    nodes = []  # dicts: bmin,bmax,first,count, subtree (filled after)
    ordered: list[int] = []

    def build(idx: np.ndarray):
        node_bmin = bmin[idx].min(axis=0)
        node_bmax = bmax[idx].max(axis=0)
        me = len(nodes)
        nodes.append(
            {"bmin": node_bmin, "bmax": node_bmax, "first": 0, "count": 0, "size": 1}
        )
        if idx.shape[0] <= max_leaf:
            nodes[me]["first"] = len(ordered)
            nodes[me]["count"] = idx.shape[0]
            ordered.extend(idx.tolist())
            return me
        c = centroid[idx]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.argsort(c[:, axis], kind="stable")
        half = idx.shape[0] // 2
        l = build(idx[order[:half]])
        r = build(idx[order[half:]])
        nodes[me]["size"] = 1 + nodes[l]["size"] + nodes[r]["size"]
        return me

    build(np.arange(n))
    nn = len(nodes)
    out_bmin = np.stack([nd["bmin"] for nd in nodes]).astype(np.float32)
    out_bmax = np.stack([nd["bmax"] for nd in nodes]).astype(np.float32)
    first = np.array([nd["first"] for nd in nodes], np.int32)
    count = np.array([nd["count"] for nd in nodes], np.int32)
    skip = np.array([i + nd["size"] for i, nd in enumerate(nodes)], np.int32)
    assert nn <= 2 * n
    return out_bmin, out_bmax, first, count, skip, np.array(ordered, np.int32)


def _pack_attrs(n0, n1, n2, uv0, uv1, uv2, material_id,
                tan0=None, tan1=None, tan2=None) -> np.ndarray:
    """Per-triangle shading attributes in one gatherable row [T, 16]
    (n0 n1 n2 | uv0 uv1 uv2 | material_id), extended to [T, 28] with
    per-vertex xyzw tangents when present — row gathers cost the same for
    any width, so one wide gather replaces many narrow ones."""
    cols = [
        np.asarray(n0, np.float32),
        np.asarray(n1, np.float32),
        np.asarray(n2, np.float32),
        np.asarray(uv0, np.float32),
        np.asarray(uv1, np.float32),
        np.asarray(uv2, np.float32),
        np.asarray(material_id, np.float32)[:, None],
    ]
    if tan0 is not None:
        cols += [
            np.asarray(tan0, np.float32),
            np.asarray(tan1, np.float32),
            np.asarray(tan2, np.float32),
        ]
    return np.concatenate(cols, axis=1)


def _build_binary(tris: TriangleSoA, max_leaf: int, method: int):
    """Shared host build: native/numpy binary BVH + numpy-reordered columns."""
    v0 = np.asarray(tris.v0, np.float32)
    e1 = np.asarray(tris.e1, np.float32)
    e2 = np.asarray(tris.e2, np.float32)
    bmin, bmax = triangle_bounds(v0, e1, e2)

    result = native.bvh_build_native(bmin, bmax, max_leaf=max_leaf, method=method)
    if result is None:
        result = _numpy_build(bmin, bmax, max_leaf)
    nb_min, nb_max, first, count, skip, order = result

    names = [
        "v0", "e1", "e2", "n0", "n1", "n2",
        "uv0", "uv1", "uv2", "material_id", "face_normal",
    ]
    if tris.tan0 is not None:
        names += ["tan0", "tan1", "tan2"]
    cols = {name: np.asarray(getattr(tris, name))[order] for name in names}
    attrs = _pack_attrs(
        cols["n0"], cols["n1"], cols["n2"],
        cols["uv0"], cols["uv1"], cols["uv2"], cols["material_id"],
        cols.get("tan0"), cols.get("tan1"), cols.get("tan2"),
    )
    new_tris = TriangleSoA(
        **{k: jnp.asarray(v) for k, v in cols.items()},
        attrs=jnp.asarray(attrs),
    )
    return (nb_min, nb_max, first, count, skip), cols, new_tris


def _binary_arrays(nodes, max_leaf: int) -> BVHArrays:
    nb_min, nb_max, first, count, skip = nodes
    assert max_leaf <= 15, "packed node meta reserves 4 bits for leaf count"
    # packed node table assembled host-side (numpy bit views), one transfer
    meta = (first.astype(np.int32) * 16 + count.astype(np.int32)).view(np.float32)
    packed = np.concatenate(
        [
            nb_min.astype(np.float32),
            nb_max.astype(np.float32),
            meta[:, None],
            skip.astype(np.int32).view(np.float32)[:, None],
        ],
        axis=1,
    )
    return BVHArrays(
        bmin=jnp.asarray(nb_min),
        bmax=jnp.asarray(nb_max),
        first=jnp.asarray(first),
        count=jnp.asarray(count),
        skip=jnp.asarray(skip),
        packed=jnp.asarray(packed),
    )


def build_bvh(
    tris: TriangleSoA, max_leaf: int = 4, method: int = native.SAH
) -> tuple[BVHArrays, TriangleSoA]:
    """Build the acceleration structure and reorder triangles by leaf order
    (the thrust::gather step of Scene.cu:459-469).

    Returns (bvh, reordered_tris); `method` is one of utils.native.{SAH,
    MIDDLE, EQUAL_COUNTS, LBVH}.
    """
    nodes, _, new_tris = _build_binary(tris, max_leaf, method)
    return _binary_arrays(nodes, max_leaf), new_tris


def build_accel(
    tris: TriangleSoA, max_leaf: int = 4, method: int = native.SAH
):
    """Full accelerator build: binary threaded BVH + the wide (16-ary,
    inline-leaf) row table used by the TPU traversal (ops/wide_bvh.py).

    Returns (bvh, wide, reordered_tris).
    """
    from mc_path_tracer_tpu.ops.wide_bvh import build_wide

    nodes, cols, new_tris = _build_binary(tris, max_leaf, method)
    nb_min, nb_max, first, count, skip = nodes
    wide = build_wide(
        nb_min, nb_max, first, count, skip,
        cols["v0"], cols["e1"], cols["e2"],
    )
    return _binary_arrays(nodes, max_leaf), wide, new_tris
