"""Oriented 3D box geometry: headings, corners, params, IoU, containment.

Conventions (identical to the reference):
* Heading is rotation about +Y (up). ``head2rot`` builds R with rows
  [[cos,0,-sin],[0,1,0],[sin,0,cos]] (reference utils/pc_utils.py:51-67);
  ``rot2head`` = atan2(-R[0,2], R[0,0]) (pc_utils.py:34-48).
* Corners: vectors = diag(size/2) @ R; the 8 corners are center ± v0 ± v1 ± v2
  in the sign order of utils/tools.py:get_box_corners (0:---, 1:+--, 2:++-,
  3:-+-, 4:--+, 5:+-+, 6:+++, 7:-++).
* Oriented IoU = BEV polygon-intersection area x vertical overlap, matching
  net_utils/box_util.py:90-118 — but vectorized: a fixed-size
  Sutherland–Hodgman clip of one rectangle by the other's 4 edges (a convex
  quad clipped by a convex quad has at most 8 vertices), batched over
  arbitrary leading dims.  Works under both numpy (host AP eval) and jax.numpy
  (on-device eval) via the ``xp`` module argument.

All functions take numpy or jax arrays; pure-shape code paths only.
"""

import numpy as np

try:
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None

_CORNER_SIGNS = np.array(
    [
        [-1, -1, -1],
        [+1, -1, -1],
        [+1, +1, -1],
        [-1, +1, -1],
        [-1, -1, +1],
        [+1, -1, +1],
        [+1, +1, +1],
        [-1, +1, +1],
    ],
    dtype=np.float32,
)  # (8, 3) multipliers for (v0, v1, v2)


def _np_of(x):
    return jnp if (jnp is not None and not isinstance(x, (np.ndarray, float, int, list))) else np


def head2rot(heading, xp=None):
    """heading (...,) -> R (..., 3, 3), rotation about +Y."""
    xp = xp or _np_of(heading)
    heading = xp.asarray(heading)
    c, s = xp.cos(heading), xp.sin(heading)
    zeros = xp.zeros_like(c)
    ones = xp.ones_like(c)
    row0 = xp.stack([c, zeros, -s], axis=-1)
    row1 = xp.stack([zeros, ones, zeros], axis=-1)
    row2 = xp.stack([s, zeros, c], axis=-1)
    return xp.stack([row0, row1, row2], axis=-2)


def rot2head(R_mat, xp=None):
    """R (..., 3, 3) -> heading (...,)."""
    xp = xp or _np_of(R_mat)
    R_mat = xp.asarray(R_mat)
    return xp.arctan2(-R_mat[..., 0, 2], R_mat[..., 0, 0])


def box_corners_from_params(center, size, heading, xp=None):
    """center (...,3), size (...,3) [FULL extents], heading (...) -> (...,8,3).

    Same corner order as the reference's get_3d_box.
    """
    xp = xp or _np_of(center)
    R = head2rot(heading, xp=xp)  # (...,3,3)
    vectors = (size[..., :, None] / 2.0) * R  # diag(size/2) @ R -> (...,3,3)
    signs = xp.asarray(_CORNER_SIGNS)  # (8,3)
    offsets = xp.einsum("kv,...vc->...kc", signs, vectors)
    return center[..., None, :] + offsets


def get_3d_box(box_size, heading_angle, center):
    """Single-box host helper with the reference's signature (pc_utils.py:22)."""
    return np.asarray(
        box_corners_from_params(
            np.asarray(center, dtype=np.float64),
            np.asarray(box_size, dtype=np.float64),
            np.asarray(heading_angle, dtype=np.float64),
            xp=np,
        )
    )


def corners2params(corners, xp=None):
    """corners (...,8,3) -> (size (...,3), R (...,3,3), center (...,3)).

    Mirrors net_utils/box_util.py:174-205 including the right-hand-system
    sign fixups.
    """
    xp = xp or _np_of(corners)
    corners = xp.asarray(corners)
    center = (xp.max(corners, axis=-2) + xp.min(corners, axis=-2)) / 2.0
    v0 = (corners[..., 1, :] - corners[..., 0, :]) / 2.0
    v1 = (corners[..., 2, :] - corners[..., 1, :]) / 2.0
    v2 = (corners[..., 4, :] - corners[..., 0, :]) / 2.0
    vectors = xp.stack([v0, v1, v2], axis=-2)  # (...,3,3)
    half = xp.linalg.norm(vectors, axis=-1)  # (...,3)
    box_size = half * 2.0
    R = vectors / xp.maximum(half[..., None], 1e-12)
    # up vector points up
    yflip = xp.where(R[..., 1, 1] < 0, -1.0, 1.0)
    R = R * xp.stack([xp.ones_like(yflip), yflip, xp.ones_like(yflip)], axis=-1)[..., None]
    # right-handed
    zdot = xp.sum(xp.cross(R[..., 0, :], R[..., 1, :]) * R[..., 2, :], axis=-1)
    zflip = xp.where(zdot < 0, -1.0, 1.0)
    R = R * xp.stack([xp.ones_like(zflip), xp.ones_like(zflip), zflip], axis=-1)[..., None]
    return box_size, R, center


def points_in_obb(points, center, size, heading, margin=0.0, xp=None):
    """Containment test of points inside an oriented box inflated by margin.

    Replaces the reference's Delaunay-hull ``in_hull`` (pc_utils.py:17-21)
    with the exact OBB test: rotate into the box frame, compare to
    half-extents.  For a box, the two are equivalent.

    Args:
        points: (..., N, 3); center (..., 3); size (..., 3) full extents;
        heading (...); margin adds to each half extent (contact_dist_thresh).
    Returns:
        bool (..., N).
    """
    xp = xp or _np_of(points)
    R = head2rot(heading, xp=xp)  # rows are box axes
    rel = points - center[..., None, :]  # (...,N,3)
    # local coords: project onto axes -> rel @ R^T
    local = xp.einsum("...nc,...vc->...nv", rel, R)
    half = size / 2.0 + margin
    return xp.all(xp.abs(local) <= half[..., None, :], axis=-1)


# ---------------------------------------------------------------------------
# IoU
# ---------------------------------------------------------------------------

def box3d_iou_aabb(minmax_a, minmax_b, xp=None):
    """Axis-aligned IoU between box sets.

    minmax_a: (..., A, 6) as (xmin,ymin,zmin,xmax,ymax,zmax); minmax_b (..., B, 6).
    Returns (..., A, B).
    """
    xp = xp or _np_of(minmax_a)
    lo = xp.maximum(minmax_a[..., :, None, 0:3], minmax_b[..., None, :, 0:3])
    hi = xp.minimum(minmax_a[..., :, None, 3:6], minmax_b[..., None, :, 3:6])
    inter = xp.prod(xp.maximum(hi - lo, 0.0), axis=-1)
    vol_a = xp.prod(minmax_a[..., :, 3:6] - minmax_a[..., :, 0:3], axis=-1)
    vol_b = xp.prod(minmax_b[..., :, 3:6] - minmax_b[..., :, 0:3], axis=-1)
    union = vol_a[..., :, None] + vol_b[..., None, :] - inter
    return inter / xp.maximum(union, 1e-12)


def _bev_rect(corners, xp):
    """Extract the CCW BEV rectangle used by the reference clipper.

    Reference box3d_iou reorders corners to [7,6,2,3,...] then takes the
    (x,z) of the first four in reversed order (box_util.py:100-104).
    """
    reord = corners[..., [7, 6, 2, 3], :]
    rect = reord[..., ::-1, :]  # rows 3,2,1,0
    return xp.stack([rect[..., 0], rect[..., 2]], axis=-1)  # (...,4,2)


def _clip_poly_by_edge(poly, valid, cp1, cp2, xp):
    """One Sutherland–Hodgman clip step on a padded polygon.

    poly: (..., P, 2) padded vertex buffer; valid: (..., P) bool;
    cp1, cp2: (..., 2) clip edge endpoints.  Returns (poly', valid') with
    P' = 2P (each input vertex contributes at most an intersection + itself).
    """
    n = poly.shape[-2]
    # previous valid vertex (cyclically) for each vertex: with valid vertices
    # packed at the front, the previous of vertex 0 is index count-1.
    count = xp.sum(valid, axis=-1, keepdims=True)  # (...,1)
    idx = xp.arange(n)
    prev_idx = xp.where(idx == 0, xp.maximum(count - 1, 0), idx - 1)  # (...,n)
    prev_idx = xp.broadcast_to(prev_idx, poly.shape[:-1])
    prev = xp.take_along_axis(poly, prev_idx[..., None], axis=-2)

    d = cp2 - cp1  # (...,2)

    def side(p):
        # >0 means inside (left of edge cp1->cp2); matches reference `inside`
        return d[..., 0:1] * (p[..., 1] - cp1[..., 1:2]) - d[..., 1:2] * (
            p[..., 0] - cp1[..., 0:1]
        )

    s_cur = side(poly)  # (...,P)
    s_prev = side(prev)
    cur_in = s_cur > 0
    prev_in = s_prev > 0

    # intersection of segment prev->cur with the clip line
    denom = s_prev - s_cur
    t = s_prev / xp.where(xp.abs(denom) < 1e-12, 1e-12, denom)
    inter = prev + t[..., None] * (poly - prev)

    # Each input vertex emits at most (a) the crossing intersection, then
    # (b) itself if inside — interleaved to preserve cyclic order:
    # (inter_0, v_0, inter_1, v_1, ...).
    emit_inter = valid & (cur_in ^ prev_in)
    emit_vert = valid & cur_in
    interleave = xp.stack([inter, poly], axis=-2)  # (...,P,2,2)
    interleave = interleave.reshape(poly.shape[:-2] + (2 * n, 2))
    ok_inter = xp.stack([emit_inter, emit_vert], axis=-1).reshape(valid.shape[:-1] + (2 * n,))
    return interleave, ok_inter


def _compact(poly, valid, out_n, xp):
    """Pack valid vertices to the front, keeping order; pad to out_n."""
    key = xp.where(valid, 0, 1)
    if xp is np:
        order = np.argsort(key, axis=-1, kind="stable")
    else:
        order = xp.argsort(key, axis=-1, stable=True)
    poly_sorted = xp.take_along_axis(poly, order[..., None], axis=-2)
    valid_sorted = xp.take_along_axis(valid, order, axis=-1)
    return poly_sorted[..., :out_n, :], valid_sorted[..., :out_n]


def _shoelace(poly, valid, xp):
    """Area of padded polygon (valid vertices packed at front, in order)."""
    count = xp.sum(valid, axis=-1, keepdims=True)
    n = poly.shape[-2]
    idx = xp.arange(n)
    nxt = xp.where(idx + 1 >= count, 0, idx + 1)  # (...,n)
    nxt = xp.broadcast_to(nxt, poly.shape[:-1])
    pn = xp.take_along_axis(poly, nxt[..., None], axis=-2)
    cross = poly[..., 0] * pn[..., 1] - pn[..., 0] * poly[..., 1]
    cross = xp.where(valid, cross, 0.0)
    return 0.5 * xp.abs(xp.sum(cross, axis=-1))


def convex_quad_intersection_area(rect1, rect2, xp=None):
    """Intersection area of two convex quads (...,4,2), CCW order, batched.

    Leading dims of rect1/rect2 broadcast against each other.
    """
    xp = xp or _np_of(rect1)
    lead = tuple(np.broadcast_shapes(rect1.shape[:-2], rect2.shape[:-2]))
    rect1 = xp.broadcast_to(rect1, lead + rect1.shape[-2:])
    rect2 = xp.broadcast_to(rect2, lead + rect2.shape[-2:])
    P = 8  # max vertices of quad∩quad
    poly = xp.concatenate(
        [rect1, xp.zeros(lead + (P - 4, 2), dtype=rect1.dtype)], axis=-2
    )
    valid = xp.concatenate(
        [
            xp.ones(lead + (4,), dtype=bool),
            xp.zeros(lead + (P - 4,), dtype=bool),
        ],
        axis=-1,
    )
    for e in range(4):
        cp1 = rect2[..., e - 1, :]
        cp2 = rect2[..., e, :]
        poly2, valid2 = _clip_poly_by_edge(poly, valid, cp1, cp2, xp)
        poly, valid = _compact(poly2, valid2, P, xp)
    return _shoelace(poly, valid, xp)


def box3d_iou_oriented(corners1, corners2, xp=None):
    """Oriented 3D IoU between corner sets, batched over leading dims.

    corners1 (..., 8, 3) vs corners2 (..., 8, 3) (shapes must broadcast).
    Returns (iou3d, iou2d_bev) matching net_utils/box_util.py:90-118.
    """
    xp = xp or _np_of(corners1)
    corners1 = xp.asarray(corners1)
    corners2 = xp.asarray(corners2)
    rect1 = _bev_rect(corners1, xp)
    rect2 = _bev_rect(corners2, xp)
    area1 = _shoelace(rect1, xp.ones(rect1.shape[:-1], dtype=bool), xp)
    area2 = _shoelace(rect2, xp.ones(rect2.shape[:-1], dtype=bool), xp)
    inter_area = convex_quad_intersection_area(rect1, rect2, xp=xp)
    iou_2d = inter_area / xp.maximum(area1 + area2 - inter_area, 1e-12)

    # vertical overlap: corner order after the reference reorder puts a top
    # corner at slot 0 (orig 7) and a bottom corner at slot 4 (orig 4)
    ymax = xp.minimum(corners1[..., 7, 1], corners2[..., 7, 1])
    ymin = xp.maximum(corners1[..., 4, 1], corners2[..., 4, 1])
    inter_vol = inter_area * xp.maximum(ymax - ymin, 0.0)

    def vol(c):
        a = xp.linalg.norm(c[..., 0, :] - c[..., 1, :], axis=-1)
        b = xp.linalg.norm(c[..., 1, :] - c[..., 2, :], axis=-1)
        h = xp.linalg.norm(c[..., 0, :] - c[..., 4, :], axis=-1)
        return a * b * h

    vol1, vol2 = vol(corners1), vol(corners2)
    iou = inter_vol / xp.maximum(vol1 + vol2 - inter_vol, 1e-12)
    return iou, iou_2d
