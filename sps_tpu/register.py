"""On-device scan-to-map registration (point-to-plane ICP, Gauss-Newton).

TPU-native replacement for the external C++ localization stack the
reference drives (hdl_localization / ndt_omp / fast_gicp, cloned and
launched at /root/reference/exp_pipeline/loc_exp_general.bash:115-119,
consuming the filtered cloud): a GICP-style point-to-plane ICP where

  * correspondences come from the resident map's voxel hash (the same
    table the streaming filter uses) — constant-time, no KD-tree;
  * each map voxel carries a centroid + normal precomputed once from the
    per-voxel covariance (smallest eigenvector);
  * a fixed number of Gauss-Newton iterations on se(3) run inside
    jax.lax.fori_loop, so the whole localizer is one jitted function and
    the filter -> register loop never leaves HBM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sps_tpu.ops import hash as vhash
from sps_tpu.ops import voxelize as vox


class VoxelMap(NamedTuple):
    """Registration map: voxel hash + per-voxel centroid and normal.

    lut/lut_origin/lut_dims (optional): a dense AABB cell -> nearest-voxel
    LUT that replaces the 27-probe hash search of _correspond with ONE
    gather per point. The probing `vhash.lookup` runs XLA while-loops,
    which serialize on TPU (the same wall that motivated
    ops.radius.radius_join_dense); precomputing the 27-candidate argmin
    per CELL at build time moves all of it off the per-scan path. The
    candidate choice is by distance to the cell center instead of the
    point (≤ half-cell approximation; the Huber-weighted point-to-plane
    objective is insensitive at that scale — tests/test_register.py runs
    the same convergence suite over both paths)."""

    table: vhash.HashTable
    centroids: jnp.ndarray  # (V, 3)
    normals: jnp.ndarray  # (V, 3)
    num_voxels: jnp.ndarray  # ()
    voxel_size: float
    lut: jnp.ndarray | None = None  # (NC,) int32 nearest-voxel row
    lut_origin: jnp.ndarray | None = None  # (3,) int32 cell coord of lut[0]
    lut_dims: jnp.ndarray | None = None  # (3,) int32 cells per axis


# Dense-LUT budget: beyond this many cells (int32 LUT bytes = 4*NC) the
# map falls back to the probing-hash correspondence path.
_LUT_MAX_CELLS = 64_000_000


def _smallest_evec(cov: jnp.ndarray) -> jnp.ndarray:
    """Smallest eigenvector of symmetric PD (V, 3, 3) matrices via power
    iteration on the (scale-free) adjugate — adj(A) has eigenvalues
    det(A)/lambda_i, so its DOMINANT eigenvector is A's smallest.

    Replaces jnp.linalg.eigh: XLA:TPU's eigh lowering materializes
    (V, 2, 2) QR temporaries whose (8, 128) tile padding inflates 64x —
    2 GB per temp at a 2M-voxel registration map (measured OOM). The
    adjugate form is pure elementwise math. Surface voxels (the ones
    registration weights) have lambda_1 << lambda_2, so convergence is
    fast; isotropic voxels converge slowly to an arbitrary direction,
    exactly as meaningless as eigh's choice there."""
    a, b, c = cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2]
    d, e, f = cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]
    m11 = d * f - e * e
    m12 = c * e - b * f
    m13 = b * e - c * d
    m22 = a * f - c * c
    m23 = b * c - a * e
    m33 = a * d - b * b
    row0 = jnp.stack([m11, m12, m13], -1)
    row1 = jnp.stack([m12, m22, m23], -1)
    row2 = jnp.stack([m13, m23, m33], -1)
    # Scale-normalize per voxel (adjugate entries scale ~ cov^2, and
    # near-degenerate voxels under/overflow across 16 squaring-free but
    # repeated matvecs otherwise).
    s = jnp.maximum(
        jnp.max(
            jnp.stack([jnp.abs(row0), jnp.abs(row1), jnp.abs(row2)]), axis=(0, 2)
        ),
        1e-30,
    )[:, None]
    row0, row1, row2 = row0 / s, row1 / s, row2 / s
    v = jnp.full(row0.shape, 3.0**-0.5, cov.dtype)
    for _ in range(16):
        w = jnp.stack(
            [
                jnp.sum(row0 * v, -1),
                jnp.sum(row1 * v, -1),
                jnp.sum(row2 * v, -1),
            ],
            -1,
        )
        nrm = jnp.linalg.norm(w, axis=-1, keepdims=True)
        # Rank-deficient adjugate (isotropic/degenerate voxel): keep the
        # previous direction instead of dividing by ~0.
        v = jnp.where(nrm > 1e-20, w / jnp.maximum(nrm, 1e-30), v)
    return v


def build_voxel_map(map_points: np.ndarray, voxel_size: float,
                    capacity: int | None = None,
                    lut: bool = True) -> VoxelMap:
    """One-time map digest: centroid + covariance-normal per voxel."""
    m = len(map_points)
    if capacity is None:
        capacity = vhash.next_pow2(m)

    @jax.jit
    def build(points):
        coords = vox.quantize(points, voxel_size)
        grid, p2v, _ = vox.voxelize(
            coords,
            jnp.zeros((m,), jnp.int32),
            jnp.zeros((m,), jnp.int32),
            jnp.ones((m,), bool),
            num_time=1,
            voxel_capacity=capacity,
        )
        pv = jnp.where(p2v >= 0, p2v, capacity)
        cnt = jnp.zeros((capacity + 1,)).at[pv].add(1.0)[:capacity]
        s = jnp.zeros((capacity + 1, 3)).at[pv].add(points)[:capacity]
        cent = s / jnp.maximum(cnt[:, None], 1.0)
        # Covariance via E[xx^T] - mu mu^T, accumulated over 3x3 outer
        # products; neighbors in the same voxel only (0.1-0.4 m support).
        outer = points[:, :, None] * points[:, None, :]
        so = jnp.zeros((capacity + 1, 3, 3)).at[pv].add(outer)[:capacity]
        cov = so / jnp.maximum(cnt[:, None, None], 1.0) - cent[:, :, None] * cent[:, None, :]
        cov = cov + 1e-6 * jnp.eye(3)
        normal = _smallest_evec(cov)
        return grid.table, cent, normal, grid.num_voxels

    table, cent, normal, nvox = build(jnp.asarray(map_points, jnp.float32))
    vm = VoxelMap(table, cent, normal, nvox, voxel_size)

    if not lut:
        return vm
    cmin = np.floor(map_points.min(axis=0) / voxel_size).astype(np.int64) - 1
    cmax = np.floor(map_points.max(axis=0) / voxel_size).astype(np.int64) + 1
    dims = tuple(int(x) for x in (cmax - cmin + 1))
    nc = dims[0] * dims[1] * dims[2]
    if nc > _LUT_MAX_CELLS:
        return vm
    origin = np.asarray(cmin, np.int32)

    @jax.jit
    def build_lut(points, cent):
        coords = vox.quantize(points, voxel_size) - jnp.asarray(origin)
        flat = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
        rows = vhash.lookup(table, jnp.concatenate(
            [jnp.zeros((m, 1), jnp.int32), vox.quantize(points, voxel_size)],
            axis=-1), jnp.ones((m,), bool))
        rows_dense = (
            jnp.full((nc + 1,), vhash.EMPTY, jnp.int32)
            .at[jnp.clip(flat, 0, nc)]
            .max(rows, mode="drop")
        )[:nc]
        # Per cell: nearest candidate centroid (to the cell center) among
        # the 27 neighbor cells — precomputed so the per-scan search is
        # one gather.
        iota = jnp.arange(nc, dtype=jnp.int32)
        cx = iota // (dims[1] * dims[2])
        cy = (iota // dims[2]) % dims[1]
        cz = iota % dims[2]
        center = (
            (jnp.stack([cx, cy, cz], -1) + jnp.asarray(origin) + 0.5)
            * voxel_size
        )
        best_d2 = jnp.full((nc,), jnp.inf, jnp.float32)
        best_row = jnp.full((nc,), vhash.EMPTY, jnp.int32)
        rd_ext = jnp.concatenate([rows_dense, jnp.array([vhash.EMPTY], jnp.int32)])
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    nx_ = cx + dx
                    ny_ = cy + dy
                    nz_ = cz + dz
                    inb = (
                        (nx_ >= 0) & (nx_ < dims[0])
                        & (ny_ >= 0) & (ny_ < dims[1])
                        & (nz_ >= 0) & (nz_ < dims[2])
                    )
                    nf = (nx_ * dims[1] + ny_) * dims[2] + nz_
                    r = rd_ext[jnp.where(inb, nf, nc)]
                    c = cent[jnp.clip(r, 0)]
                    d2 = jnp.sum((c - center) ** 2, axis=-1)
                    d2 = jnp.where(r >= 0, d2, jnp.inf)
                    take = d2 < best_d2
                    best_d2 = jnp.where(take, d2, best_d2)
                    best_row = jnp.where(take, r, best_row)
        return best_row

    lut_arr = build_lut(jnp.asarray(map_points, jnp.float32), cent)
    return vm._replace(
        lut=lut_arr,
        lut_origin=jnp.asarray(origin),
        lut_dims=jnp.asarray(np.asarray(dims, np.int32)),
    )


def _exp_se3(delta: jnp.ndarray) -> jnp.ndarray:
    """se(3) exponential: delta = (omega[3], v[3]) -> 4x4 transform."""
    w, v = delta[:3], delta[3:]
    th = jnp.linalg.norm(w) + 1e-12
    k = w / th
    kx = jnp.array(
        [[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]]
    )
    s, c = jnp.sin(th), jnp.cos(th)
    r = jnp.eye(3) + s * kx + (1 - c) * (kx @ kx)
    vmat = (
        jnp.eye(3)
        + ((1 - c) / th) * kx
        + ((th - s) / th) * (kx @ kx)
    )
    tr = jnp.eye(4)
    tr = tr.at[:3, :3].set(r)
    tr = tr.at[:3, 3].set(vmat @ v)
    return tr


def _correspond(vmap: VoxelMap, p: jnp.ndarray, valid: jnp.ndarray):
    """Nearest map-voxel centroid among the 27 neighbor voxels of each
    point (pure voxel-containment makes escaping correspondences free,
    which lets point-to-plane slide along the ground plane).

    With a LUT (build_voxel_map(lut=True), the default) the search is one
    dense gather per point; otherwise 27 probing hash lookups (the
    original formulation — kept for out-of-budget maps)."""
    if vmap.lut is not None:
        c = vox.quantize(p, vmap.voxel_size) - vmap.lut_origin
        inb = jnp.all((c >= 0) & (c < vmap.lut_dims), axis=-1)
        nc = vmap.lut.shape[0]
        flat = (c[:, 0] * vmap.lut_dims[1] + c[:, 1]) * vmap.lut_dims[2] + c[:, 2]
        lut_ext = jnp.concatenate(
            [vmap.lut, jnp.array([vhash.EMPTY], jnp.int32)]
        )
        row = lut_ext[jnp.where(inb & valid, jnp.clip(flat, 0, nc), nc)]
        hit = (row >= 0) & valid
        safe_r = jnp.clip(row, 0)
        return vmap.centroids[safe_r], vmap.normals[safe_r], hit
    coords = vox.quantize(p, vmap.voxel_size)
    m = p.shape[0]
    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(-1, 2, dtype=jnp.int32)] * 3), indexing="ij"),
        axis=-1,
    ).reshape(27, 3)
    q = jnp.concatenate(
        [
            jnp.zeros((27, m, 1), jnp.int32),
            coords[None] + offs[:, None, :],
        ],
        axis=-1,
    ).reshape(27 * m, 4)
    qv = jnp.broadcast_to(valid[None], (27, m)).reshape(-1)
    rows = vhash.lookup(vmap.table, q, qv).reshape(27, m)
    safe = jnp.clip(rows, 0)
    cands = vmap.centroids[safe]  # (27, M, 3)
    d2 = jnp.sum((cands - p[None]) ** 2, axis=-1)
    d2 = jnp.where(rows >= 0, d2, jnp.inf)
    best = jnp.argmin(d2, axis=0)  # (M,)
    row = jnp.take_along_axis(rows, best[None], axis=0)[0]
    hit = (row >= 0) & valid
    safe_r = jnp.clip(row, 0)
    return vmap.centroids[safe_r], vmap.normals[safe_r], hit


def point_map_distance(
    vmap: VoxelMap, p: jnp.ndarray, valid: jnp.ndarray, cap: float = 1.0
) -> jnp.ndarray:
    """Per-point distance to the nearest map-voxel centroid, clipped to
    `cap` (points with no correspondence within the 27-cell search — or
    outside the LUT window — return `cap`). One LUT gather per point.

    This is the separating variable of the SPS stability task at
    sub-voxel precision: "growth"-type change sits a fraction of a meter
    outside mapped structure — too far for the voxel-exact overlap bit
    (the reference's prune, util.py:85-114) to mark as supported, but
    close enough that the UNet's coarse levels smear it into the mapped
    surface. Fed as an optional second input channel
    (SPSConfig.dist_feature), it makes map support an explicit
    sub-voxel-resolution input instead of a learned long-range
    inference. Invalid points return 0."""
    cc, _, hit = _correspond(vmap, p, valid)
    d = jnp.linalg.norm(cc - p, axis=-1)
    d = jnp.where(hit, jnp.minimum(d, cap), cap)
    return jnp.where(valid, d, 0.0).astype(jnp.float32)


def yaw_search(
    vmap: VoxelMap,
    scan: jnp.ndarray,
    valid: jnp.ndarray,
    pose: jnp.ndarray,
    *,
    span: float = 0.6,
    steps: int = 13,
    huber: float = 0.3,
) -> jnp.ndarray:
    """Batched yaw-hypothesis search about the sensor origin.

    Gauss-Newton point-to-plane has a rotation basin of only a few
    degrees-per-meter-of-range (a 25 deg prior error displaces a 10 m
    return by 4.4 m — far outside the 27-voxel correspondence search), so
    a sharp-turn transient under the constant-velocity prior stalls it in
    a wrong minimum (hdl_localization survives this via its filter's
    process noise + NDT's wide basin). Here: score `steps` yaw rotations
    of the prior (composed in the SENSOR frame, pose @ Rz) on the coarse
    map with a bounded robust cost (missing correspondences pay the Huber
    ceiling), take the argmin. One vmapped evaluation — TPU-batched, no
    loop."""
    yaws = jnp.linspace(-span, span, steps)

    def cost(yaw):
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        rz = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        r3 = pose[:3, :3] @ rz
        p = scan @ r3.T + pose[:3, 3]
        cc, nn, hit = _correspond(vmap, p, valid)
        r = jnp.sum(nn * (p - cc), axis=-1)
        e = jnp.where(hit, jnp.minimum(r * r, huber * huber), huber * huber)
        v = valid.astype(e.dtype)
        return jnp.sum(e * v) / jnp.maximum(jnp.sum(v), 1.0)

    costs = jax.vmap(cost)(yaws)
    best = jnp.argmin(costs)
    yaw = yaws[best]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    rz = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    out = pose.at[:3, :3].set(pose[:3, :3] @ rz)
    return out


def _correspond_cols(vmap: VoxelMap, cn, px, py, pz, valid):
    """LUT correspondence in COLUMN form: (N,) coordinate arrays in, six
    (N,) centroid/normal columns + hit mask out, via ONE (V, 6) row
    gather. (N, k)-minor arrays pay (8, 128) lane-tile padding on every
    elementwise op — the column form keeps the whole GN iteration on
    lane-dense (N,) arrays (measured: 3.2 -> ~1 ms/iteration at 131k
    points)."""
    inv = 1.0 / vmap.voxel_size
    cx = jnp.floor(px * inv).astype(jnp.int32) - vmap.lut_origin[0]
    cy = jnp.floor(py * inv).astype(jnp.int32) - vmap.lut_origin[1]
    cz = jnp.floor(pz * inv).astype(jnp.int32) - vmap.lut_origin[2]
    d = vmap.lut_dims
    inb = (
        (cx >= 0) & (cx < d[0])
        & (cy >= 0) & (cy < d[1])
        & (cz >= 0) & (cz < d[2])
    )
    nc = vmap.lut.shape[0]
    flat = (cx * d[1] + cy) * d[2] + cz
    lut_ext = jnp.concatenate([vmap.lut, jnp.array([vhash.EMPTY], jnp.int32)])
    row = lut_ext[jnp.where(inb & valid, jnp.clip(flat, 0, nc), nc)]
    hit = (row >= 0) & valid
    g = cn[jnp.clip(row, 0)]  # (N, 6) single gather
    return (g[:, 0], g[:, 1], g[:, 2], g[:, 3], g[:, 4], g[:, 5]), hit


def register(
    vmap: VoxelMap,
    scan: jnp.ndarray,
    valid: jnp.ndarray,
    init_pose: jnp.ndarray,
    *,
    iters: int = 12,
    damping: float = 1e-4,
    huber: float = 0.3,
    point_w: jnp.ndarray | None = None,
):
    """Point-to-plane ICP of (N, 3) scan (sensor frame) against the map.

    Returns (pose 4x4, stats dict). Jittable; fixed iteration count.
    The Gauss-Newton iteration runs entirely on (N,) column arrays (see
    _correspond_cols); H and g accumulate as 27 fused masked reductions,
    and only the 6x6 solve touches a 2-D array.

    point_w: optional (N,) per-point confidence multiplied into the
    robust weights — the SOFT form of stability filtering: instead of
    the reference's binary cut at eps (sps_node.py:147-148), every point
    stays a constraint scaled by its stability (e.g. (1 - score)^2).
    Uncertain surfaces stop biasing the normal equations without
    discarding the constraint budget the way hard thresholding does.
    """
    sx, sy, sz = scan[:, 0], scan[:, 1], scan[:, 2]
    use_lut = vmap.lut is not None
    cn = (
        jnp.concatenate([vmap.centroids, vmap.normals], axis=-1)
        if use_lut
        else None
    )

    def residual_cols(pose):
        r3 = pose[:3, :3]
        t = pose[:3, 3]
        px = r3[0, 0] * sx + r3[0, 1] * sy + r3[0, 2] * sz + t[0]
        py = r3[1, 0] * sx + r3[1, 1] * sy + r3[1, 2] * sz + t[1]
        pz = r3[2, 0] * sx + r3[2, 1] * sy + r3[2, 2] * sz + t[2]
        if use_lut:
            (ccx, ccy, ccz, nx, ny, nz), hit = _correspond_cols(
                vmap, cn, px, py, pz, valid
            )
        else:
            p = jnp.stack([px, py, pz], -1)
            c, n, hit = _correspond(vmap, p, valid)
            ccx, ccy, ccz = c[:, 0], c[:, 1], c[:, 2]
            nx, ny, nz = n[:, 0], n[:, 1], n[:, 2]
        r = nx * (px - ccx) + ny * (py - ccy) + nz * (pz - ccz)
        # d r / d omega = p x n
        jwx = py * nz - pz * ny
        jwy = pz * nx - px * nz
        jwz = px * ny - py * nx
        return (jwx, jwy, jwz, nx, ny, nz), r, hit

    def step(_, pose):
        cols, r, hit = residual_cols(pose)
        absr = jnp.abs(r) + 1e-12
        w = jnp.where(absr < huber, 1.0, huber / absr) * hit.astype(jnp.float32)
        if point_w is not None:
            w = w * point_w
        h = jnp.eye(6) * damping
        g = jnp.zeros((6,))
        entries_h = []
        for i in range(6):
            for j in range(i, 6):
                entries_h.append(jnp.sum(w * cols[i] * cols[j]))
        entries_g = [jnp.sum(w * cols[i] * r) for i in range(6)]
        k = 0
        for i in range(6):
            for j in range(i, 6):
                h = h.at[i, j].add(entries_h[k])
                if i != j:
                    h = h.at[j, i].add(entries_h[k])
                k += 1
        g = jnp.stack(entries_g)
        delta = -jnp.linalg.solve(h, g)
        return _exp_se3(delta) @ pose

    pose = jax.lax.fori_loop(0, iters, step, init_pose)

    # Final stats.
    _, r, hit = residual_cols(pose)
    w = hit.astype(jnp.float32)
    if point_w is not None:
        w = w * point_w
    rmse = jnp.sqrt(jnp.sum(w * r * r) / jnp.maximum(jnp.sum(w), 1.0))
    stats = {"inliers": jnp.sum(hit.astype(jnp.int32)), "rmse": rmse}
    return pose, stats


def register_pyramid(
    vmaps,
    scan: jnp.ndarray,
    valid: jnp.ndarray,
    init_pose: jnp.ndarray,
    *,
    iters: int = 12,
    huber: float = 0.3,
    yaw_span: float = 0.6,
    yaw_steps: int = 13,
    coarse_stride: int = 8,
    point_w: jnp.ndarray | None = None,
):
    """Coarse-to-fine ICP over a list of VoxelMaps (coarsest first).

    The single-level 27-neighbor correspondence search only captures
    matches within ~2 voxels, so a prior error beyond that basin stalls
    (point-to-plane slides along the ground). Registering on a coarser
    map first widens the basin to a few meters (hdl_localization's NDT
    matcher has a similarly wide basin via its 2+ m resolution grid),
    then the fine level recovers accuracy. A batched yaw search at the
    coarsest level (yaw_search) widens the ROTATION basin to +-yaw_span
    rad, covering sharp-turn transients of the constant-velocity prior;
    yaw_steps=0 disables it. Jittable; fixed trip counts.

    coarse_stride: every k-th point on the NON-final levels and the yaw
    search. Their objectives are voxel-quantization-noisy averages over
    1e5 points — a 1/8 subsample moves their minima far less than the
    quantization noise, and the yaw search's 13-hypothesis correspond
    was the single most expensive op of the loop (gather rows scale with
    hypotheses x points). The finest level always uses every point.
    """
    pose = init_pose
    stats = None
    for li, vm in enumerate(vmaps):
        last = li == len(vmaps) - 1
        s, v, pw = scan, valid, point_w
        if not last and coarse_stride > 1:
            s, v = scan[::coarse_stride], valid[::coarse_stride]
            pw = point_w[::coarse_stride] if point_w is not None else None
        if li == 0 and yaw_steps > 0:
            pose = yaw_search(
                vm, s, v, pose,
                span=yaw_span, steps=yaw_steps,
                huber=huber * vm.voxel_size / vmaps[-1].voxel_size,
            )
        # Coarse levels: fewer iters, wider huber (their residuals are
        # voxel-quantization-noisy); the finest level gets the full count.
        it = iters if last else max(iters // 2, 4)
        hb = huber if last else huber * vm.voxel_size / vmaps[-1].voxel_size
        pose, stats = register(vm, s, v, pose, iters=it, huber=hb, point_w=pw)
    return pose, stats
