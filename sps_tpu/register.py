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
    """Registration map: voxel hash + per-voxel centroid and normal."""

    table: vhash.HashTable
    centroids: jnp.ndarray  # (V, 3)
    normals: jnp.ndarray  # (V, 3)
    num_voxels: jnp.ndarray  # ()
    voxel_size: float


def build_voxel_map(map_points: np.ndarray, voxel_size: float,
                    capacity: int | None = None) -> VoxelMap:
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
        evals, evecs = jnp.linalg.eigh(cov)
        normal = evecs[:, :, 0]  # smallest eigenvalue -> surface normal
        return grid.table, cent, normal, grid.num_voxels

    table, cent, normal, nvox = build(jnp.asarray(map_points, jnp.float32))
    return VoxelMap(table, cent, normal, nvox, voxel_size)


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
    which lets point-to-plane slide along the ground plane)."""
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


def register(
    vmap: VoxelMap,
    scan: jnp.ndarray,
    valid: jnp.ndarray,
    init_pose: jnp.ndarray,
    *,
    iters: int = 12,
    damping: float = 1e-4,
    huber: float = 0.3,
):
    """Point-to-plane ICP of (N, 3) scan (sensor frame) against the map.

    Returns (pose 4x4, stats dict). Jittable; fixed iteration count.
    """

    def correspond(p):
        return _correspond(vmap, p, valid)

    def step(_, pose):
        p = scan @ pose[:3, :3].T + pose[:3, 3]
        c, n, hit = correspond(p)
        r = jnp.sum(n * (p - c), axis=-1)
        # Huber weights.
        absr = jnp.abs(r) + 1e-12
        w = jnp.where(absr < huber, 1.0, huber / absr) * hit.astype(jnp.float32)
        jw = jnp.cross(p, n)  # d r / d omega
        j = jnp.concatenate([jw, n], axis=-1)  # (N, 6)
        h = (j * w[:, None]).T @ j + damping * jnp.eye(6)
        g = (j * w[:, None]).T @ r
        delta = -jnp.linalg.solve(h, g)
        return _exp_se3(delta) @ pose

    pose = jax.lax.fori_loop(0, iters, step, init_pose)

    # Final stats.
    p = scan @ pose[:3, :3].T + pose[:3, 3]
    c, n, hit = correspond(p)
    r = jnp.sum(n * (p - c), axis=-1)
    w = hit.astype(jnp.float32)
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
    """
    pose = init_pose
    stats = None
    for li, vm in enumerate(vmaps):
        if li == 0 and yaw_steps > 0:
            pose = yaw_search(
                vm, scan, valid, pose,
                span=yaw_span, steps=yaw_steps,
                huber=huber * vm.voxel_size / vmaps[-1].voxel_size,
            )
        # Coarse levels: fewer iters, wider huber (their residuals are
        # voxel-quantization-noisy); the finest level gets the full count.
        last = li == len(vmaps) - 1
        it = iters if last else max(iters // 2, 4)
        hb = huber if last else huber * vm.voxel_size / vmaps[-1].voxel_size
        pose, stats = register(vm, scan, valid, pose, iters=it, huber=hb)
    return pose, stats
