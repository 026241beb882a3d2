"""On-device exact radius join (scan -> map submap extraction).

TPU-native replacement for the reference's host-side scipy cKDTree
query_ball_tree at /root/reference/src/sps/datasets/blt_dataset.py:258-271:
"which map points lie within r of at least one scan point". Instead of a
KD-tree we build a hash grid over scan-point cells (cell edge = r) with
fixed-capacity per-cell candidate lists, probe the 27-neighborhood for each
map point, and do exact distance tests — same result set as the kd-tree
query (deduplicated; the reference concatenates duplicate indices, which
only duplicates rows that voxelize identically downstream).

All shapes static: capacities for cells and per-cell occupancy are compile
time constants; overflow beyond max_per_cell drops candidates (reported).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sps_tpu.ops import hash as vhash
from sps_tpu.ops import voxelize as vox


def _cells(points: jnp.ndarray, r: float) -> jnp.ndarray:
    return jnp.floor(points / r).astype(jnp.int32)


def radius_join(
    scan: jnp.ndarray,
    scan_valid: jnp.ndarray,
    queries: jnp.ndarray,
    query_valid: jnp.ndarray,
    r: float,
    *,
    cell_capacity: int,
    max_per_cell: int = 8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """For each query point: is any valid scan point within distance r?

    Args:
      scan: (N, 3) float32.
      queries: (M, 3) float32 (e.g. the map).
      cell_capacity: static max unique scan cells.
      max_per_cell: static per-cell candidate list length.

    Returns:
      (mask, dropped): (M,) bool and the () int32 count of scan points that
      exceeded their cell list (possible false negatives if > 0).
    """
    n = scan.shape[0]
    cells = _cells(scan, r)
    grid, p2c, _ = vox.voxelize(
        cells,
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.int32),
        scan_valid,
        num_time=1,
        voxel_capacity=cell_capacity,
    )
    # Per-cell candidate lists. Rank points within their cell via a scatter
    # "ticket" loop-free trick: sort by cell id, rank = position - first
    # position of that cell id in the sorted order.
    order = jnp.argsort(jnp.where(scan_valid, p2c, cell_capacity))
    sorted_cell = jnp.where(scan_valid, p2c, cell_capacity)[order]
    first_pos = (
        jnp.full((cell_capacity + 1,), n, jnp.int32)
        .at[sorted_cell]
        .min(jnp.arange(n, dtype=jnp.int32))
    )
    rank = jnp.arange(n, dtype=jnp.int32) - first_pos[sorted_cell]
    # Scatter point rows into (cell, rank) slots.
    ok = (sorted_cell < cell_capacity) & (rank < max_per_cell)
    dest_c = jnp.where(ok, sorted_cell, cell_capacity)
    dest_r = jnp.where(ok, rank, 0)
    lists = (
        jnp.full((cell_capacity + 1, max_per_cell), -1, jnp.int32)
        .at[dest_c, dest_r]
        .set(order.astype(jnp.int32), mode="drop")
    )[:cell_capacity]
    dropped = jnp.sum((rank >= max_per_cell) & (sorted_cell < cell_capacity))

    # Probe the 27-neighborhood of each query cell — batched hash lookups
    # in offset chunks (one giant 27xM candidate gather holds multi-GB
    # float intermediates live; chunking bounds the working set while
    # keeping each lookup wide).
    qcells = _cells(queries, r)
    m = queries.shape[0]
    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(-1, 2, dtype=jnp.int32)] * 3), indexing="ij"),
        axis=-1,
    ).reshape(27, 3)
    offs = jnp.concatenate([offs, jnp.full((3, 3), 1 << 20, jnp.int32)])  # pad to 30
    offs = offs.reshape(10, 3, 3)
    scan_safe = jnp.where(scan_valid[:, None], scan, jnp.inf)
    r2 = jnp.float32(r * r)
    # Candidate-slot-major layouts so every gather below is a fully packed
    # 1-D row gather: (3M, P)/(3M, 3) row gathers tile-pad the minor dim
    # to 128 lanes (16x/42x HBM expansion — OOM at dense-map scale).
    lists_t = lists.T  # (P, cells)
    sx_, sy_, sz_ = scan_safe[:, 0], scan_safe[:, 1], scan_safe[:, 2]

    def chunk(off_c):  # (3, 3) offsets
        q = jnp.concatenate(
            [
                jnp.zeros((3, m, 1), jnp.int32),
                qcells[None, :, :] + off_c[:, None, :],
            ],
            axis=-1,
        ).reshape(3 * m, 4)
        qv = jnp.broadcast_to(query_valid[None, :], (3, m)).reshape(-1)
        cell_row = vhash.lookup(grid.table, q, qv)
        safe_row = jnp.clip(cell_row, 0)
        qx = jnp.broadcast_to(queries[None, :, 0], (3, m)).reshape(-1)
        qy = jnp.broadcast_to(queries[None, :, 1], (3, m)).reshape(-1)
        qz = jnp.broadcast_to(queries[None, :, 2], (3, m)).reshape(-1)
        near = jnp.zeros((3 * m,), bool)
        for p in range(max_per_cell):
            cand = jnp.where(cell_row >= 0, lists_t[p][safe_row], -1)
            cs = jnp.clip(cand, 0)
            dx = sx_[cs] - qx
            dy = sy_[cs] - qy
            dz = sz_[cs] - qz
            d2 = dx * dx + dy * dy + dz * dz
            near = near | ((d2 <= r2) & (cand >= 0))
        return jnp.any(near.reshape(3, m), axis=0)

    near = jax.lax.map(chunk, offs)  # (10, M)
    hit = jnp.any(near, axis=0)
    return hit & query_valid, dropped


def compact_mask(
    mask: jnp.ndarray, capacity: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compact True positions of (M,) mask into (capacity,) indices.

    Returns (indices, valid, overflow_count). Order-preserving; extras
    beyond capacity are dropped and counted.
    """
    m = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    total = jnp.sum(mask.astype(jnp.int32))
    dest = jnp.where(mask & (pos < capacity), pos, capacity)
    idx = (
        jnp.zeros((capacity + 1,), jnp.int32)
        .at[dest]
        .set(jnp.arange(m, dtype=jnp.int32), mode="drop")
    )[:capacity]
    valid = jnp.arange(capacity) < jnp.minimum(total, capacity)
    overflow = jnp.maximum(total - capacity, 0)
    return idx, valid, overflow


def radius_join_dense(
    scan: jnp.ndarray,
    scan_valid: jnp.ndarray,
    queries: jnp.ndarray,
    query_valid: jnp.ndarray,
    r: float,
    *,
    extent: tuple,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Probe-free radius join: dense cell-occupancy grid instead of hash
    probing.

    The hash-probe join's linear-probing while loops SERIALIZE on TPU —
    traced at 10.3 s of an 10.7 s training step at loc scale (27 probes x
    6e5 map points). This formulation has no loops at all: scatter the
    scan's occupied cells (edge r) into a dense grid over the scan's AABB
    (origin = per-sample min cell, extent static), dilate once with a 3^3
    max-pool, and answer every query with ONE gather.

    Semantics: keeps query points whose cell is within the CHEBYSHEV
    1-cell neighborhood of an occupied scan cell — a superset of the
    exact Euclidean ball (any pair within r differs by <= 1 per axis) and
    a subset of radius 2r*sqrt(3). The reference's submap join
    (query_ball_tree(r=VOXEL_SIZE), blt_dataset.py:258-271) bounds the
    submap to the scan's voxel footprint; the looser cutoff only admits
    map points one voxel further out, whose submap rows voxelize into
    neighbor voxels of the scan — a slightly larger (never smaller)
    training submap. Documented deviation (docs/DESIGN.md §6).

    extent: static (EX, EY, EZ) cell counts; scan points outside the AABB
    window are dropped (counted in `dropped`). Memory: EX*EY*EZ bytes.

    Returns (mask over queries, dropped scan points).
    """
    ex = jnp.asarray(extent, jnp.int32)
    c = _cells(scan, r)
    big = jnp.int32(1 << 24)
    cmin = jnp.min(jnp.where(scan_valid[:, None], c, big), axis=0) - 1
    rel = c - cmin
    inb = scan_valid & jnp.all((rel >= 0) & (rel < ex), axis=-1)
    ncell = int(extent[0]) * int(extent[1]) * int(extent[2])
    flat = (rel[:, 0] * ex[1] + rel[:, 1]) * ex[2] + rel[:, 2]
    occ = (
        jnp.zeros((ncell + 1,), jnp.uint8)
        .at[jnp.where(inb, flat, ncell)]
        .max(jnp.uint8(1), mode="drop")
    )[:ncell]
    o3 = jax.lax.reduce_window(
        occ.reshape(extent), jnp.uint8(0), jax.lax.max,
        (3, 3, 3), (1, 1, 1), "SAME",
    ).reshape(-1)
    qc = _cells(queries, r) - cmin
    qin = query_valid & jnp.all((qc >= 0) & (qc < ex), axis=-1)
    qflat = (qc[:, 0] * ex[1] + qc[:, 1]) * ex[2] + qc[:, 2]
    hit = o3[jnp.clip(qflat, 0, ncell - 1)] > 0
    dropped = jnp.sum((scan_valid & ~inb).astype(jnp.int32))
    return hit & qin, dropped
