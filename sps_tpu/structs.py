"""Shared pytree structures and static pipeline capacities."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class PointBatch(NamedTuple):
    """A padded, fixed-capacity batch of 4D points.

    The reference's collate output is a flat (sum N_i, 6) tensor
    [batch_idx, x, y, z, t, label]
    (/root/reference/src/sps/datasets/blt_dataset.py:173-182); we carry the
    same fields as separate padded arrays plus a validity mask so shapes
    stay static under jit.
    """

    xyz: jnp.ndarray  # (N, 3) float32, map frame
    batch: jnp.ndarray  # (N,) int32
    t: jnp.ndarray  # (N,) int32 — time slot (SPS: scan=1, map=0)
    label: jnp.ndarray  # (N,) float32 — stability label in [0, 1]
    valid: jnp.ndarray  # (N,) bool
    # Optional per-point distance-to-map feature (SPSConfig.dist_feature),
    # computed BEFORE augmentation so it stays consistent under the joint
    # scan+submap rotation/scale. None when the feature is off.
    dist: jnp.ndarray | None = None  # (N,) float32

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


def pad_point_batch(
    xyz: np.ndarray,
    batch: np.ndarray,
    t: np.ndarray,
    label: np.ndarray,
    capacity: int,
) -> PointBatch:
    """Host-side: pad/truncate arrays to the static point capacity."""
    n = min(len(xyz), capacity)
    if len(xyz) > capacity:
        raise ValueError(f"point count {len(xyz)} exceeds capacity {capacity}")

    def pad(a, fill=0):
        out = np.full((capacity,) + a.shape[1:], fill, a.dtype)
        out[:n] = a[:n]
        return out

    valid = np.zeros(capacity, bool)
    valid[:n] = True
    return PointBatch(
        xyz=jnp.asarray(pad(xyz.astype(np.float32))),
        batch=jnp.asarray(pad(batch.astype(np.int32))),
        t=jnp.asarray(pad(t.astype(np.int32))),
        label=jnp.asarray(pad(label.astype(np.float32))),
        valid=jnp.asarray(valid),
    )


@dataclasses.dataclass(frozen=True)
class Capacities:
    """Static shape budget. Chosen so variable-size scans (1e4–1e6 points,
    SURVEY.md §6) compile once and never recompile; overflow is reported as
    data (VoxelGrid.overflow), not as a shape change.

    voxels: per-level row capacities for the gather engine.
    bricks: per-level 4^3-brick capacities for the brick engine (bricks
    shrink slower than voxels under downsampling: halving coordinates
    merges 8 bricks only where they are all occupied)."""

    points: int = 1 << 18
    voxels: tuple = (1 << 17, 1 << 15, 1 << 13, 1 << 11, 1 << 9)
    bricks: tuple = (1 << 14, 1 << 13, 1 << 12, 1 << 11, 1 << 10)

    def scaled(self, factor: float) -> "Capacities":
        def rup(x):
            p = 1
            while p < x:
                p *= 2
            return p

        return Capacities(
            points=rup(int(self.points * factor)),
            voxels=tuple(rup(int(v * factor)) for v in self.voxels),
            bricks=tuple(rup(int(v * factor)) for v in self.bricks),
        )
