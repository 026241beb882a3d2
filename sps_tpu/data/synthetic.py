"""Synthetic BLT-layout dataset generator.

Produces a dataset directory with the exact on-disk layout the reference
documents (Readme.md:109-127):

    $DATA/
      maps/base_map.asc.npy            (M, 4) [x, y, z, label]
      sequence/<SEQ>/scans/*.npy       (N, 4) [x, y, z, stability_label]
      sequence/<SEQ>/poses/*.txt       4x4 comma-delimited pose
      sequence/<SEQ>/map_transform     4x4 comma-delimited alignment

The synthetic world: a stable "environment" (ground plane + random boxes,
always present, stability label 0) plus per-sequence "clutter" objects
(present in the scan but not the map -> unstable, label 1). A simulated
sensor takes 360-degree range scans from poses along a loop; scans are
stored in the sensor frame so the pose/map_transform pipeline is
exercised. This drives train/predict/stream/bench end-to-end without the
(external) BLT download, and gives learnable structure: unstable points
are those with no map support.
"""

from __future__ import annotations

import os

import numpy as np


def _boxes(rng, n, extent, zmax=2.5):
    """Random axis-aligned box surfaces -> point samples."""
    pts = []
    for _ in range(n):
        cx, cy = rng.uniform(-extent, extent, 2)
        sx, sy = rng.uniform(0.5, 3.0, 2)
        h = rng.uniform(0.8, zmax)
        m = rng.integers(150, 400)
        face = rng.integers(0, 4, m)
        u = rng.uniform(-0.5, 0.5, m)
        z = rng.uniform(0, h, m)
        x = np.where(face < 2, u * sx, np.where(face == 2, -0.5 * sx, 0.5 * sx))
        y = np.where(face >= 2, u * sy, np.where(face == 0, -0.5 * sy, 0.5 * sy))
        pts.append(np.stack([cx + x, cy + y, z], 1))
    return np.concatenate(pts, 0)


def make_world(seed=0, extent=22.0, n_stable=28, ground_points=22000):
    rng = np.random.default_rng(seed)
    g = rng.uniform(-extent, extent, (ground_points, 2))
    ground = np.concatenate([g, np.abs(rng.normal(0, 0.02, (ground_points, 1)))], 1)
    stable = np.concatenate([ground, _boxes(rng, n_stable, extent)], 0)
    return stable.astype(np.float32)


def sample_scan(rng, stable, clutter, pose_xy, n_rays=360 * 3, max_r=25.0):
    """Crude range-scan: keep world points within max_r of the sensor,
    subsample, add noise. Returns (pts_world, labels)."""
    world = np.concatenate([stable, clutter], 0)
    labels = np.concatenate(
        [np.zeros(len(stable)), np.ones(len(clutter))]
    ).astype(np.float32)
    d = np.linalg.norm(world[:, :2] - pose_xy[None], axis=1)
    keep = d < max_r
    world, labels = world[keep], labels[keep]
    take = rng.random(len(world)) < min(1.0, n_rays * 14 / max(len(world), 1))
    pts = world[take] + rng.normal(0, 0.015, (take.sum(), 3)).astype(np.float32)
    return pts.astype(np.float32), labels[take]


def generate(
    root: str,
    sequences=("20220420", "20220601", "20220608", "20220629"),
    scans_per_seq: int = 12,
    seed: int = 0,
    extent: float = 22.0,
    n_rays: int = 360 * 3,
    ground_points: int = 22000,
    n_stable: int = 28,
    step_m: float = 1.0,
):
    """Write a full synthetic dataset. Returns the root path."""
    rng = np.random.default_rng(seed)
    stable = make_world(seed, extent, n_stable=n_stable, ground_points=ground_points)

    os.makedirs(os.path.join(root, "maps"), exist_ok=True)
    map_label = np.zeros((len(stable), 1), np.float32)
    np.save(
        os.path.join(root, "maps", "base_map.asc.npy"),
        np.concatenate([stable, map_label], 1),
    )

    for si, seq in enumerate(sequences):
        srng = np.random.default_rng(seed + 1000 + si)
        clutter = _boxes(srng, 10, extent * 0.8).astype(np.float32)
        sdir = os.path.join(root, "sequence", seq)
        os.makedirs(os.path.join(sdir, "scans"), exist_ok=True)
        os.makedirs(os.path.join(sdir, "poses"), exist_ok=True)
        # Identity map alignment (the reference's map_transform aligns the
        # SLAM frame to the base map; synthetic data is generated in the
        # map frame already but we exercise a nontrivial pose per scan).
        np.savetxt(os.path.join(sdir, "map_transform"), np.eye(4), delimiter=",")
        # Fixed ~step_m arc length between consecutive poses (sensor-rate
        # spacing), NOT a full loop split across scans_per_seq: with few
        # scans the latter yields 10+ m jumps that no constant-velocity
        # prior + ICP can recover from, which is unrepresentative of any
        # real LiDAR stream.
        radius = 0.55 * extent
        ang_step = step_m / radius
        for i in range(scans_per_seq):
            ang = ang_step * i
            pose_xy = radius * np.array([np.cos(ang), np.sin(ang)])
            yaw = ang + np.pi / 2
            c, s = np.cos(yaw), np.sin(yaw)
            pose = np.eye(4)
            pose[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            pose[:2, 3] = pose_xy
            pts_world, labels = sample_scan(srng, stable, clutter, pose_xy, n_rays=n_rays)
            # Store scan in the sensor frame (pose maps sensor -> world).
            inv = np.linalg.inv(pose)
            pts_sensor = pts_world @ inv[:3, :3].T + inv[:3, 3]
            scan = np.concatenate([pts_sensor, labels[:, None]], 1).astype(np.float32)
            np.save(os.path.join(sdir, "scans", f"{i:06d}.npy"), scan)
            np.savetxt(os.path.join(sdir, "poses", f"{i:06d}.txt"), pose, delimiter=",")
    return root
