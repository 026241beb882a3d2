"""Streaming baseline filters: MOS4D, MapMOS, mask, raw.

Equivalents of the reference's baseline ROS nodes used for the paper's
comparisons (SURVEY.md §2a #10-13):

  * MOS4DFilter  — sliding buffer of N scans merged into one 4D cloud,
    moving logits > 0 removed (c_ws/src/mos4d/scripts/mos4d_node.py:98-128;
    N parsed from the checkpoint name `(\\d+)_scans.ckpt`, :33-40).
  * MapMOSFilter — 30 m local map crop + scan/map time indices with
    normalized-index features (c_ws/src/mapmos/scripts/mapmos_node.py:63-107).
  * MaskFilter   — model-free voxel-overlap filter
    (c_ws/src/sps_filter/scripts/mask.py): keep scan points whose voxel
    overlaps the map.
  * raw          — pass-through (the reference's epsilon:=2 ablation,
    loc_exp_general.bash:103,110).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

from sps_tpu.models.mapmos import MapMOSConfig, MapMOSNet
from sps_tpu.models.mos4d import MOS4DConfig, MOS4DNet
from sps_tpu.ops import hash as vhash
from sps_tpu.ops import voxelize as vox
from sps_tpu.structs import PointBatch
from sps_tpu.utils.geometry import transform_points


def scans_from_ckpt_name(path: str, default: int = 10) -> int:
    """mos4d_node.py:33-40: buffer length from `<N>_scans.ckpt`."""
    m = re.search(r"(\d+)_scans", path)
    return int(m.group(1)) if m else default


class MOS4DFilter:
    """Sliding N-scan buffer; per-call returns keep mask for the newest
    scan (moving points removed)."""

    def __init__(self, cfg: MOS4DConfig, variables, scan_capacity: int):
        self.cfg = cfg
        self.variables = variables
        self.ns = scan_capacity
        self.buffer: list[np.ndarray] = []
        self.model = MOS4DNet(cfg)
        n_total = cfg.n_scans * scan_capacity

        @jax.jit
        def fn(variables, xyz, t, valid):
            pb = PointBatch(
                xyz=xyz,
                batch=jnp.zeros((n_total,), jnp.int32),
                t=t,
                label=jnp.zeros((n_total,), jnp.float32),
                valid=valid,
            )
            logits, aux = self.model.apply(variables, pb)
            return logits, aux["overflow"]

        self._fn = fn

    def __call__(self, scan_xyz: np.ndarray, pose: np.ndarray):
        """scan_xyz (n, 3) sensor frame; returns keep mask (n,) for the
        newest scan (True = static)."""
        world = np.asarray(
            transform_points(jnp.asarray(scan_xyz), jnp.asarray(pose))
        )
        self.buffer.append(world)
        if len(self.buffer) > self.cfg.n_scans:
            self.buffer.pop(0)
        nt = self.cfg.n_scans * self.ns
        xyz = np.zeros((nt, 3), np.float32)
        t = np.zeros((nt,), np.int32)
        valid = np.zeros((nt,), bool)
        for i, s in enumerate(self.buffer):
            k = min(len(s), self.ns)
            o = i * self.ns
            xyz[o : o + k] = s[:k]
            t[o : o + k] = i
            valid[o : o + k] = True
        logits, overflow = self._fn(
            self.variables, jnp.asarray(xyz), jnp.asarray(t), jnp.asarray(valid)
        )
        newest = len(self.buffer) - 1
        o = newest * self.ns
        n = min(len(scan_xyz), self.ns)
        lg = np.asarray(logits[o : o + n])
        return lg <= 0  # logits > 0 -> moving -> drop (mos4d_node.py:123)


class MapMOSFilter:
    """Scan + radius-cropped local map through MapMOSNet."""

    def __init__(self, cfg: MapMOSConfig, variables, map_points: np.ndarray,
                 scan_capacity: int, map_capacity: int, crop_radius: float = 30.0):
        self.cfg = cfg
        self.variables = variables
        self.map_points = map_points.astype(np.float32)
        self.ns = scan_capacity
        self.nm = map_capacity
        self.crop = crop_radius
        self.model = MapMOSNet(cfg)
        self.counter = 0
        nt = scan_capacity + map_capacity

        @jax.jit
        def fn(variables, xyz, t, valid, indices):
            pb = PointBatch(
                xyz=xyz,
                batch=jnp.zeros((nt,), jnp.int32),
                t=t,
                label=jnp.zeros((nt,), jnp.float32),
                valid=valid,
            )
            logits, aux = self.model.apply(variables, pb, indices)
            return logits

        self._fn = fn

    def __call__(self, scan_xyz: np.ndarray, pose: np.ndarray):
        world = np.asarray(
            transform_points(jnp.asarray(scan_xyz), jnp.asarray(pose))
        )
        center = pose[:3, 3]
        d = np.linalg.norm(self.map_points - center[None], axis=1)
        local = self.map_points[d < self.crop]  # mapmos_node.py:63-80
        if len(local) > self.nm:
            # Random subsample to capacity, NOT `[: self.nm]` truncation:
            # map arrays are spatially ordered, so truncating keeps one
            # geographic half and the unsupported half of the scan reads
            # as dynamic (measured: kept 0.48 + ATE divergence on a CLEAN
            # world). Training subsamples the crop the same way
            # (scripts/train_baselines.py _subsample).
            sel = np.random.default_rng(self.counter).choice(
                len(local), self.nm, replace=False
            )
            local = local[sel]
        nt = self.ns + self.nm
        xyz = np.zeros((nt, 3), np.float32)
        t = np.zeros((nt,), np.int32)
        valid = np.zeros((nt,), bool)
        idx = np.zeros((nt,), np.float32)
        n = min(len(world), self.ns)
        xyz[:n], t[:n], valid[:n] = world[:n], 1, True  # scan slot
        idx[:n] = self.counter
        m = len(local)
        xyz[self.ns : self.ns + m], valid[self.ns : self.ns + m] = local, True
        idx[self.ns : self.ns + m] = -1.0  # map index (mapmos.py:44-46)
        logits = self._fn(
            self.variables,
            jnp.asarray(xyz),
            jnp.asarray(t),
            jnp.asarray(valid),
            jnp.asarray(idx),
        )
        self.counter += 1
        return np.asarray(logits[:n]) <= 0


class LTSFilter:
    """Range-image LTS filter: project -> window -> SPCTReg -> threshold.

    Equivalent of the reference's lts_filter node
    (c_ws/src/inference_model/lts_filter/scripts/stability_filter.py:134-200):
    the scan is projected to a (beams, 1024) range image, split into
    azimuth windows, each window scored by the offset-attention
    transformer; points with score > epsilon are dropped."""

    def __init__(self, variables, lidar: str = "vlp-16", epsilon: float = 0.84):
        from sps_tpu.data import range_image as ri
        from sps_tpu.models.lts import SPCTReg

        self.ri = ri
        self.lidar = lidar
        self.eps = epsilon
        self.model = SPCTReg()
        self.variables = variables
        self._fn = jax.jit(lambda v, x: self.model.apply(v, x))

    def __call__(self, scan: np.ndarray):
        """scan (N, 4) [x, y, z, label]; returns the kept (M, 4) points
        (range-image resampled, like the reference node's output)."""
        img = self.ri.project(scan, self.lidar)
        wins, labels = self.ri.windows(img, self.lidar)
        scores = np.asarray(self._fn(self.variables, jnp.asarray(wins)))
        pts = wins.reshape(-1, 3)
        s = scores.reshape(-1)
        occupied = (np.abs(pts).sum(axis=1) > 0)
        keep = (s <= self.eps) & occupied
        return np.column_stack([pts[keep], s[keep]])


class MaskFilter:
    """Model-free voxel-overlap filter (mask.py): keep scan points whose
    voxel contains at least one map point."""

    def __init__(self, map_points: np.ndarray, voxel_size: float):
        self.vs = voxel_size
        m = len(map_points)
        cap = vhash.next_pow2(m)

        @jax.jit
        def build(points):
            coords = vox.quantize(points, voxel_size)
            grid, _, _ = vox.voxelize(
                coords,
                jnp.zeros((m,), jnp.int32),
                jnp.zeros((m,), jnp.int32),
                jnp.ones((m,), bool),
                num_time=1,
                voxel_capacity=cap,
            )
            return grid.table

        self.table = build(jnp.asarray(map_points, jnp.float32))

        @jax.jit
        def fn(table, xyz, pose):
            p = transform_points(xyz, pose)
            coords = vox.quantize(p, voxel_size)
            q = jnp.concatenate(
                [jnp.zeros((xyz.shape[0], 1), jnp.int32), coords], -1
            )
            return vhash.lookup(table, q) >= 0

        self._fn = fn

    def __call__(self, scan_xyz: np.ndarray, pose: np.ndarray):
        return np.asarray(
            self._fn(self.table, jnp.asarray(scan_xyz, jnp.float32), jnp.asarray(pose))
        )
