"""MapMOS: moving-object segmentation of a scan against a local map.

Equivalent of the reference baseline at
/root/reference/c_ws/src/mapmos/scripts/mapmos.py:32-89: a
CustomMinkUNet14 (in=1, out=1, D=4) over scan (t=0) + local map (t=-1)
with *normalized time-index* features
  f = 1 + (i_max - i) / (i_max - i_min)   (mapmos.py:65-71)
and per-point logits; label = logit > 0 (mapmos.py:85-89).

Engine mapping: the two time values {scan=0, map=-1} become packed slots
{scan=1, map=0} (monotone shift; slot order chosen to match SPS's
scan=1/map=0 so converted checkpoints see consistent Toeplitz packing).
Unlike SPS, features vary per point, so voxelization mean-pools them.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from sps_tpu.models.minkunet import MinkUNet, MinkUNetConfig
from sps_tpu.ops import brick as bk
from sps_tpu.ops import voxelize as vox
from sps_tpu.models.spsnet import SPSConfig, build_levels_from_grid
from sps_tpu.structs import Capacities, PointBatch


@dataclasses.dataclass(frozen=True)
class MapMOSConfig:
    voxel_size: float = 0.1
    caps: Capacities = Capacities()
    # atlas: see MOS4DConfig.engine.
    engine: str = "atlas"
    brick_side: int = 8
    atlas_extent: tuple = (1, 96, 96, 24)
    row_from: int | None = 3

    def sps_config(self) -> SPSConfig:
        return SPSConfig(
            voxel_size=self.voxel_size,
            caps=self.caps,
            unet=MinkUNetConfig(in_channels=1, out_channels=1, num_time=2, conv_mode="halo"),
            engine=self.engine,
            brick_side=self.brick_side,
            atlas_extent=self.atlas_extent,
            row_from=self.row_from,
        )


def normalized_index_features(indices: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """mapmos.py:65-71: 1 + (i_max - i)/(i_max - i_min); all-equal -> 1."""
    big = jnp.float32(1e9)
    i = indices.astype(jnp.float32)
    imax = jnp.max(jnp.where(valid, i, -big))
    imin = jnp.min(jnp.where(valid, i, big))
    same = imax <= imin
    f = jnp.where(same, 1.0, 1.0 + (imax - i) / jnp.maximum(imax - imin, 1e-9))
    return f[:, None]


class MapMOSNet(nn.Module):
    cfg: MapMOSConfig

    @nn.compact
    def __call__(self, pb: PointBatch, indices: jnp.ndarray, train: bool = False):
        """pb.t: scan=1, map=0. indices: per-point scan index (the
        reference's `indices` tensor). Returns (N,) logits."""
        scfg = self.cfg.sps_config()
        feats = normalized_index_features(indices, pb.valid)
        coords = vox.quantize(pb.xyz, scfg.voxel_size)
        if scfg.engine == "atlas":
            from sps_tpu.ops import atlas as atl

            grid, p2s, pooled = atl.voxelize_bricks(
                coords,
                pb.batch,
                pb.t,
                pb.valid,
                num_time=2,
                brick_capacity=scfg.caps.bricks[0],
                brick_side=scfg.brick_side,
                extent=scfg.atlas_extent,
                features=feats,
            )
        elif scfg.engine == "brick":
            grid, p2s, pooled = bk.voxelize_bricks(
                coords,
                pb.batch,
                pb.t,
                pb.valid,
                num_time=2,
                brick_capacity=scfg.caps.bricks[0],
                features=feats,
                brick_side=scfg.brick_side,
            )
        else:
            grid, p2s, pooled3 = vox.voxelize(
                coords,
                pb.batch,
                pb.t,
                pb.valid,
                num_time=2,
                voxel_capacity=scfg.caps.voxels[0],
                features=feats,
            )
            pooled = pooled3.reshape(pooled3.shape[0], -1)
        levels, overflow = build_levels_from_grid(grid, scfg)
        out = MinkUNet(scfg.unet, name="MinkUNet")(pooled, levels, train)
        logits = vox.devoxelize_flat(out, p2s, pb.t, num_time=2, channels=1)[
            :, 0
        ].astype(jnp.float32)
        return logits * pb.valid.astype(jnp.float32), {"overflow": overflow}


def to_label(logits: jnp.ndarray) -> jnp.ndarray:
    """mapmos.py:85-89."""
    return (logits > 0).astype(jnp.float32)
