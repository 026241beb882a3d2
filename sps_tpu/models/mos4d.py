"""MOS4D: moving-object segmentation over a buffer of N scans.

Equivalent of the reference baseline at
/root/reference/c_ws/src/mos4d/scripts/mos4d.py:11-32: a CustomMinkUNet
(in=1, out=3, D=4) over the merged cloud of the last N scans, where the
4th coordinate is the scan index within the buffer; per-point moving
logits are channel 2, binarized at logit > 0 (mos4d_node.py:123).

On this engine the N buffered timestamps become N packed time slots
(num_time = N); the same MinkUNet body and converted `*_scans.ckpt`
checkpoints apply.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from sps_tpu.models.minkunet import MinkUNet, MinkUNetConfig
from sps_tpu.models.spsnet import SPSConfig, build_pyramid
from sps_tpu.ops import voxelize as vox
from sps_tpu.structs import Capacities, PointBatch


@dataclasses.dataclass(frozen=True)
class MOS4DConfig:
    voxel_size: float = 0.1
    n_scans: int = 10  # buffer length, parsed from ckpt name in the ref
    caps: Capacities = Capacities()
    # atlas: the probe-free engine (the hash-probing brick/gather builds
    # compile pathologically through the axon remote compiler).
    engine: str = "atlas"
    brick_side: int = 8
    atlas_extent: tuple = (1, 96, 96, 24)
    row_from: int | None = 3

    def sps_config(self) -> SPSConfig:
        return SPSConfig(
            voxel_size=self.voxel_size,
            caps=self.caps,
            unet=MinkUNetConfig(
                in_channels=1, out_channels=3, num_time=self.n_scans,
                conv_mode="halo",
            ),
            engine=self.engine,
            brick_side=self.brick_side,
            atlas_extent=self.atlas_extent,
            row_from=self.row_from,
        )


class MOS4DNet(nn.Module):
    cfg: MOS4DConfig

    @nn.compact
    def __call__(self, pb: PointBatch, train: bool = False):
        """pb.t holds the buffer index in [0, n_scans). Returns (N,)
        moving logits (channel 2 of 3, mos4d.py:32)."""
        scfg = self.cfg.sps_config()
        levels, p2s, overflow = build_pyramid(pb, scfg)
        occ0 = levels[0].grid.occ
        feats0 = 0.5 * jnp.repeat(occ0, 1, axis=-1)
        out = MinkUNet(scfg.unet, name="MinkUNet")(feats0, levels, train)
        per_point = vox.devoxelize_flat(
            out, p2s, pb.t, num_time=self.cfg.n_scans, channels=3
        ).astype(jnp.float32)
        logits = per_point[:, 2] * pb.valid.astype(jnp.float32)
        return logits, {"overflow": overflow}
