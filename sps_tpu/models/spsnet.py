"""SPS stability-scoring model: points -> per-point stability in [0, 1].

Equivalent of the reference's SPSModel
(/root/reference/src/sps/models/models.py:13-30): quantize -> sparse
voxelize -> MinkUNet(in=1, out=1, D=4) -> devoxelize -> sigmoid, with the
constant 0.5 input feature (models.py:22). Training/eval logic (losses,
metrics, optimizer) lives in sps_tpu/train.py and sps_tpu/eval.py — the
model itself is a pure function of (params, batch).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from sps_tpu.models.minkunet import MinkUNet, MinkUNetConfig
from sps_tpu.ops import topology as topo
from sps_tpu.ops import voxelize as vox
from sps_tpu.structs import Capacities, PointBatch

NUM_LEVELS = 5
SCAN_T = 1  # reference util.py:20 SCAN_TIMESTAMP = 1
MAP_T = 0  # reference util.py:21 MAP_TIMESTAMP = 0


@dataclasses.dataclass(frozen=True)
class SPSConfig:
    voxel_size: float = 0.1  # config/config.yaml:30
    threshold: float = 0.84  # config/config.yaml:34
    caps: Capacities = Capacities()
    unet: MinkUNetConfig = MinkUNetConfig(in_channels=1, out_channels=1, num_time=2)


def build_pyramid(pb: PointBatch, cfg: SPSConfig):
    """Voxelize a point batch and build the 5-level topology pyramid.

    Returns (levels, point2voxel, overflow_flags). Parameter-free; kept
    outside the flax module so streaming callers can reuse/precompute it.
    """
    coords = vox.quantize(pb.xyz, cfg.voxel_size)
    grid, p2v, _ = vox.voxelize(
        coords,
        pb.batch,
        pb.t,
        pb.valid,
        num_time=cfg.unet.num_time,
        voxel_capacity=cfg.caps.voxels[0],
    )
    ks = ((cfg.unet.first_kernel, cfg.unet.block_kernel),) + (
        (cfg.unet.block_kernel,),
    ) * (NUM_LEVELS - 1)
    levels = topo.build_levels(
        grid,
        num_levels=NUM_LEVELS,
        capacities=cfg.caps.voxels,
        kernel_sizes=ks,
    )
    overflow = jnp.stack([lv.grid.overflow for lv in levels])
    return levels, p2v, overflow


class SPSModel(nn.Module):
    cfg: SPSConfig

    @nn.compact
    def __call__(self, pb: PointBatch, train: bool = False):
        """Returns (scores, aux): (N,) per-point sigmoid stability scores
        (0 for padded points) and a dict with overflow flags."""
        cfg = self.cfg
        t = cfg.unet.num_time
        levels, p2v, overflow = build_pyramid(pb, cfg)
        # Constant 0.5 input feature on occupied slots (models.py:22).
        feats0 = 0.5 * jnp.repeat(levels[0].grid.occ, cfg.unet.in_channels, axis=-1)
        out = MinkUNet(cfg.unet, name="MinkUNet")(feats0, levels, train)
        v = out.shape[0]
        out3 = out.reshape(v, t, cfg.unet.out_channels)
        per_point = vox.devoxelize(out3, p2v, pb.t)[:, 0]
        scores = nn.sigmoid(per_point) * pb.valid.astype(per_point.dtype)
        return scores, {"overflow": overflow, "point2voxel": p2v}
