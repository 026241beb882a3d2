"""SPS stability-scoring model: points -> per-point stability in [0, 1].

Equivalent of the reference's SPSModel
(/root/reference/src/sps/models/models.py:13-30): quantize -> sparse
voxelize -> MinkUNet(in=1, out=1, D=4) -> devoxelize -> sigmoid, with the
constant 0.5 input feature (models.py:22). Training/eval logic (losses,
metrics, optimizer) lives in sps_tpu/train.py and sps_tpu/eval.py — the
model itself is a pure function of (params, batch).

Engine selection is static config: "brick" (dense-brick backend,
ops/brick.py — TPU-fast) or "gather" (row-gather backend, ops/topology.py
+ ops/sparse_conv.py — the simple exact formulation both are tested
against). Parameter trees are identical across engines.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from sps_tpu.models.minkunet import MinkUNet, MinkUNetConfig
from sps_tpu.ops import atlas as atl
from sps_tpu.ops import brick as bk
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
    # "atlas": brick features + dense-AABB probe-free topology (fastest);
    # "brick": brick features + probing-hash topology;
    # "gather": per-voxel rows (the exact/simple oracle formulation).
    engine: str = "brick"
    # Brick edge length in voxels (power of two). Larger bricks cut
    # hash/topology/gather work ~cubically at the cost of more MXU FLOPs
    # on phantom slots; 8 is the measured sweet spot at BLT scan density.
    brick_side: int = 4
    # Static atlas window (NB, NX, NY, NZ) in bricks; engine="atlas" only.
    atlas_extent: tuple = (2, 256, 256, 96)
    # Hybrid pyramid (engine="atlas"): convert levels >= row_from to the
    # compact voxel-row engine (deep levels are ~5% occupied inside
    # bricks; rows avoid phantom-slot FLOPs). None = all-brick. Row
    # capacities come from caps.voxels.
    row_from: int | None = None
    # Second input channel: per-point distance-to-map (register.
    # point_map_distance), scatter-min'd to voxel slots and normalized by
    # dist_cap. OFF by default (reference parity: the reference feeds the
    # constant 0.5 only, models.py:22). When on, unet.in_channels must be
    # 2 and callers must supply the per-point distances (PointBatch.dist
    # offline, the map LUT gather in stream/engine.py online).
    dist_feature: bool = False
    dist_cap: float = 1.0


def build_levels_from_grid(grid, cfg: SPSConfig):
    """Topology pyramid from an existing stride-1 grid (any engine)."""
    if isinstance(grid, atl.AtlasGrid):
        if (
            cfg.row_from is not None
            and cfg.row_from >= 3
            and cfg.brick_side == 8
        ):
            # Side-8 identity: level-(k+3) voxels ARE level-k bricks, so
            # the deep row levels alias shallow brick tables instead of
            # being built (atl.alias_row_levels) — and the deep BRICK
            # pyramid is never constructed.
            levels = atl.build_levels(
                grid, num_levels=cfg.row_from, capacities=cfg.caps.bricks
            )
            levels = atl.alias_row_levels(levels, NUM_LEVELS)
        else:
            levels = atl.build_levels(
                grid, num_levels=NUM_LEVELS, capacities=cfg.caps.bricks
            )
            if cfg.row_from is not None:
                levels = atl.hybridize_levels(levels, cfg.row_from, cfg.caps.voxels)
    elif isinstance(grid, bk.BrickGrid):
        levels = bk.build_brick_levels(
            grid, num_levels=NUM_LEVELS, capacities=cfg.caps.bricks
        )
    else:
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
    return levels, overflow


def build_pyramid(pb: PointBatch, cfg: SPSConfig):
    """Voxelize a point batch and build the topology pyramid.

    Returns (levels, point2slot, overflow). point2slot indexes the flat
    (rows, T, C) voxel view of level 0 (rows = V for gather, B*64 for
    brick). Parameter-free; kept outside the flax module so streaming
    callers can reuse/precompute it."""
    coords = vox.quantize(pb.xyz, cfg.voxel_size)
    if cfg.engine == "atlas":
        grid, p2s = atl.voxelize_bricks(
            coords,
            pb.batch,
            pb.t,
            pb.valid,
            num_time=cfg.unet.num_time,
            brick_capacity=cfg.caps.bricks[0],
            brick_side=cfg.brick_side,
            extent=cfg.atlas_extent,
        )
    elif cfg.engine == "brick":
        grid, p2s = bk.voxelize_bricks(
            coords,
            pb.batch,
            pb.t,
            pb.valid,
            num_time=cfg.unet.num_time,
            brick_capacity=cfg.caps.bricks[0],
            brick_side=cfg.brick_side,
        )
    else:
        grid, p2s, _ = vox.voxelize(
            coords,
            pb.batch,
            pb.t,
            pb.valid,
            num_time=cfg.unet.num_time,
            voxel_capacity=cfg.caps.voxels[0],
        )
    levels, overflow = build_levels_from_grid(grid, cfg)
    return levels, p2s, overflow


class SPSModel(nn.Module):
    cfg: SPSConfig

    @nn.compact
    def __call__(
        self,
        pb: PointBatch | None = None,
        train: bool = False,
        *,
        grid=None,
        levels=None,
        p2v=None,
        t_idx=None,
        valid=None,
        point_dist=None,
    ):
        """Returns (scores, aux): (N,) per-point sigmoid stability scores
        (0 for padded points) and a dict with overflow flags.

        Three entry modes:
          * pb: voxelizes the PointBatch (offline train/predict path).
          * grid/p2v/t_idx/valid: a precomputed stride-1 grid whose
            occupancy already encodes scan/map presence — the streaming
            path (the reference's online prune at util.py:85-114 reduces
            to occupancy bits here, so no submap cloud is materialized).
          * levels/p2v/t_idx/valid: a prebuilt topology pyramid with
            per-scan occupancy already refreshed (the streaming
            topology-reuse path, stream/engine.py; atl.refresh_occupancy).
        """
        cfg = self.cfg
        t = cfg.unet.num_time
        if grid is None and levels is None:
            levels, p2v, overflow = build_pyramid(pb, cfg)
            t_idx, valid = pb.t, pb.valid
            if point_dist is None:
                point_dist = pb.dist
        elif levels is None:
            levels, overflow = build_levels_from_grid(grid, cfg)
        else:
            overflow = jnp.stack([lv.grid.overflow for lv in levels])
        if cfg.unet.sp_axis is not None:
            # Spatially sharded (parallel/spatial.py): topology above ran
            # replicated on every device; from here on each device works
            # its contiguous block of every level's brick/row axis, and
            # the convs all-gather their inputs over the sp axis.
            from sps_tpu.parallel import spatial as sp_mod

            levels = sp_mod.slice_levels(
                levels, cfg.unet.sp_axis, ghost_frac=cfg.unet.sp_ghost_frac
            )
            # Ghost-capacity overflow is OR'd into the sliced levels'
            # flags — re-stack so it reaches aux (never silently dropped).
            overflow = jnp.stack([lv.grid.overflow for lv in levels])
        # Constant 0.5 input feature on occupied slots (models.py:22).
        occ0 = levels[0].grid.occ
        if cfg.dist_feature:
            assert cfg.unet.in_channels == 2, "dist_feature needs in_channels=2"
            assert cfg.unet.sp_axis is None, (
                "dist_feature under spatial sharding needs a sliced "
                "scatter; not implemented"
            )
            # Scatter-min the per-point distances into (slot, t) cells of
            # the L0 layout (empty cells stay at cap; occ masks them to 0
            # below). Index matches devoxelize_flat: slot*T + t.
            st = int(np.prod(occ0.shape[:-1])) * t
            if point_dist is None:
                point_dist = jnp.zeros_like(t_idx, jnp.float32)
            idx = jnp.where(
                (p2v >= 0) & valid,
                jnp.clip(p2v, 0) * t + jnp.clip(t_idx, 0, t - 1),
                st,
            )
            dvox = (
                jnp.full((st + 1,), cfg.dist_cap, jnp.float32)
                .at[idx]
                .min(point_dist.astype(jnp.float32))
            )[:st].reshape(occ0.shape)
            d01 = (dvox / cfg.dist_cap) * occ0
            # The MAP time slot's distance-to-map is 0 by definition.
            # Forcing it removes a train/stream skew: offline, submap
            # points scatter ~0 there; online, no points carry MAP_T and
            # the empty cells would read cap on every overlap voxel.
            if t >= 2:
                d01 = d01.at[..., MAP_T].set(0.0)
            feats0 = (
                jnp.stack([0.5 * occ0, d01], axis=-1)
                .reshape(occ0.shape[:-1] + (t * 2,))
                .astype(cfg.unet.dtype)
            )
        else:
            feats0 = (0.5 * jnp.repeat(occ0, cfg.unet.in_channels, axis=-1)).astype(
                cfg.unet.dtype
            )
        out = MinkUNet(cfg.unet, name="MinkUNet")(feats0, levels, train)
        if cfg.unet.sp_axis is not None:
            import jax

            out = jax.lax.all_gather(out, cfg.unet.sp_axis, axis=0, tiled=True)
        per_point = vox.devoxelize_flat(
            out, p2v, t_idx, num_time=t, channels=cfg.unet.out_channels
        )[:, 0].astype(jnp.float32)
        scores = nn.sigmoid(per_point) * valid.astype(per_point.dtype)
        return scores, {"overflow": overflow, "point2voxel": p2v}
