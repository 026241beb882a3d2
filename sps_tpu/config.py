"""Typed configuration, loadable from the reference's YAML schema.

One config serves both batch (train/predict) and streaming paths —
replacing the reference's three mechanisms (YAML+click, rospy params,
env vars; see /root/reference/config/config.yaml and SURVEY.md §5). The
YAML keys are a superset of the reference's so existing config files work
unchanged; TPU-specific static capacities live under an optional `TPU:`
section.
"""

from __future__ import annotations

import dataclasses
import os

import yaml

from sps_tpu.models.minkunet import MinkUNetConfig
from sps_tpu.models.spsnet import SPSConfig
from sps_tpu.structs import Capacities


@dataclasses.dataclass(frozen=True)
class DataConfig:
    root: str = ""
    train: tuple = ()
    val: tuple = ()
    test: tuple = ()
    map_file: str = "base_map.asc.npy"
    shuffle: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    max_epoch: int = 80
    lr: float = 7e-5
    lr_epoch: int = 1
    lr_decay: float = 0.99
    weight_decay: float = 1e-4
    batch_size: int = 2
    augmentation: bool = True
    # Loss weight on STABLE (label < 0.5) scan points. The reference's
    # MSE weights classes equally (models.py:67-68); > 1 penalizes
    # false-unstable scores harder — the error mode that makes the filter
    # over-cut registration-supporting structure (precision lever).
    stable_weight: float = 1.0
    # "mse" = the reference objective (models.py:44, continuous stability
    # labels); "bce" = binary cross-entropy on the sigmoid scores — the
    # natural objective when labels are binary (the in-repo baselines
    # train with BCE; TRAIN.LOSS makes the comparison apples-to-apples).
    loss: str = "mse"


@dataclasses.dataclass(frozen=True)
class TPUConfig:
    """Static shape budget (per sample unless noted)."""

    scan_points: int = 1 << 17  # padded scan size
    submap_points: int = 1 << 17  # padded submap size
    cell_capacity: int = 1 << 18  # radius-join hash cells
    voxels: tuple = (1 << 18, 1 << 16, 1 << 14, 1 << 12, 1 << 10)  # whole batch
    bricks: tuple = (1 << 15, 1 << 14, 1 << 13, 1 << 12, 1 << 11)  # whole batch
    engine: str = "brick"  # "atlas" | "brick" | "gather"
    brick_side: int = 4  # brick edge in voxels (power of two)
    # Per-sample dense-atlas window in bricks (engine="atlas"): must cover
    # one scan+submap AABB at L0 brick granularity.
    atlas_extent: tuple = (256, 256, 96)
    conv_mode: str = "region"  # brick stride-1 conv: "region" | "halo" | "zband"
    zband_levels: int = 1  # conv_mode="zband": fold levels [0, N) (see MinkUNetConfig)
    # First pyramid level run on the compact voxel-row engine (atlas
    # engine); 0/absent disables.
    row_from: int = 0
    max_per_cell: int = 8
    # Submap radius-join formulation: "hash" (exact ball query, probing
    # while loops — fine on CPU, serializes on TPU) or "dense" (probe-free
    # cell-occupancy grid over join_extent cells at edge VOXEL_SIZE; the
    # TPU configuration — see ops.radius.radius_join_dense).
    join_mode: str = "hash"
    join_extent: tuple = (640, 640, 128)
    bf16: bool = False
    # Rematerialize residual blocks in the backward pass (training memory
    # vs FLOPs trade; see MinkUNetConfig.remat).
    remat: bool = False
    # int8 MXU math for the brick-level 3^3 convs at inference (see
    # MinkUNetConfig.int8; training is unaffected).
    int8: bool = False
    # Fold only the k=5 stem into the zband layout (see
    # MinkUNetConfig.stem_zband).
    stem_zband: bool = False
    # Run the 1x1 head on the z-folded layout (see
    # MinkUNetConfig.head_fold).
    head_fold: bool = False
    # Streaming topology reuse (atlas engine): rebuild the topology
    # pyramid every N scans and run the cheap cached-topology program in
    # between (stream/engine.py). 0 disables. Exact whenever the cached
    # brick set covers the scan; uncovered fringe points are counted in
    # stats.topo_miss_points and score 0.5 until the next rebuild.
    topo_every: int = 0


@dataclasses.dataclass(frozen=True)
class Config:
    experiment_id: str = "BLT"
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()
    voxel_size: float = 0.1
    threshold: float = 0.84
    tpu: TPUConfig = TPUConfig()
    # MODEL.DIST_FEATURE: second input channel = per-point distance to
    # the nearest map voxel centroid (register.point_map_distance),
    # clipped at dist_cap meters. Off = reference-parity inputs.
    dist_feature: bool = False
    dist_cap: float = 1.0

    @property
    def point_capacity(self) -> int:
        return self.train.batch_size * (
            self.tpu.scan_points + self.tpu.submap_points
        )

    def sps_config(self, batch_size: int | None = None) -> SPSConfig:
        import jax.numpy as jnp

        bs = batch_size if batch_size is not None else self.train.batch_size
        # Voxel/brick capacities in the YAML are budgeted for the training
        # batch size; smaller batches (streaming uses 1) scale down so the
        # compiled program does proportionally less work. Rounded to 512
        # (not powers of two — dense brick arrays scale linearly with the
        # cap, so pow2 rounding would waste up to 2x; only hash tables need
        # pow2 and they size themselves).
        def rup(x):
            return max(256, (x + 127) // 128 * 128)

        factor = bs / max(self.train.batch_size, 1)
        caps = Capacities(
            points=bs * (self.tpu.scan_points + self.tpu.submap_points),
            voxels=tuple(rup(int(v * factor)) for v in self.tpu.voxels),
            bricks=tuple(rup(int(v * factor)) for v in self.tpu.bricks),
        )
        return SPSConfig(
            voxel_size=self.voxel_size,
            threshold=self.threshold,
            caps=caps,
            unet=MinkUNetConfig(
                in_channels=2 if self.dist_feature else 1,
                out_channels=1,
                num_time=2,
                dtype=jnp.bfloat16 if self.tpu.bf16 else jnp.float32,
                conv_mode=self.tpu.conv_mode,
                zband_levels=self.tpu.zband_levels,
                remat=self.tpu.remat,
                int8=self.tpu.int8,
                stem_zband=self.tpu.stem_zband,
                head_fold=self.tpu.head_fold,
            ),
            engine=self.tpu.engine,
            brick_side=self.tpu.brick_side,
            atlas_extent=(bs,) + tuple(self.tpu.atlas_extent),
            row_from=self.tpu.row_from if self.tpu.row_from > 0 else None,
            dist_feature=self.dist_feature,
            dist_cap=self.dist_cap,
        )


def load(path: str, data_root: str | None = None) -> Config:
    """Load a reference-schema YAML config file."""
    with open(path) as f:
        y = yaml.safe_load(f)
    split = y.get("DATA", {}).get("SPLIT", {})
    tr = y.get("TRAIN", {})
    tpu = y.get("TPU", {})
    root = data_root or os.environ.get("DATA", "")
    return Config(
        experiment_id=y.get("EXPERIMENT", {}).get("ID", "BLT"),
        data=DataConfig(
            root=root,
            train=tuple(split.get("TRAIN", []) or []),
            val=tuple(split.get("VAL", []) or []),
            test=tuple(split.get("TEST", []) or []),
            map_file=tr.get("MAP", "base_map.asc.npy"),
            shuffle=bool(y.get("DATA", {}).get("SHUFFLE", True)),
        ),
        train=TrainConfig(
            max_epoch=int(tr.get("MAX_EPOCH", 80)),
            lr=float(tr.get("LR", 7e-5)),
            lr_epoch=int(tr.get("LR_EPOCH", 1)),
            lr_decay=float(tr.get("LR_DECAY", 0.99)),
            weight_decay=float(tr.get("WEIGHT_DECAY", 1e-4)),
            batch_size=int(tr.get("BATCH_SIZE", 2)),
            augmentation=bool(tr.get("AUGMENTATION", True)),
            stable_weight=float(tr.get("STABLE_WEIGHT", 1.0)),
            loss=str(tr.get("LOSS", "mse")).lower(),
        ),
        voxel_size=float(y.get("MODEL", {}).get("VOXEL_SIZE", 0.1)),
        threshold=float(y.get("FILTER", {}).get("THRESHOLD", 0.84)),
        dist_feature=bool(y.get("MODEL", {}).get("DIST_FEATURE", False)),
        dist_cap=float(y.get("MODEL", {}).get("DIST_CAP", 1.0)),
        tpu=TPUConfig(
            scan_points=int(tpu.get("SCAN_POINTS", TPUConfig.scan_points)),
            submap_points=int(tpu.get("SUBMAP_POINTS", TPUConfig.submap_points)),
            cell_capacity=int(tpu.get("CELL_CAPACITY", TPUConfig.cell_capacity)),
            voxels=tuple(tpu.get("VOXELS", TPUConfig.voxels)),
            bricks=tuple(tpu.get("BRICKS", TPUConfig.bricks)),
            engine=str(tpu.get("ENGINE", TPUConfig.engine)),
            brick_side=int(tpu.get("BRICK_SIDE", TPUConfig.brick_side)),
            atlas_extent=tuple(tpu.get("ATLAS_EXTENT", TPUConfig.atlas_extent)),
            conv_mode=str(tpu.get("CONV_MODE", TPUConfig.conv_mode)),
            zband_levels=int(tpu.get("ZBAND_LEVELS", TPUConfig.zband_levels)),
            row_from=int(tpu.get("ROW_FROM", TPUConfig.row_from)),
            max_per_cell=int(tpu.get("MAX_PER_CELL", TPUConfig.max_per_cell)),
            join_mode=str(tpu.get("JOIN_MODE", TPUConfig.join_mode)),
            join_extent=tuple(tpu.get("JOIN_EXTENT", TPUConfig.join_extent)),
            bf16=bool(tpu.get("BF16", False)),
            remat=bool(tpu.get("REMAT", False)),
            int8=bool(tpu.get("INT8", False)),
            topo_every=int(tpu.get("TOPO_EVERY", 0)),
            stem_zband=bool(tpu.get("STEM_ZBAND", False)),
            head_fold=bool(tpu.get("HEAD_FOLD", False)),
        ),
    )
