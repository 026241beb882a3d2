"""Device-side batch assembly: scan -> submap join -> combined PointBatch.

This is the jitted counterpart of the reference's BacchusDataset.__getitem__
+ collate_fn (/root/reference/src/sps/datasets/blt_dataset.py:209-244,
173-182): per sample, find map points within VOXEL_SIZE of the scan
(on-device radius join), stack [scan(t=1, label) ; submap(t=0, label=1)],
optionally augment scan+submap jointly, and emit the flat padded
PointBatch. The map stays resident in HBM; no host round trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sps_tpu.config import Config
from sps_tpu.ops import augment as aug
from sps_tpu.ops import radius as rad
from sps_tpu.structs import PointBatch

SCAN_T = 1
MAP_T = 0


def assemble_batch(
    scan_xyz: jnp.ndarray,  # (B, Ns, 3) map frame
    scan_label: jnp.ndarray,  # (B, Ns)
    scan_valid: jnp.ndarray,  # (B, Ns)
    map_points: jnp.ndarray,  # (M, 3) resident
    cfg: Config,
    rng: jax.Array | None = None,
    map_vm=None,  # register.VoxelMap: per-point distance feature source
) -> tuple[PointBatch, dict]:
    """Returns (PointBatch of capacity B*(Ns+Sub), aux counters)."""
    bsz, ns, _ = scan_xyz.shape
    sub = cfg.tpu.submap_points
    m = map_points.shape[0]
    map_valid = jnp.ones((m,), bool)

    def one(sxyz, svalid):
        if cfg.tpu.join_mode == "dense":
            mask, dropped = rad.radius_join_dense(
                sxyz, svalid, map_points, map_valid, cfg.voxel_size,
                extent=cfg.tpu.join_extent,
            )
        else:
            mask, dropped = rad.radius_join(
                sxyz,
                svalid,
                map_points,
                map_valid,
                cfg.voxel_size,
                cell_capacity=cfg.tpu.cell_capacity,
                max_per_cell=cfg.tpu.max_per_cell,
            )
        idx, subvalid, overflow = rad.compact_mask(mask, sub)
        sub_xyz = map_points[idx] * subvalid[:, None].astype(map_points.dtype)
        return sub_xyz, subvalid, overflow, dropped

    sub_xyz, sub_valid, sub_overflow, dropped = jax.vmap(one)(scan_xyz, scan_valid)

    xyz = jnp.concatenate([scan_xyz, sub_xyz], axis=1)  # (B, Ns+Sub, 3)
    dist = None
    if map_vm is not None:
        # Distance-to-map feature, computed BEFORE augmentation (the
        # joint rotation/scale below leaves the map frame, but the
        # feature is the physical map-support distance of the original
        # geometry — invariant data, like the label). Submap points are
        # map points, so theirs is ~0 by construction.
        from sps_tpu import register as reg

        valid_all = jnp.concatenate([scan_valid, sub_valid], axis=1)
        dist = jax.vmap(
            lambda p, v: reg.point_map_distance(map_vm, p, v)
        )(xyz, valid_all)
    if rng is not None:
        mats = jax.vmap(aug.augmentation_matrix)(jax.random.split(rng, bsz))
        xyz = jnp.einsum("bnc,bcd->bnd", xyz, mats)

    # Submap labels are constant 1 (blt_dataset.py:229).
    label = jnp.concatenate([scan_label, jnp.ones((bsz, sub), scan_label.dtype)], 1)
    t = jnp.concatenate(
        [
            jnp.full((bsz, ns), SCAN_T, jnp.int32),
            jnp.full((bsz, sub), MAP_T, jnp.int32),
        ],
        axis=1,
    )
    valid = jnp.concatenate([scan_valid, sub_valid], axis=1)
    batch_idx = jnp.broadcast_to(
        jnp.arange(bsz, dtype=jnp.int32)[:, None], (bsz, ns + sub)
    )

    flat = PointBatch(
        xyz=xyz.reshape(-1, 3),
        batch=batch_idx.reshape(-1),
        t=t.reshape(-1),
        label=label.reshape(-1),
        valid=valid.reshape(-1),
        dist=dist.reshape(-1) if dist is not None else None,
    )
    aux = {
        "submap_overflow": jnp.sum(sub_overflow),
        "cell_dropped": jnp.sum(dropped),
        "submap_count": jnp.sum(sub_valid.astype(jnp.int32)),
    }
    return flat, aux
