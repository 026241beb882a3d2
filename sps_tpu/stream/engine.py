"""Streaming per-scan filter engine (the reference's online node, on TPU).

Replaces the ROS pipeline of sps_node.py
(/root/reference/c_ws/src/sps_filter/scripts/sps_node.py:88-176): per scan
  1. transform to map frame with the current pose        (step 1-2)
  2. voxelize; overlap-test against the resident map     (step 3, "prune")
  3. MinkUNet stability scores, devoxelized to points    (step 4)
  4. loss/R2/dIoU metrics vs intensity-as-label          (step 5)
  5. threshold filter: keep scores <= epsilon            (step 6)

TPU-native redesign: the reference materializes a submap point cloud from
the overlap voxels (util.py:85-114) and re-voxelizes it inside the model.
Because overlap voxels are by construction the scan's own voxels, the
whole prune step collapses to ONE hash lookup per scan voxel against a
prebuilt map-voxel table: the model consumes the scan grid with its
map-occupancy bit set. No submap cloud, no second voxelization, no
host round trips — a single jitted function per scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sps_tpu.config import Config
from sps_tpu.models.spsnet import SPSModel
from sps_tpu.ops import hash as vhash
from sps_tpu.ops import voxelize as vox
from sps_tpu.utils import metrics as met
from sps_tpu.utils.geometry import transform_points


def _point_dist(map_vm, xyz, valid, scfg):
    """Per-point distance-to-map feature (None when the feature is off);
    xyz already in the map frame."""
    if map_vm is None:
        return None
    from sps_tpu import register as reg

    return reg.point_map_distance(map_vm, xyz, valid, cap=scfg.dist_cap)


def build_map_table(map_points: np.ndarray, voxel_size: float, capacity: int | None = None):
    """Voxelize the map once; returns its HashTable (resident in HBM).

    Equivalent of the reference's one-time to_coords_features(map) at
    sps_node.py:68-74.

    NOTE: num_voxels is returned as a DEVICE scalar, deliberately not
    fetched — on the axon runtime the first device->host literal fetch
    permanently degrades the session to ~35 ms per dispatch, which
    multiplies into every while-loop iteration afterwards (measured 33 s
    per scan vs 30 ms clean). Fetch it only after timing-critical work.
    """
    m = len(map_points)
    if capacity is None:
        capacity = vhash.next_pow2(m)

    @jax.jit
    def build(points):
        coords = vox.quantize(points, voxel_size)
        grid, _, _ = vox.voxelize(
            coords,
            jnp.zeros((m,), jnp.int32),
            jnp.zeros((m,), jnp.int32),
            jnp.ones((m,), bool),
            num_time=1,
            voxel_capacity=capacity,
        )
        return grid.table, grid.num_voxels

    table, nvox = build(jnp.asarray(map_points))
    return table, nvox


def build_map_bricks(
    map_points: np.ndarray,
    voxel_size: float,
    capacity: int | None = None,
    brick_side: int = 4,
):
    """Brick-engine map residency: one-time brick grid of the map whose
    per-voxel occupancy masks answer the overlap ("prune") query with a
    single brick-table lookup per scan brick."""
    from sps_tpu.ops import brick as bk

    m = len(map_points)
    if capacity is None:
        # LiDAR maps are surface-like: occupied bricks scale ~1/side^2
        # (measured: 69k/17.4k/4.4k bricks at side 4/8/16 for a 1.23M-point
        # map). m/(2*side^2) gives ~2x headroom over that.
        capacity = vhash.next_pow2(max(2 * m // (brick_side * brick_side), 1024))

    @jax.jit
    def build(points):
        coords = vox.quantize(points, voxel_size)
        grid, _ = bk.voxelize_bricks(
            coords,
            jnp.zeros((m,), jnp.int32),
            jnp.zeros((m,), jnp.int32),
            jnp.ones((m,), bool),
            num_time=1,
            brick_capacity=capacity,
            brick_side=brick_side,
        )
        return grid

    return build(jnp.asarray(map_points))


def build_map_atlas(
    map_points: np.ndarray,
    voxel_size: float,
    brick_side: int,
    capacity: int | None = None,
):
    """Atlas-mode map residency: dense AABB brick grid of the map (the
    window extent is computed on the host from the map's bounding box —
    static per deployment). Overlap queries become one dense gather."""
    from sps_tpu.ops import atlas as atl
    from sps_tpu.ops import brick as bk  # noqa: F401 (BrickLevel reuse)

    m = len(map_points)
    if capacity is None:
        capacity = vhash.next_pow2(max(2 * m // (brick_side * brick_side), 1024))
    bc_min = np.floor(map_points.min(axis=0) / voxel_size).astype(np.int64) >> int(
        np.log2(brick_side)
    )
    bc_max = np.floor(map_points.max(axis=0) / voxel_size).astype(np.int64) >> int(
        np.log2(brick_side)
    )
    ext = tuple(int(x) for x in (bc_max - bc_min + 2))
    extent = (1,) + ext

    @jax.jit
    def build(points):
        coords = vox.quantize(points, voxel_size)
        grid, _ = atl.voxelize_bricks(
            coords,
            jnp.zeros((m,), jnp.int32),
            jnp.zeros((m,), jnp.int32),
            jnp.ones((m,), bool),
            num_time=1,
            brick_capacity=capacity,
            brick_side=brick_side,
            extent=extent,
        )
        return grid

    return build(jnp.asarray(map_points))


class StreamingFilter:
    """Holds the resident map + compiled per-scan function.

    batch > 1 processes that many scans per dispatch (each with its own
    pose). Measured reality (docs/DESIGN.md §7): level capacities scale
    linearly with batch, so DEVICE time is linear in scans (batch=4 ≈ 4x
    batch-1) — batching amortizes only the per-dispatch host/link
    overhead, which pipelined dispatch of batch-1 programs (bench.py's
    throughput protocol) already achieves without adding latency. Keep
    batch=1 for serving; batch>1 exists for offline bulk scoring where a
    single dispatch per N scans simplifies the driver. The reference node
    is strictly one scan at a time (sps_node.py:88)."""

    def __init__(
        self,
        cfg: Config,
        variables,
        map_points: np.ndarray,
        batch: int = 1,
        mesh=None,
        sp_axis: str = "sp",
        sp_ghost_frac: float = 0.0,
    ):
        self.cfg = cfg
        self.batch = batch
        # Streaming uses scan-only voxel capacity (no submap cloud).
        self.sps_cfg = cfg.sps_config(batch_size=batch)
        # mesh: spread each scan's brick axis over a device mesh (spatial
        # sharding, parallel/spatial.py) — the serving configuration for
        # multi-chip latency scaling. The per-scan function is shard_mapped
        # with replicated inputs; each chip computes its brick-slab block
        # of every conv, assembling sources with per-conv all-gathers
        # (sp_ghost_frac=0) or boundary-only ghost exchanges (> 0).
        self.mesh = mesh
        self.sp_axis = sp_axis
        if mesh is not None:
            from sps_tpu.parallel import spatial as sp_mod

            self.sps_cfg = sp_mod.sp_config(
                self.sps_cfg, sp_axis, ghost_frac=sp_ghost_frac
            )
        self.model = SPSModel(self.sps_cfg)
        self.variables = variables
        # Distance-to-map input feature (SPSConfig.dist_feature): one
        # registration-style LUT gather per point, map frame.
        self.map_vm = None
        if self.sps_cfg.dist_feature:
            if mesh is not None:
                raise ValueError(
                    "dist_feature under spatial sharding is not implemented"
                )
            from sps_tpu import register as reg

            self.map_vm = reg.build_voxel_map(
                np.asarray(map_points), voxel_size=4 * cfg.voxel_size
            )
        # Topology-reuse policy (atlas engine, single device): dispatch
        # the cheap cached-topology program (see _make_atlas_reuse_fn) and
        # rebuild the pyramid every `topo_every` scans. 0 disables. The
        # consumer reads stats["topo_miss_points"] one scan behind (the
        # pipelined protocol) and calls invalidate() to force an early
        # rebuild when misses exceed its tolerance.
        self.topo_every = (
            getattr(cfg.tpu, "topo_every", 0)
            if cfg.tpu.engine == "atlas" and mesh is None
            else 0
        )
        self._topo_cache = None
        self._dispatch_i = 0
        if cfg.tpu.engine == "atlas":
            self.map_grid = build_map_atlas(
                map_points, cfg.voxel_size, cfg.tpu.brick_side
            )
            self._fn = self._make_atlas_fn(with_cache=self.topo_every > 0)
            self._reuse_fn = (
                self._make_atlas_reuse_fn() if self.topo_every > 0 else None
            )
        elif cfg.tpu.engine == "brick":
            self.map_grid = build_map_bricks(
                map_points, cfg.voxel_size, brick_side=cfg.tpu.brick_side
            )
            self._fn = self._make_brick_fn()
        else:
            self.map_table, self.map_voxels = build_map_table(
                map_points, cfg.voxel_size
            )
            self._fn = self._make_gather_fn()
        self.eps = cfg.threshold

    def _wrap(self, fn):
        """Compile the per-scan function: plain jit single-device, or
        shard_map over the mesh with replicated in/out (the brick-axis
        sharding is internal to the model — parallel/spatial.py)."""
        if self.mesh is None:
            return jax.jit(fn)
        try:
            from jax.experimental.shard_map import shard_map
        except ImportError:  # pragma: no cover
            from jax.shard_map import shard_map  # type: ignore
        from jax.sharding import PartitionSpec as P

        return jax.jit(
            shard_map(
                fn,
                mesh=self.mesh,
                in_specs=(P(),) * 7,
                out_specs=P(),
                check_rep=False,
            )
        )

    def _make_atlas_fn(self, with_cache: bool = False):
        """with_cache: also return the (levels, map-occupancy) topology
        cache consumed by the reuse program — only when the reuse policy
        is active (the cache outputs are extra full-pyramid HBM writes)."""
        from sps_tpu.models.spsnet import build_levels_from_grid
        from sps_tpu.ops import atlas as atl
        from sps_tpu.ops import brick as bk

        cfg = self.cfg
        model = self.model
        vsize = cfg.voxel_size
        scfg = self.sps_cfg
        bcap = scfg.caps.bricks[0]

        def fn(variables, map_grid, scan_xyz, valid, labels, poses, eps,
               map_vm=None):
            # scan_xyz (NB, n, 3); poses (NB, 4, 4); valid/labels (NB, n).
            nb, n = scan_xyz.shape[:2]
            xyz = (
                jnp.einsum("bij,bnj->bni", poses[:, :3, :3], scan_xyz)
                + poses[:, None, :3, 3]
            )
            vflat = valid.reshape(nb * n)
            pdist = _point_dist(map_vm, xyz.reshape(nb * n, 3), vflat, scfg)
            coords = vox.quantize(xyz.reshape(nb * n, 3), vsize)
            batch_idx = jnp.repeat(jnp.arange(nb, dtype=jnp.int32), n)
            grid, p2s = atl.voxelize_bricks(
                coords,
                batch_idx,
                jnp.ones((nb * n,), jnp.int32),  # scan time slot = 1
                vflat,
                num_time=2,
                brick_capacity=bcap,
                brick_side=scfg.brick_side,
                extent=scfg.atlas_extent,
            )
            # Overlap "prune": one dense map-atlas gather per scan brick
            # (the map atlas has a single batch slot -> query batch 0).
            bvalid = jnp.arange(bcap) < grid.num_bricks
            batch0 = jnp.where(bvalid, 0, -1)
            mrow = atl.atlas_rows(map_grid, batch0, grid.coords[:, 1:])
            mocc = bk.take_rows(map_grid.occ, mrow)[..., 0]
            overlap = grid.occ[..., 1] * mocc
            occ = grid.occ.at[..., 0].set(overlap)
            grid2 = grid._replace(occ=occ)
            levels, lvl_overflow = build_levels_from_grid(grid2, scfg)
            scores, aux = model.apply(
                variables,
                levels=levels,
                p2v=p2s,
                t_idx=jnp.ones((nb * n,), jnp.int32),
                valid=vflat,
                point_dist=pdist,
            )
            keep = (scores <= eps) & vflat  # sps_node.py:148
            stats = {
                "loss": met.masked_mse(scores, labels.reshape(-1), vflat),
                "r2": met.masked_r2(scores, labels.reshape(-1), vflat),
                **met.classification_metrics(scores, labels.reshape(-1), vflat, eps),
                "n_scan_voxels": jnp.sum(grid.occ[..., 1], dtype=jnp.float32).astype(jnp.int32),
                "n_submap_voxels": jnp.sum(overlap, dtype=jnp.float32).astype(jnp.int32),
                "n_kept": jnp.sum(keep.astype(jnp.int32)),
                "overflow": jnp.any(aux["overflow"]) | jnp.any(lvl_overflow),
                "topo_miss_points": jnp.zeros((), jnp.int32),
            }
            out = scores.reshape(nb, n), keep.reshape(nb, n), stats
            return out + ((levels, mocc),) if with_cache else out

        return jax.jit(fn) if (with_cache and self.mesh is None) else self._wrap(fn)

    def _make_atlas_reuse_fn(self):
        """Per-scan function over a CACHED topology pyramid (the dominant
        dispatch of the topology-reuse policy; see __call__).

        Consecutive sensor-rate scans share almost all bricks, but the
        full path rebuilds the pyramid from scratch every scan (~5 ms of
        topology + the L0 compaction inside voxelize). Topology depends
        only on the brick SET, so this program replaces all of it with ONE
        dense-atlas gather per point (row lookup on the cached grid) + the
        occupancy scatter + atl.refresh_occupancy — bit-identical scores
        whenever the cached set covers the scan. Points whose brick is NOT
        covered are counted in stats.topo_miss_points (their score
        devoxelizes to sigmoid(0) = 0.5); the caller's rebuild policy
        bounds how long such fringe points can persist."""
        from sps_tpu.ops import atlas as atl

        cfg = self.cfg
        model = self.model
        vsize = cfg.voxel_size
        scfg = self.sps_cfg
        bcap = scfg.caps.bricks[0]
        bs = scfg.brick_side
        shift = bs.bit_length() - 1
        bvol = bs**3

        def fn(variables, levels, mocc, scan_xyz, valid, labels, poses, eps,
               map_vm=None):
            nb, n = scan_xyz.shape[:2]
            xyz = (
                jnp.einsum("bij,bnj->bni", poses[:, :3, :3], scan_xyz)
                + poses[:, None, :3, 3]
            )
            vflat = valid.reshape(nb * n)
            pdist = _point_dist(map_vm, xyz.reshape(nb * n, 3), vflat, scfg)
            coords = vox.quantize(xyz.reshape(nb * n, 3), vsize)
            batch_idx = jnp.repeat(jnp.arange(nb, dtype=jnp.int32), n)
            l0 = levels[0].grid
            bc = coords >> shift
            local = coords & (bs - 1)
            p2b = atl.atlas_rows(l0, batch_idx, bc)
            p2b = jnp.where(vflat, p2b, vhash.EMPTY)
            miss = vflat & (p2b < 0)
            lflat = (local[:, 0] * bs + local[:, 1]) * bs + local[:, 2]
            point2slot = jnp.where(p2b >= 0, p2b * bvol + lflat, vhash.EMPTY)
            pb = jnp.where(p2b >= 0, p2b, bcap)
            occ = (
                jnp.zeros((bcap + 1, bvol, 2), jnp.float32)
                .at[pb, lflat, 1]
                .max(vflat.astype(jnp.float32))
            )[:bcap].reshape(bcap, bs, bs, bs, 2)
            occ = occ.astype(l0.occ.dtype)
            overlap = occ[..., 1] * mocc
            occ = occ.at[..., 0].set(overlap)
            levels2 = atl.refresh_occupancy(levels, occ)
            scores, aux = model.apply(
                variables,
                levels=levels2,
                p2v=point2slot,
                t_idx=jnp.ones((nb * n,), jnp.int32),
                valid=vflat,
                point_dist=pdist,
            )
            keep = (scores <= eps) & vflat
            stats = {
                "loss": met.masked_mse(scores, labels.reshape(-1), vflat),
                "r2": met.masked_r2(scores, labels.reshape(-1), vflat),
                **met.classification_metrics(scores, labels.reshape(-1), vflat, eps),
                "n_scan_voxels": jnp.sum(occ[..., 1], dtype=jnp.float32).astype(jnp.int32),
                "n_submap_voxels": jnp.sum(overlap, dtype=jnp.float32).astype(jnp.int32),
                "n_kept": jnp.sum(keep.astype(jnp.int32)),
                "overflow": jnp.any(aux["overflow"]),
                "topo_miss_points": jnp.sum(miss.astype(jnp.int32)),
            }
            return scores.reshape(nb, n), keep.reshape(nb, n), stats

        return jax.jit(fn)

    def _make_brick_fn(self):
        from sps_tpu.ops import brick as bk

        cfg = self.cfg
        model = self.model
        vsize = cfg.voxel_size
        bcap = self.sps_cfg.caps.bricks[0]

        def fn(variables, map_grid, scan_xyz, valid, labels, pose, eps,
               map_vm=None):
            xyz = transform_points(scan_xyz, pose)
            pdist = _point_dist(map_vm, xyz, valid, self.sps_cfg)
            coords = vox.quantize(xyz, vsize)
            n = scan_xyz.shape[0]
            grid, p2s = bk.voxelize_bricks(
                coords,
                jnp.zeros((n,), jnp.int32),
                jnp.ones((n,), jnp.int32),  # scan time slot = 1
                valid,
                num_time=2,
                brick_capacity=bcap,
                brick_side=cfg.tpu.brick_side,
            )
            # Overlap "prune": one map-brick lookup per scan brick; the
            # map channel's occupancy = scan-voxel AND map-voxel.
            bvalid = jnp.arange(bcap) < grid.num_bricks
            mrow = vhash.lookup(map_grid.table, grid.coords, bvalid)
            mocc = bk.take_rows(map_grid.occ, mrow)[..., 0]  # (B,4,4,4)
            overlap = grid.occ[..., 1] * mocc
            occ = grid.occ.at[..., 0].set(overlap)
            grid2 = grid._replace(occ=occ)
            scores, aux = model.apply(
                variables,
                grid=grid2,
                p2v=p2s,
                t_idx=jnp.ones((n,), jnp.int32),
                valid=valid,
                point_dist=pdist,
            )
            keep = (scores <= eps) & valid  # sps_node.py:148
            stats = {
                "loss": met.masked_mse(scores, labels, valid),
                "r2": met.masked_r2(scores, labels, valid),
                **met.classification_metrics(scores, labels, valid, eps),
                "n_scan_voxels": jnp.sum(grid.occ[..., 1], dtype=jnp.float32).astype(jnp.int32),
                "n_submap_voxels": jnp.sum(overlap, dtype=jnp.float32).astype(jnp.int32),
                "n_kept": jnp.sum(keep.astype(jnp.int32)),
                "overflow": jnp.any(aux["overflow"]),
            }
            return scores, keep, stats

        return self._wrap(fn)

    def _make_gather_fn(self):
        cfg = self.cfg
        model = self.model
        vsize = cfg.voxel_size
        vcap = self.sps_cfg.caps.voxels[0]

        def fn(variables, map_table, scan_xyz, valid, labels, pose, eps,
               map_vm=None):
            xyz = transform_points(scan_xyz, pose)
            pdist = _point_dist(map_vm, xyz, valid, self.sps_cfg)
            coords = vox.quantize(xyz, vsize)
            n = scan_xyz.shape[0]
            grid, p2v, _ = vox.voxelize(
                coords,
                jnp.zeros((n,), jnp.int32),
                jnp.ones((n,), jnp.int32),  # scan time slot = 1
                valid,
                num_time=2,
                voxel_capacity=vcap,
            )
            rows_valid = jnp.arange(vcap) < grid.num_voxels
            overlap = vhash.lookup(map_table, grid.coords, rows_valid) >= 0
            occ = grid.occ.at[:, 0].set(
                (overlap & rows_valid).astype(grid.occ.dtype)
            )
            grid2 = grid._replace(occ=occ)
            scores, aux = model.apply(
                variables,
                grid=grid2,
                p2v=p2v,
                t_idx=jnp.ones((n,), jnp.int32),
                valid=valid,
                point_dist=pdist,
            )
            keep = (scores <= eps) & valid  # sps_node.py:148
            stats = {
                "loss": met.masked_mse(scores, labels, valid),
                "r2": met.masked_r2(scores, labels, valid),
                **met.classification_metrics(scores, labels, valid, eps),
                "n_scan_voxels": grid.num_voxels,
                "n_submap_voxels": jnp.sum((overlap & rows_valid).astype(jnp.int32)),
                "n_kept": jnp.sum(keep.astype(jnp.int32)),
                "overflow": jnp.any(aux["overflow"]),
            }
            return scores, keep, stats

        return self._wrap(fn)

    def __call__(self, scan_xyz, valid, labels, pose):
        """Run one scan (n, 3) or a batch (NB, n, 3) of scans (atlas
        engine only for batched); returns (scores, keep, stats) device
        arrays of matching leading shape. Callers time with
        block_until_ready."""
        scan_xyz = jnp.asarray(scan_xyz)
        squeeze = False
        if self.cfg.tpu.engine == "atlas":
            if scan_xyz.ndim == 2:
                squeeze = True
                scan_xyz = scan_xyz[None]
                valid = jnp.asarray(valid)[None]
                labels = jnp.asarray(labels)[None]
                pose = jnp.asarray(pose)[None]
        eps = jnp.asarray(self.eps, jnp.float32)
        args = (
            scan_xyz,
            jnp.asarray(valid),
            jnp.asarray(labels),
            jnp.asarray(pose),
            # eps as a traced argument: every threshold shares ONE compiled
            # program (the epsilon sweep would otherwise recompile per value).
            eps,
        )
        # map_vm only when the feature is on: the shard_map path's
        # in_specs are positional-only, and jit treats each call
        # signature independently.
        kw = {} if self.map_vm is None else {"map_vm": self.map_vm}
        if self.topo_every > 0:
            reuse = (
                self._topo_cache is not None
                and self._dispatch_i % self.topo_every != 0
            )
            self._dispatch_i += 1
            if reuse:
                scores, keep, stats = self._reuse_fn(
                    self.variables, *self._topo_cache, *args, **kw
                )
            else:
                scores, keep, stats, cache = self._fn(
                    self.variables, self.map_grid, *args, **kw
                )
                self._topo_cache = cache
        else:
            scores, keep, stats = self._fn(
                self.variables,
                self.map_grid
                if self.cfg.tpu.engine in ("atlas", "brick")
                else self.map_table,
                *args,
                **kw,
            )
        if squeeze:
            scores, keep = scores[0], keep[0]
        return scores, keep, stats

    def invalidate(self):
        """Force the next dispatch to rebuild topology (the consumer's
        miss-policy hook; see topo_every)."""
        self._topo_cache = None
        self._dispatch_i = 0
