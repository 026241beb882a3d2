"""Spatial sharding (sp) parity: the spatially-sharded forward over an
8-device mesh must score identically to the single-device forward.

Covers the flagship streaming configuration (atlas engine, side-8 bricks,
aliased row levels from L3) — brick halo convs with explicit local
centers, down/up convs across the brick/row boundary, BatchNorm moment
psums — against the SAME model/params run unsharded.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from sps_tpu.models.spsnet import SPSModel
from sps_tpu.parallel import spatial as sp
from sps_tpu.parallel.mesh import make_mesh

from tests.test_minkunet import CFG, _batch


def _sp_cfg(ghost_frac=0.0, **kw):
    base = dataclasses.replace(
        CFG,
        engine="atlas",
        brick_side=8,
        atlas_extent=(2, 24, 24, 24),
        **kw,
    )
    return sp.sp_config(base, axis="sp", ghost_frac=ghost_frac)


def test_sp_forward_matches_single_device():
    rng = np.random.default_rng(7)
    pb = _batch(rng, 500)
    mesh = make_mesh(8, axis="sp")

    for kw in ({"row_from": 3}, {}):
        cfg_sp = _sp_cfg(**kw)
        cfg_1 = dataclasses.replace(cfg_sp, unet=CFG.unet)  # sp_axis=None
        model_1 = SPSModel(cfg_1)
        model_sp = SPSModel(cfg_sp)
        variables = model_1.init(jax.random.PRNGKey(0), pb)

        s1, aux1 = jax.jit(lambda v, b: model_1.apply(v, b))(variables, pb)
        fn = sp.make_sp_apply(model_sp, mesh)
        s8, overflow = fn(variables, pb)
        assert not bool(np.asarray(overflow).any())
        np.testing.assert_allclose(
            np.asarray(s8), np.asarray(s1), rtol=2e-5, atol=2e-6,
            err_msg=f"sp forward mismatch for {kw}",
        )


def _slab_batch(rng):
    """Dense two-layer slab: one jittered point per 2 m brick over a
    22x22x2 brick lattice (voxel 0.25, side 8) -> 968 occupied bricks
    spanning ALL 8 blocks of the 1024-row L0 capacity, with every brick
    having occupied neighbors, so block-boundary rows genuinely reference
    remote shards. (A small random cloud compacts into shard 0's block
    alone and exercises no exchange at all.) The jitter places points
    anywhere inside their brick, so 3^3/5^3 kernels reach across brick —
    and therefore block — boundaries; a broken exchange changes scores."""
    from sps_tpu.structs import pad_point_batch
    from tests.test_minkunet import CAPS

    xs = np.arange(-22.0, 22.0, 2.0, dtype=np.float32)
    zs = np.asarray([0.0, 2.0], np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, zs)
    n = gx.size
    base = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)
    xyz = base + rng.uniform(0, 2.0, (n, 3)).astype(np.float32)
    batch = np.zeros(n, np.int64)
    t = rng.integers(0, 2, size=n)
    label = rng.uniform(0, 1, size=n).astype(np.float32)
    return pad_point_batch(xyz, batch, t, label, CAPS.points)


def test_sp_ghost_exchange_matches_single_device():
    """Ghost-exchange mode (boundary rows via all_to_all instead of a
    full per-conv all-gather) must be numerically identical: the exchanged
    rows carry the same values the all-gather would have provided. Covers
    the aliased hybrid pyramid (row boundaries, flat-slot child remap)
    and the all-brick pyramid (parent/oct up-conv remap)."""
    rng = np.random.default_rng(13)
    pb = _slab_batch(rng)
    mesh = make_mesh(8, axis="sp")

    for kw in ({"row_from": 3}, {}):
        # At this toy scale blocks are tiny and MOST rows are remote (the
        # slab-surface argument needs production-scale blocks), so give the
        # ghost lists the full remainder (frac = n-1 -> every remote row
        # fits, overflow structurally impossible); the machinery exercised
        # (mark/compact/remap/all_to_all) is identical at any frac.
        cfg_g = _sp_cfg(ghost_frac=7.0, **kw)
        cfg_1 = dataclasses.replace(cfg_g, unet=CFG.unet)
        model_1 = SPSModel(cfg_1)
        model_g = SPSModel(cfg_g)
        variables = model_1.init(jax.random.PRNGKey(0), pb)

        s1, _ = jax.jit(lambda v, b: model_1.apply(v, b))(variables, pb)
        fn = sp.make_sp_apply(model_g, mesh)
        s8, overflow = fn(variables, pb)
        assert not bool(np.asarray(overflow).any()), f"ghost overflow {kw}"
        np.testing.assert_allclose(
            np.asarray(s8), np.asarray(s1), rtol=2e-5, atol=2e-6,
            err_msg=f"ghost sp mismatch for {kw}",
        )


def test_sp_ghost_overflow_is_reported():
    """An undersized ghost capacity must set the overflow flag (dropped
    neighbors are reported, never silent)."""
    rng = np.random.default_rng(17)
    pb = _slab_batch(rng)
    mesh = make_mesh(8, axis="sp")
    cfg_g = _sp_cfg(ghost_frac=1e-9, row_from=3)  # gcap floors at 64
    model_g = SPSModel(cfg_g)
    cfg_1 = dataclasses.replace(cfg_g, unet=CFG.unet)
    variables = SPSModel(cfg_1).init(jax.random.PRNGKey(0), pb)
    fn = sp.make_sp_apply(model_g, mesh)
    _, overflow = fn(variables, pb)
    assert bool(np.asarray(overflow).any())


def test_sp_streaming_filter_matches_single_device():
    """StreamingFilter(mesh=...) — the serving sp configuration — must
    reproduce the single-device per-scan scores, keep mask, and metrics."""
    import sps_tpu.config as cfg_mod
    from sps_tpu import train as tr
    from sps_tpu.stream.engine import StreamingFilter

    cfg = cfg_mod.Config(
        data=cfg_mod.DataConfig(root="/tmp"),
        train=cfg_mod.TrainConfig(batch_size=1),
        voxel_size=0.2,
        tpu=cfg_mod.TPUConfig(
            scan_points=1024,
            submap_points=1024,
            cell_capacity=4096,
            voxels=(4096, 2048, 1024, 512, 256),
            bricks=(1024, 512, 256, 256, 256),
            engine="atlas",
            brick_side=8,
            atlas_extent=(16, 16, 16),
            conv_mode="halo",
            row_from=3,
        ),
    )
    rng = np.random.default_rng(3)
    state = tr.create_state(cfg, jax.random.PRNGKey(0), 1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    n = 700
    scan = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    mappts = np.concatenate(
        [scan[: n // 2] + rng.normal(0, 0.02, (n // 2, 3)).astype(np.float32),
         rng.uniform(5, 9, (2000, 3)).astype(np.float32)]
    )
    ns = cfg.tpu.scan_points
    sx = np.zeros((ns, 3), np.float32)
    sv = np.zeros((ns,), bool)
    sl = np.zeros((ns,), np.float32)
    sx[:n], sv[:n] = scan, True
    pose = np.eye(4, dtype=np.float32)

    filt1 = StreamingFilter(cfg, variables, mappts)
    s1, k1, m1 = filt1(sx, sv, sl, pose)
    filt8 = StreamingFilter(cfg, variables, mappts, mesh=make_mesh(8, axis="sp"))
    s8, k8, m8 = filt8(sx, sv, sl, pose)

    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1), rtol=2e-5, atol=2e-6)
    assert np.array_equal(np.asarray(k8), np.asarray(k1))
    assert not bool(np.asarray(m8["overflow"]))
    np.testing.assert_allclose(float(m8["dIoU"]), float(m1["dIoU"]), atol=1e-6)


def test_sp_train_stats_match_single_device():
    """Train-mode forward: the BN moment psum must reproduce the global
    masked statistics (and thus identical scores + running stats)."""
    rng = np.random.default_rng(11)
    pb = _batch(rng, 400)
    mesh = make_mesh(8, axis="sp")

    cfg_sp = _sp_cfg(row_from=3)
    cfg_1 = dataclasses.replace(cfg_sp, unet=CFG.unet)
    model_1 = SPSModel(cfg_1)
    model_sp = SPSModel(cfg_sp)
    variables = model_1.init(jax.random.PRNGKey(0), pb)

    (s1, _), mut1 = jax.jit(
        lambda v, b: model_1.apply(v, b, train=True, mutable=["batch_stats"])
    )(variables, pb)

    try:
        from jax.experimental.shard_map import shard_map
    except ImportError:  # pragma: no cover
        from jax.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def body(v, b):
        (scores, _), mut = model_sp.apply(v, b, train=True, mutable=["batch_stats"])
        return scores, mut

    fn = jax.jit(
        shard_map(body, mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P()),
                  check_rep=False)
    )
    s8, mut8 = fn(variables, pb)

    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1), rtol=1e-4, atol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(mut1["batch_stats"])
    flat8 = dict(jax.tree_util.tree_leaves_with_path(mut8["batch_stats"]))
    for path, v1 in flat1:
        np.testing.assert_allclose(
            np.asarray(flat8[path]), np.asarray(v1), rtol=1e-4, atol=1e-5,
            err_msg=f"batch_stats mismatch at {jax.tree_util.keystr(path)}",
        )
