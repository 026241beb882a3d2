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


def _sp_cfg(**kw):
    base = dataclasses.replace(
        CFG,
        engine="atlas",
        brick_side=8,
        atlas_extent=(2, 24, 24, 24),
        **kw,
    )
    return sp.sp_config(base, axis="sp")


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
