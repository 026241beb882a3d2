"""Distance-to-map input feature (SPSConfig.dist_feature) + stable-weight
loss: the round-5 quality levers. The feature feeds the sub-voxel map
support distance (register.point_map_distance) as a second input channel;
growth-type change (walls offset <1 m from mapped structure) is separable
by this value where the voxel-exact overlap bit is not."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sps_tpu.config as cfg_mod
from sps_tpu import register as reg
from sps_tpu import train as tr


def _mini_cfg(**kw):
    from sps_tpu.config import Config, DataConfig, TPUConfig, TrainConfig

    return Config(
        data=DataConfig(root="/tmp"),
        train=TrainConfig(batch_size=1, lr=1e-3, **kw.pop("train_kw", {})),
        tpu=TPUConfig(
            scan_points=256,
            submap_points=256,
            cell_capacity=1024,
            voxels=(1024, 512, 256, 256, 256),
            bricks=(512, 256, 256, 256, 256),
            engine="gather",
            join_mode="hash",
        ),
        **kw,
    )


def test_point_map_distance_values():
    # Map: a wall at x=0 (yz plane patch). Query points at known offsets.
    g = np.mgrid[0:1, 0:20, 0:20].reshape(3, -1).T.astype(np.float32)
    wall = g * np.array([1.0, 0.1, 0.1], np.float32)
    vm = reg.build_voxel_map(wall, voxel_size=0.4)
    q = np.array(
        [
            [0.0, 1.0, 1.0],   # on the wall
            [0.5, 1.0, 1.0],   # 0.5 m off
            [9.0, 9.0, 9.0],   # far away -> cap
        ],
        np.float32,
    )
    d = np.asarray(
        jax.jit(lambda p: reg.point_map_distance(vm, p, jnp.ones((3,), bool)))(q)
    )
    assert d[0] < 0.25  # centroid quantization tolerance at 0.4 m cells
    assert 0.3 < d[1] < 0.75
    assert d[2] == pytest.approx(1.0)
    # Invalid points report 0.
    d2 = np.asarray(
        reg.point_map_distance(vm, jnp.asarray(q), jnp.zeros((3,), bool))
    )
    assert np.all(d2 == 0.0)


def test_dist_feature_model_and_grad_step():
    cfg = _mini_cfg(dist_feature=True)
    scfg = cfg.sps_config()
    assert scfg.unet.in_channels == 2
    rng = np.random.default_rng(0)
    state = tr.create_state(cfg, jax.random.PRNGKey(0), 1)
    # conv0 kernel has cin=2. Copy to host BEFORE train_step donates the
    # state's buffers.
    k = np.asarray(state.params["MinkUNet"]["conv0p1s1"]["kernel"])
    assert k.shape[-2] == 2
    map_points = jnp.asarray(rng.uniform(-4, 4, (2048, 3)).astype(np.float32))
    vm = reg.build_voxel_map(np.asarray(map_points), voxel_size=0.4)
    ns = cfg.tpu.scan_points
    batch = {
        "xyz": jnp.asarray(rng.uniform(-4, 4, (1, ns, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.uniform(0, 1, (1, ns)).astype(np.float32)),
        "valid": jnp.ones((1, ns), bool),
    }
    state2, m = tr.train_step(
        state, batch, map_points, jax.random.PRNGKey(1), vm,
        cfg=cfg, augment=True,
    )
    assert np.isfinite(float(m["loss"]))
    # Params moved.
    k2 = state2.params["MinkUNet"]["conv0p1s1"]["kernel"]
    assert not np.allclose(np.asarray(k), np.asarray(k2))


def test_dist_feature_streaming_separates_growth():
    """A randomly-initialized net can't test quality, but the FEATURE must
    arrive: voxel slots of scan points far from the map carry dist≈cap,
    near points ≈0 — check through the streaming engine's scatter by
    probing the model input (run the engine; scores must differ between
    a supported and an unsupported scan when only dist distinguishes
    them, i.e. both have zero map overlap at voxel level)."""
    from sps_tpu.stream.engine import StreamingFilter

    cfg = _mini_cfg(dist_feature=True)
    rng = np.random.default_rng(1)
    # Map: dense plane z=0 patch.
    xy = rng.uniform(0, 8, (40000, 2)).astype(np.float32)
    map_points = np.concatenate([xy, np.zeros((40000, 1), np.float32)], 1)
    state = tr.create_state(cfg, jax.random.PRNGKey(0), 1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    filt = StreamingFilter(cfg, variables, map_points)
    ns = cfg.tpu.scan_points
    sx = np.zeros((ns, 3), np.float32)
    sx[:, :2] = rng.uniform(1, 7, (ns, 2))
    sv = np.ones((ns,), bool)
    sl = np.zeros((ns,), np.float32)
    pose = np.eye(4, dtype=np.float32)
    # Scan A: 0.35 m above the plane (off-overlap, small dist).
    sa = sx.copy()
    sa[:, 2] = 0.35
    scores_a, _, _ = filt(sa, sv, sl, pose)
    # Scan B: same xy, 5 m up (off-overlap, dist = cap).
    sb = sx.copy()
    sb[:, 2] = 5.0
    scores_b, _, _ = filt(sb, sv, sl, pose)
    a, b = np.asarray(scores_a), np.asarray(scores_b)
    # Identical up to the dist channel -> the outputs must differ
    # substantially; without the feature they would be bit-identical
    # (same voxel topology shape, no overlap either way).
    assert np.abs(a - b).max() > 1e-4


def test_stable_weight_loss_changes_gradient():
    cfg1 = _mini_cfg()
    cfg2 = dataclasses.replace(
        cfg1, train=dataclasses.replace(cfg1.train, stable_weight=4.0)
    )
    rng = np.random.default_rng(2)
    state = tr.create_state(cfg1, jax.random.PRNGKey(0), 1)
    map_points = jnp.asarray(rng.uniform(-4, 4, (2048, 3)).astype(np.float32))
    ns = cfg1.tpu.scan_points
    batch = {
        "xyz": jnp.asarray(rng.uniform(-4, 4, (1, ns, 3)).astype(np.float32)),
        "label": jnp.asarray((rng.random((1, ns)) > 0.7).astype(np.float32)),
        "valid": jnp.ones((1, ns), bool),
    }
    # train_step donates its state buffers: give each call its own copy.
    s1 = jax.tree_util.tree_map(jnp.copy, state)
    s2 = jax.tree_util.tree_map(jnp.copy, state)
    _, m1 = tr.train_step(
        s1, batch, map_points, jax.random.PRNGKey(1), cfg=cfg1, augment=False
    )
    _, m2 = tr.train_step(
        s2, batch, map_points, jax.random.PRNGKey(1), cfg=cfg2, augment=False
    )
    assert float(m1["loss"]) != pytest.approx(float(m2["loss"]))
