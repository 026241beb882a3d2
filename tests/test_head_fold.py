"""Folded 1x1 head (MinkUNetConfig.head_fold): same math, lane-friendly
layout. Scores must match the unfolded head bit-closely with shared
parameters (the fold only changes tile layout, not memory order)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sps_tpu.config import Config, DataConfig, TPUConfig, TrainConfig


def _cfg(head_fold: bool) -> Config:
    return Config(
        data=DataConfig(root="/tmp"),
        train=TrainConfig(batch_size=1, lr=1e-3),
        tpu=TPUConfig(
            scan_points=512,
            submap_points=512,
            cell_capacity=2048,
            voxels=(2048, 1024, 512, 256, 256),
            bricks=(512, 256, 256, 256, 256),
            engine="atlas",
            brick_side=8,
            atlas_extent=(24, 24, 24),
            conv_mode="halo",
            row_from=3,
            head_fold=head_fold,
        ),
    )


def test_head_fold_matches_unfolded():
    from sps_tpu.models.spsnet import SPSModel
    from sps_tpu.structs import PointBatch

    rng = np.random.default_rng(0)
    n = 1024
    pb = PointBatch(
        xyz=jnp.asarray(rng.uniform(-5, 5, (n, 3)).astype(np.float32)),
        batch=jnp.zeros((n,), jnp.int32),
        t=jnp.asarray((rng.random(n) > 0.5).astype(np.int32)),
        label=jnp.zeros((n,), jnp.float32),
        valid=jnp.ones((n,), bool),
    )
    m0 = SPSModel(_cfg(False).sps_config())
    m1 = SPSModel(_cfg(True).sps_config())
    variables = jax.jit(m0.init)(jax.random.PRNGKey(0), pb)
    s0, _ = jax.jit(lambda v, b: m0.apply(v, b))(variables, pb)
    s1, _ = jax.jit(lambda v, b: m1.apply(v, b))(variables, pb)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=2e-6)
    assert float(jnp.sum(s0)) != 0.0
