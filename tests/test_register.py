"""On-device point-to-plane ICP: recovers known perturbations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sps_tpu import register as reg
from sps_tpu.data import synthetic
from sps_tpu.utils import geometry as geo


def _pose(yaw, t):
    c, s = np.cos(yaw), np.sin(yaw)
    p = np.eye(4, dtype=np.float32)
    p[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    p[:3, 3] = t
    return p


@pytest.mark.parametrize("lut", [True, False])
def test_icp_recovers_perturbation(lut):
    rng = np.random.default_rng(0)
    world = synthetic.make_world(seed=1, extent=12.0, n_stable=14, ground_points=8000)
    vmap = reg.build_voxel_map(world, voxel_size=0.4, lut=lut)
    assert (vmap.lut is not None) == lut

    # A scan = subsampled world points in a disk, expressed in a sensor
    # frame displaced by the TRUE pose; start ICP from a perturbed guess.
    sel = rng.choice(len(world), 4000, replace=False)
    pts_world = world[sel] + rng.normal(0, 0.01, (4000, 3)).astype(np.float32)
    true_pose = _pose(0.3, [1.5, -0.8, 0.1])
    inv = np.linalg.inv(true_pose)
    scan = (pts_world @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)

    guess = _pose(0.3 + 0.06, [1.5 + 0.25, -0.8 - 0.2, 0.1])
    pose, stats = jax.jit(
        lambda s, v, p: reg.register(vmap, s, v, p, iters=20)
    )(jnp.asarray(scan), jnp.ones(len(scan), bool), jnp.asarray(guess))
    pose = np.asarray(pose)

    # Translation within a few cm, rotation within ~1 degree.
    terr = np.linalg.norm(pose[:3, 3] - true_pose[:3, 3])
    rerr = np.degrees(
        np.arccos(np.clip((np.trace(pose[:3, :3] @ true_pose[:3, :3].T) - 1) / 2, -1, 1))
    )
    assert terr < 0.08, terr
    assert rerr < 1.0, rerr
    assert int(stats["inliers"]) > 2000
    assert float(stats["rmse"]) < 0.1


@pytest.mark.parametrize("lut", [True, False])
def test_icp_identity_stays_put(lut):
    world = synthetic.make_world(seed=2, extent=8.0, n_stable=8, ground_points=4000)
    vmap = reg.build_voxel_map(world, voxel_size=0.4, lut=lut)
    scan = world[::3]
    pose, stats = reg.register(
        vmap, jnp.asarray(scan), jnp.ones(len(scan), bool), jnp.eye(4), iters=5
    )
    pose = np.asarray(pose)
    assert np.linalg.norm(pose[:3, 3]) < 0.02
    np.testing.assert_allclose(pose[:3, :3], np.eye(3), atol=5e-3)


def test_normals_are_unit_and_sensible():
    world = synthetic.make_world(seed=3, extent=6.0, n_stable=4, ground_points=4000)
    vmap = reg.build_voxel_map(world, voxel_size=0.5)
    n = np.asarray(vmap.normals[: int(vmap.num_voxels)])
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)
    # Ground-plane voxels should have near-vertical normals; the ground is
    # the majority of the map.
    frac_vertical = (np.abs(n[:, 2]) > 0.9).mean()
    assert frac_vertical > 0.5


def test_smallest_evec_matches_eigh():
    """Power-iteration-on-adjugate normals vs eigh (the eigh lowering
    OOMs at 2M-voxel maps on TPU — see _smallest_evec docstring)."""
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 3, 3)).astype(np.float32)
    cov = a @ a.transpose(0, 2, 1) + 1e-6 * np.eye(3)
    cov[0] = 1e-6 * np.eye(3)  # isotropic: direction undefined, must be finite
    cov[1] = np.diag([1e-6, 1e-6, 1.0])
    cov[2] = np.diag([1.0, 1.0, 1e-6])
    v = np.asarray(reg._smallest_evec(jnp.asarray(cov)))
    assert np.isfinite(v).all()
    w, e = np.linalg.eigh(cov)
    dot = np.abs(np.sum(v * e[:, :, 0], axis=-1))
    sep = w[:, 1] / np.maximum(w[:, 0], 1e-12)
    assert (dot[sep > 2.0] > 0.99).all()
