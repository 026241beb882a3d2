"""Rotation-heavy localization: sharp yaw changes under the CV prior.

The constant-velocity prior (localize.cv_predict, the reference's CVM node
sps_node_cvm.py:87-109) averages recent relative motions; its chordal mean
is exact for constant motion but only approximate when the yaw rate
CHANGES. A corner-turn trajectory (straight -> 25 deg/step turn ->
straight) exercises exactly that transient: the prior overshoots at turn
onset and the coarse ICP pyramid level must pull the estimate back.
"""

import os

import numpy as np
import jax
import pytest

import sps_tpu.config as cfg_mod
from sps_tpu import train as tr
from sps_tpu.data import synthetic
from sps_tpu.stream import localize


def _write_turn_sequence(root, seq="turns", n_straight=3, n_turn=4,
                         yaw_step=np.deg2rad(25.0), step_m=0.8, seed=11):
    """BLT-layout sequence along a corner: straight, sharp turn, straight."""
    rng = np.random.default_rng(seed)
    stable = synthetic.make_world(seed=seed, extent=10.0, n_stable=12,
                                 ground_points=8000)
    os.makedirs(os.path.join(root, "maps"), exist_ok=True)
    np.save(os.path.join(root, "maps", "base_map.asc.npy"),
            np.concatenate([stable, np.zeros((len(stable), 1), np.float32)], 1))
    sdir = os.path.join(root, "sequence", seq)
    os.makedirs(os.path.join(sdir, "scans"), exist_ok=True)
    os.makedirs(os.path.join(sdir, "poses"), exist_ok=True)
    np.savetxt(os.path.join(sdir, "map_transform"), np.eye(4), delimiter=",")

    yaw = 0.0
    xy = np.array([-4.0, -4.0])
    clutter = np.zeros((0, 3), np.float32)
    n_total = n_straight + n_turn + 2
    for i in range(n_total):
        if n_straight <= i < n_straight + n_turn:
            yaw += yaw_step  # the sharp corner
        xy = xy + step_m * np.array([np.cos(yaw), np.sin(yaw)])
        c, s = np.cos(yaw), np.sin(yaw)
        pose = np.eye(4)
        pose[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        pose[:2, 3] = xy
        pts_world, labels = synthetic.sample_scan(
            rng, stable, clutter, xy, n_rays=500, max_r=12.0)
        inv = np.linalg.inv(pose)
        pts = pts_world @ inv[:3, :3].T + inv[:3, 3]
        np.save(os.path.join(sdir, "scans", f"{i:06d}.npy"),
                np.concatenate([pts, labels[:, None]], 1).astype(np.float32))
        np.savetxt(os.path.join(sdir, "poses", f"{i:06d}.txt"), pose,
                   delimiter=",")
    return n_total


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("turns"))
    n = _write_turn_sequence(root)
    cfg = cfg_mod.load(
        os.path.join(os.path.dirname(__file__), "..", "config",
                     "config_small.yaml"),
        data_root=root,
    )
    return cfg, n


def test_cv_prior_tracks_sharp_turns(setup):
    cfg, n = setup
    state = tr.create_state(cfg, jax.random.PRNGKey(0), 1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = localize.run_localization(
        cfg, variables, "turns", filter_mode="raw", icp_iters=15,
        prior="cv", log=lambda *a, **k: None,
    )
    assert out["n_scans"] == n
    # Bounded through the corner: the cv prior's transient error at turn
    # onset (~step_m * yaw_step ~ 0.35 m lateral) must be recovered by the
    # pyramid; a diverged track would be >= one step (0.8 m).
    assert out["ate_rmse"] < 0.3, out


def test_cv_predict_constant_turn_exact():
    """Constant yaw-rate motion: all window deltas equal, so the se(3)
    log-mean is exact — tested undamped (damp=1); the shipping default
    deliberately damps the extrapolation (see cv_predict docstring)."""
    yaw = np.deg2rad(25.0)
    c, s = np.cos(yaw), np.sin(yaw)
    delta = np.eye(4)
    delta[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    delta[:3, 3] = [0.8, 0.1, 0.0]
    poses = [np.eye(4)]
    for _ in range(4):
        poses.append(poses[-1] @ delta)
    pred = localize.cv_predict(poses, damp=1.0)
    np.testing.assert_allclose(pred, poses[-1] @ delta, atol=1e-8)


def test_cv_predict_varying_yaw_stays_orthonormal():
    """Mixed yaw rates in the window: the matrix mean is NOT a rotation;
    cv_predict must still return a proper SE(3) (orthonormal R, det +1)
    within a bounded angle of the latest delta."""
    poses = [np.eye(4)]
    for yaw_deg in (0.0, 10.0, 25.0, 40.0):
        yaw = np.deg2rad(yaw_deg)
        c, s = np.cos(yaw), np.sin(yaw)
        d = np.eye(4)
        d[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        d[:3, 3] = [0.8, 0.0, 0.0]
        poses.append(poses[-1] @ d)
    pred = localize.cv_predict(poses)
    r = pred[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-8)
    assert np.linalg.det(r) > 0.999
    # Predicted delta yaw within the window's yaw-rate range.
    dlast = np.linalg.inv(poses[-1]) @ pred
    yaw_pred = np.arctan2(dlast[1, 0], dlast[0, 0])
    assert np.deg2rad(5.0) <= yaw_pred <= np.deg2rad(45.0)
