"""Localization loop: replay -> filter -> on-device ICP -> ATE."""

import numpy as np
import jax
import pytest

import sps_tpu.config as cfg_mod
from sps_tpu import train as tr
from sps_tpu.data import synthetic
from sps_tpu.stream import localize


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("loc"))
    synthetic.generate(
        root,
        sequences=("20220629",),
        scans_per_seq=4,
        seed=3,
        extent=10.0,
        n_rays=400,
        ground_points=6000,
        n_stable=10,
    )
    import os

    cfg = cfg_mod.load(
        os.path.join(os.path.dirname(__file__), "..", "config", "config_small.yaml"),
        data_root=root,
    )
    state = tr.create_state(cfg, jax.random.PRNGKey(0), 1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return cfg, variables


@pytest.mark.parametrize("mode", ["raw", "sps"])
def test_localization_ate(setup, mode):
    cfg, variables = setup
    out = localize.run_localization(
        cfg,
        variables,
        "20220629",
        filter_mode=mode,
        icp_iters=15,
        init_noise=0.15,
        prior="odom",
        log=lambda *a, **k: None,
    )
    # The registration must track the loop to well under a voxel-ish ATE.
    assert out["ate_rmse"] < 0.25, out
    assert out["n_scans"] == 4
    if mode == "sps":
        assert 0 < out["kept_frac_mean"] <= 1.0
    # Rows are self-describing (campaign reproducibility).
    for k in ("prior", "epsilon", "init_noise", "refine", "icp_iters", "seed"):
        assert k in out, k


def test_localization_oracle_and_cv_raw_first(setup):
    cfg, variables = setup
    # Oracle: ground-truth labels, pose-free; must register fine and
    # keep exactly the stable fraction.
    out = localize.run_localization(
        cfg, variables, "20220629", filter_mode="oracle",
        icp_iters=15, init_noise=0.15, prior="odom",
        log=lambda *a, **k: None,
    )
    assert out["ate_rmse"] < 0.25, out
    assert 0 < out["kept_frac_mean"] < 1.0
    # cv prior on a pose-consuming filter takes the raw-first two-pass
    # path; with only 4 scans the cv window is small but the path runs.
    out2 = localize.run_localization(
        cfg, variables, "20220629", filter_mode="sps",
        icp_iters=15, init_noise=0.0, prior="cv",
        log=lambda *a, **k: None,
    )
    assert out2["cv_raw_first"] is True
    assert out2["ate_rmse"] < 0.5, out2


def test_cv_predict_constant_motion():
    delta = np.eye(4)
    delta[:3, 3] = [1.0, 0.0, 0.0]
    poses = [np.eye(4)]
    for _ in range(3):
        poses.append(poses[-1] @ delta)
    # Undamped: exact extrapolation of the constant step.
    pred = localize.cv_predict(poses, damp=1.0)
    np.testing.assert_allclose(pred, poses[-1] @ delta, atol=1e-6)
    # Shipping default damps the extrapolated velocity (loop-gain cap,
    # see cv_predict docstring): poses[-1] @ exp(damp * log(delta)).
    pred_d = localize.cv_predict(poses)
    want_d = poses[-1] @ localize._se3_exp_np(
        0.85 * localize._se3_log_np(delta))
    np.testing.assert_allclose(pred_d, want_d, atol=1e-6)


def test_se3_log_exp_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        x = rng.normal(0, 0.8, 6)
        p = localize._se3_exp_np(x)
        np.testing.assert_allclose(localize._se3_log_np(p), x, atol=1e-8)


def test_cv_predict_exact_for_constant_screw():
    """The (undamped) se(3)-log mean is exact for constant-velocity screw
    motion — turning + translating (the regime where the old matrix-mean
    + SVD biased toward identity). The shipping default damps this by
    design; exactness is a property of the log-mean, tested at damp=1."""
    delta = localize._se3_exp_np(np.array([0.0, 0.0, 0.3, 1.0, 0.2, 0.0]))
    poses = [np.eye(4)]
    for _ in range(4):
        poses.append(poses[-1] @ delta)
    pred = localize.cv_predict(poses, damp=1.0)
    np.testing.assert_allclose(pred, poses[-1] @ delta, atol=1e-9)
