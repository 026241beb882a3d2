"""Model-level int8 parity gate: uIoU within 0.5 pt of the float path.

BASELINE.md's parity bar for any quantized/performance path is uIoU
(the reference's dIoU, util.py:297) within 0.5 pt on the eval split.
This runs the TRAINED movers checkpoint (ckpt_loc_movers, the artifact
behind the committed localization table) over a regenerated synthetic
movers sequence, once with the shipping bf16 conv path and once with
TPU.INT8 enabled, and gates the uIoU delta.

Slow tier: two full-model StreamingFilter compiles at movers capacities.
"""

import dataclasses
import os

import numpy as np
import pytest

import sps_tpu.config as cfg_mod
from sps_tpu.data import blt, synthetic
from sps_tpu.stream.engine import StreamingFilter
from sps_tpu.utils import checkpoint as ckpt

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CKPT = os.path.join(_HERE, "ckpt_loc_movers", "best")
_N_SCANS = 6  # enough points (~50k) for a stable uIoU; keeps the
# two full-model CPU evals inside the slow tier's per-file budget


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    if not os.path.isdir(_CKPT):
        pytest.skip("trained movers checkpoint not present")
    root = str(tmp_path_factory.mktemp("movers"))
    # Same generator family/params as the committed checkpoint's dataset
    # (config/config_loc_movers.yaml header), trimmed to _N_SCANS scans of
    # the val sequence; the world (map + stable structures) depends only
    # on the seed, so the trained model is in-distribution.
    synthetic.generate_dense(
        root,
        sequences=("20220608",),
        scans_per_seq=_N_SCANS,
        seed=0,
        extent=12.0,
        n_stable=14,
        map_density=140.0,
        scan_density=9.0,
        clutter_boxes=10,
        growth_boxes=4,
        mover_boxes=3,
    )
    cfg = cfg_mod.load(
        os.path.join(_HERE, "config", "config_loc_movers.yaml"), data_root=root
    )
    r = ckpt.restore(_CKPT)
    variables = {"params": r["params"], "batch_stats": r["batch_stats"]}
    scans, poses = blt.load_sequences_raw(root, ["20220608"])
    map_points = blt.load_map(root, cfg.data.map_file)
    return cfg, variables, scans, poses, map_points


def _uiou(cfg, variables, scans, poses, map_points, eps):
    filt = StreamingFilter(cfg, variables, map_points)
    ns = cfg.tpu.scan_points
    tp = fp = fn = 0
    for scan, pose in zip(scans, poses):
        n = min(len(scan), ns)
        sx = np.zeros((ns, 3), np.float32)
        sl = np.zeros((ns,), np.float32)
        sv = np.zeros((ns,), bool)
        sx[:n], sl[:n], sv[:n] = scan[:n, :3], scan[:n, 3], True
        scores, _, _ = filt(sx, sv, sl, pose.astype(np.float32))
        s = np.asarray(scores)[sv]
        lab = sl[sv]
        pred = s > eps
        true = lab > eps
        tp += int((pred & true).sum())
        fp += int((pred & ~true).sum())
        fn += int((~pred & true).sum())
    return tp / max(tp + fn + fp, 1)


def test_int8_uiou_within_half_point(setup):
    cfg, variables, scans, poses, map_points = setup
    eps = 0.9  # deployed epsilon (ckpt_loc_movers/calibration.json)
    u_f = _uiou(cfg, variables, scans, poses, map_points, eps)
    cfg8 = dataclasses.replace(
        cfg, tpu=dataclasses.replace(cfg.tpu, int8=True)
    )
    u_q = _uiou(cfg8, variables, scans, poses, map_points, eps)
    # The float baseline must itself be meaningful on this split.
    assert u_f > 0.5, u_f
    assert abs(u_f - u_q) <= 0.005, (u_f, u_q)
