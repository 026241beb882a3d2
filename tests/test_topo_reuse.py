"""Streaming topology reuse: cached-pyramid dispatches are bit-exact.

The reuse program (stream/engine.py _make_atlas_reuse_fn) replaces the
per-scan topology rebuild with one dense-atlas row gather + occupancy
refresh (ops.atlas.refresh_occupancy). Exactness claim: whenever the
cached brick set covers the scan, scores match a full rebuild bitwise
(phantom bricks contribute exact zeros through every masked layer).
Uncovered points must be counted in stats.topo_miss_points.
"""

import dataclasses
import os

import numpy as np
import pytest

import sps_tpu.config as cfg_mod
from sps_tpu.data import blt, synthetic
from sps_tpu.stream.engine import StreamingFilter

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import jax

    from sps_tpu import train as tr

    root = str(tmp_path_factory.mktemp("topo"))
    synthetic.generate(
        root, sequences=("20220629",), scans_per_seq=3, seed=3,
        extent=10.0, n_rays=400, ground_points=6000, n_stable=10,
    )
    cfg = cfg_mod.load(
        os.path.join(_HERE, "config", "config_small.yaml"), data_root=root
    )
    # The small config ships the gather engine (CPU-cheap); reuse is an
    # atlas-engine policy.
    cfg = dataclasses.replace(
        cfg, tpu=dataclasses.replace(cfg.tpu, engine="atlas")
    )
    state = tr.create_state(cfg, jax.random.PRNGKey(0), 1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    scans, poses = blt.load_sequences_raw(root, ["20220629"])
    mp = blt.load_map(root, cfg.data.map_file)
    return cfg, variables, scans, poses, mp


def _pad(scan, ns):
    n = min(len(scan), ns)
    sx = np.zeros((ns, 3), np.float32)
    sl = np.zeros((ns,), np.float32)
    sv = np.zeros((ns,), bool)
    sx[:n], sl[:n], sv[:n] = scan[:n, :3], scan[:n, 3], True
    return sx, sv, sl


def test_reuse_matches_full_rebuild_bitwise(setup):
    cfg, variables, scans, poses, mp = setup
    ns = cfg.tpu.scan_points
    cfg_r = dataclasses.replace(
        cfg, tpu=dataclasses.replace(cfg.tpu, topo_every=4)
    )
    f_reuse = StreamingFilter(cfg_r, variables, mp)
    f_full = StreamingFilter(cfg, variables, mp)
    pose = poses[0].astype(np.float32)
    sxA, svA, slA = _pad(scans[0], ns)
    # Scan B: a random subset of scan A's points — its brick set is
    # covered by the cache built from A, so reuse must be exact.
    rng = np.random.default_rng(0)
    svB = svA & (rng.random(ns) < 0.6)

    _ = f_reuse(sxA, svA, slA, pose)  # dispatch 0: rebuild, cache
    sB, kB, stB = f_reuse(sxA, svB, slA, pose)  # dispatch 1: reuse
    s0, k0, st0 = f_full(sxA, svB, slA, pose)
    assert int(stB["topo_miss_points"]) == 0
    np.testing.assert_array_equal(np.asarray(sB), np.asarray(s0))
    np.testing.assert_array_equal(np.asarray(kB), np.asarray(k0))


def test_reuse_counts_misses_and_rebuild_recovers(setup):
    cfg, variables, scans, poses, mp = setup
    ns = cfg.tpu.scan_points
    cfg_r = dataclasses.replace(
        cfg, tpu=dataclasses.replace(cfg.tpu, topo_every=4)
    )
    filt = StreamingFilter(cfg_r, variables, mp)
    pose = poses[0].astype(np.float32)
    sxA, svA, slA = _pad(scans[0], ns)
    _ = filt(sxA, svA, slA, pose)
    # A far-shifted scan shares no bricks with the cache: every valid
    # point is a miss, and its devoxelized score is sigmoid(0) = 0.5.
    sxC = sxA + np.array([50.0, 0.0, 0.0], np.float32)
    sC, _, stC = filt(sxC, svA, slA, pose)
    assert int(stC["topo_miss_points"]) == int(svA.sum())
    np.testing.assert_allclose(
        np.asarray(sC)[svA], 0.5, rtol=0, atol=1e-6
    )
    # invalidate() forces the next dispatch to rebuild: no misses.
    filt.invalidate()
    _, _, stR = filt(sxC, svA, slA, pose)
    assert int(stR["topo_miss_points"]) == 0
