"""Streaming baseline filters (MOS4D buffer, MapMOS crop, mask)."""

import numpy as np
import jax

from sps_tpu.models.mapmos import MapMOSConfig
from sps_tpu.models.mos4d import MOS4DConfig, MOS4DNet
from sps_tpu.stream import baselines
from sps_tpu.structs import Capacities

CAPS = Capacities(
    points=2048, voxels=(1024, 512, 256, 256, 256), bricks=(512, 512, 512, 512, 512)
)


def test_scans_from_ckpt_name():
    assert baselines.scans_from_ckpt_name("/x/10_scans.ckpt") == 10
    assert baselines.scans_from_ckpt_name("/x/5_scans_v2.ckpt") == 5
    assert baselines.scans_from_ckpt_name("/x/best.ckpt", default=7) == 7


def test_mos4d_filter_buffer():
    rng = np.random.default_rng(0)
    cfg = MOS4DConfig(voxel_size=0.25, n_scans=3, caps=CAPS)
    from sps_tpu.structs import pad_point_batch

    model = MOS4DNet(cfg)
    pb = pad_point_batch(
        rng.uniform(-2, 2, (50, 3)).astype(np.float32),
        np.zeros(50, np.int32),
        rng.integers(0, 3, 50),
        np.zeros(50, np.float32),
        CAPS.points,
    )
    variables = model.init(jax.random.PRNGKey(0), pb)
    filt = baselines.MOS4DFilter(cfg, variables, scan_capacity=256)
    pose = np.eye(4, dtype=np.float32)
    for i in range(4):  # exceeds buffer length -> oldest evicted
        scan = rng.uniform(-2, 2, (100, 3)).astype(np.float32)
        keep = filt(scan, pose)
        assert keep.shape == (100,)
        assert keep.dtype == bool
    assert len(filt.buffer) == 3


def test_mapmos_filter():
    rng = np.random.default_rng(1)
    cfg = MapMOSConfig(voxel_size=0.25, caps=CAPS)
    from sps_tpu.structs import pad_point_batch
    import jax.numpy as jnp
    from sps_tpu.models.mapmos import MapMOSNet

    model = MapMOSNet(cfg)
    pb = pad_point_batch(
        rng.uniform(-2, 2, (50, 3)).astype(np.float32),
        np.zeros(50, np.int32),
        rng.integers(0, 2, 50),
        np.zeros(50, np.float32),
        CAPS.points,
    )
    variables = model.init(jax.random.PRNGKey(0), pb, jnp.zeros((CAPS.points,)))
    mappts = rng.uniform(-3, 3, (2000, 3)).astype(np.float32)
    filt = baselines.MapMOSFilter(
        cfg, variables, mappts, scan_capacity=256, map_capacity=1024, crop_radius=5.0
    )
    keep = filt(rng.uniform(-2, 2, (80, 3)).astype(np.float32), np.eye(4, dtype=np.float32))
    assert keep.shape == (80,) and keep.dtype == bool


def test_mask_filter_exact():
    rng = np.random.default_rng(2)
    mappts = rng.uniform(0, 2, (500, 3)).astype(np.float32)
    filt = baselines.MaskFilter(mappts, voxel_size=0.25)
    scan = np.concatenate(
        [mappts[:50] + 0.01, rng.uniform(10, 12, (50, 3)).astype(np.float32)]
    )
    keep = filt(scan, np.eye(4, dtype=np.float32))
    # Points near map points share voxels (mostly); far points never do.
    assert keep[:50].mean() > 0.8
    assert not keep[50:].any()


def test_lts_filter_node():
    rng = np.random.default_rng(3)
    from sps_tpu.models.lts import SPCTReg
    import jax.numpy as jnp

    model = SPCTReg()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16 * 128, 3)))
    filt = baselines.LTSFilter(variables, "vlp-16", epsilon=0.9)
    pts = rng.normal(size=(3000, 3)).astype(np.float32) * np.array([8, 8, 1])
    scan = np.column_stack([pts, rng.uniform(0, 1, 3000).astype(np.float32)])
    out = filt(scan)
    assert out.shape[1] == 4
    assert 0 < len(out) <= 16 * 1024
    assert (out[:, 3] <= 0.9).all()
