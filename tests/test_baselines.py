"""Baseline model families: MOS4D, MapMOS, LTS (shape/semantics smoke +
engine parity where applicable)."""

import numpy as np
import jax
import jax.numpy as jnp

from sps_tpu.models.mos4d import MOS4DConfig, MOS4DNet
from sps_tpu.models.mapmos import MapMOSConfig, MapMOSNet, normalized_index_features, to_label
from sps_tpu.models.lts import SPCTReg
from sps_tpu.data import range_image as ri
from sps_tpu.structs import Capacities, pad_point_batch

CAPS = Capacities(
    points=1024,
    voxels=(1024, 512, 256, 256, 256),
    bricks=(512, 512, 512, 512, 512),
)


def _pb(rng, n, t_vals, cap=1024):
    xyz = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    t = rng.choice(t_vals, size=n)
    return pad_point_batch(xyz, np.zeros(n, np.int32), t, np.zeros(n, np.float32), cap)


def test_mos4d_forward():
    rng = np.random.default_rng(0)
    cfg = MOS4DConfig(voxel_size=0.25, n_scans=4, caps=CAPS)
    pb = _pb(rng, 300, [0, 1, 2, 3])
    model = MOS4DNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), pb)
    logits, aux = jax.jit(lambda v, b: model.apply(v, b))(variables, pb)
    assert logits.shape == (CAPS.points,)
    assert not bool(np.asarray(aux["overflow"]).any())
    lg = np.asarray(logits)
    assert np.isfinite(lg).all()
    assert (lg[~np.asarray(pb.valid)] == 0).all()
    # Parameter tree matches the shared MinkUNet layout (ckpt-compatible).
    assert "conv0p1s1" in variables["params"]["MinkUNet"]


def test_mapmos_forward_and_features():
    rng = np.random.default_rng(1)
    cfg = MapMOSConfig(voxel_size=0.25, caps=CAPS)
    pb = _pb(rng, 300, [0, 1])
    indices = jnp.asarray(
        np.where(np.asarray(pb.t) == 1, 10, 4).astype(np.float32)
    )
    model = MapMOSNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), pb, indices)
    logits, aux = jax.jit(lambda v, b, i: model.apply(v, b, i))(variables, pb, indices)
    assert np.isfinite(np.asarray(logits)).all()
    labels = np.asarray(to_label(logits))
    assert set(np.unique(labels)) <= {0.0, 1.0}
    # normalized features: i in {4, 10} -> f in {2, 1} (mapmos.py:65-71)
    f = np.asarray(normalized_index_features(indices, pb.valid))[:, 0]
    np.testing.assert_allclose(f[np.asarray(pb.t) == 1], 1.0)
    np.testing.assert_allclose(f[np.asarray(pb.t) == 0], 2.0)
    # all-equal indices -> constant 1
    f1 = np.asarray(normalized_index_features(jnp.ones_like(indices), pb.valid))
    np.testing.assert_allclose(f1, 1.0)


def test_lts_transformer():
    rng = np.random.default_rng(2)
    model = SPCTReg()
    x = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    assert out.shape == (2, 64)
    o = np.asarray(out)
    assert ((o >= 0) & (o <= 1)).all()
    # q and k share one projection (transformer.py:41).
    assert "qk" in variables["params"]["sa1"]
    # train mode with dropout runs
    out2, _ = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
    )
    assert np.isfinite(np.asarray(out2)).all()


def test_range_image_projection():
    rng = np.random.default_rng(3)
    n = 4000
    pts = rng.normal(size=(n, 3)).astype(np.float32) * np.array([10, 10, 1])
    labels = rng.integers(0, 2, n).astype(np.float32)
    data = np.column_stack([pts, labels])
    img = ri.project(data, "vlp-16")
    assert img.shape == (16, 1024, 4)
    w, lab = ri.windows(img, "vlp-16")
    assert w.shape == (8, 16 * 128, 3) and lab.shape == (8, 16 * 128)
    # label==-1 rows dropped
    data2 = data.copy()
    data2[:, 3] = -1
    img2 = ri.project(data2, "vlp-16")
    assert (img2 == 0).all()
