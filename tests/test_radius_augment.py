"""Radius join vs. brute force; augmentation; geometry."""

import numpy as np
import jax
import jax.numpy as jnp

from sps_tpu.ops import radius as rad
from sps_tpu.ops import augment as aug
from sps_tpu.utils import geometry as geo


def test_radius_join_matches_bruteforce():
    rng = np.random.default_rng(0)
    n, m, r = 500, 800, 0.3
    scan = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    qmap = rng.uniform(-3.5, 3.5, (m, 3)).astype(np.float32)
    sv = rng.random(n) > 0.1
    qv = rng.random(m) > 0.1

    mask, dropped = jax.jit(
        lambda s, svv, q, qvv: rad.radius_join(
            s, svv, q, qvv, r, cell_capacity=2048, max_per_cell=8
        )
    )(*map(jnp.asarray, (scan, sv, qmap, qv)))
    mask = np.asarray(mask)
    assert int(dropped) == 0

    d2 = ((qmap[:, None, :] - scan[None, :, :]) ** 2).sum(-1)
    d2[:, ~sv] = np.inf
    want = (d2.min(axis=1) <= r * r) & qv
    np.testing.assert_array_equal(mask, want)


def test_radius_join_dense_cell_overflow_reported():
    # 100 coincident points in one cell with max_per_cell=4 -> drops.
    scan = np.zeros((100, 3), np.float32)
    q = np.zeros((1, 3), np.float32)
    mask, dropped = rad.radius_join(
        jnp.asarray(scan),
        jnp.ones(100, bool),
        jnp.asarray(q),
        jnp.ones(1, bool),
        0.1,
        cell_capacity=64,
        max_per_cell=4,
    )
    assert int(dropped) == 96
    assert bool(mask[0])  # still found via remaining candidates


def test_compact_mask():
    mask = jnp.asarray([0, 1, 1, 0, 1, 0, 1], bool)
    idx, valid, over = rad.compact_mask(mask, 3)
    np.testing.assert_array_equal(np.asarray(idx), [1, 2, 4])
    np.testing.assert_array_equal(np.asarray(valid), [True, True, True])
    assert int(over) == 1
    idx, valid, over = rad.compact_mask(mask, 8)
    np.testing.assert_array_equal(np.asarray(idx)[:4], [1, 2, 4, 6])
    assert int(valid.sum()) == 4 and int(over) == 0


def test_augmentation_matrix_properties():
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(jax.random.PRNGKey(1), (100, 3))
    for i in range(5):
        m = aug.augmentation_matrix(jax.random.fold_in(key, i))
        out = pts @ m
        # Composite = rotation * flip * diag(scale): columns orthogonal,
        # column norms = scales in [0.8, 1.2].
        mtm = np.asarray(m.T @ m)
        off = mtm - np.diag(np.diag(mtm))
        np.testing.assert_allclose(off, 0.0, atol=1e-5)
        s = np.sqrt(np.diag(mtm))
        assert ((s >= 0.8 - 1e-5) & (s <= 1.2 + 1e-5)).all()
        assert out.shape == pts.shape


def test_geometry_roundtrip():
    rng = np.random.default_rng(3)
    # Random rigid transform.
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    tr = np.asarray(geo.pose_to_matrix(1.0, -2.0, 0.5, *q))
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    out = geo.transform_points(jnp.asarray(pts), jnp.asarray(tr))
    back = geo.inverse_transform_points(out, jnp.asarray(tr))
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-4, atol=1e-4)
    # Rotation part orthonormal.
    r = tr[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)


def test_dense_join_superset_of_exact():
    """radius_join_dense finds every exact within-r pair (Chebyshev-cell
    superset of the Euclidean ball) and nothing beyond 2r*sqrt(3)."""
    import numpy as np
    import jax.numpy as jnp

    from sps_tpu.ops import radius as rad

    rng = np.random.default_rng(0)
    r = 0.1
    scan = jnp.asarray(rng.uniform(-2, 2, (300, 3)).astype(np.float32))
    q = jnp.asarray(rng.uniform(-2.5, 2.5, (800, 3)).astype(np.float32))
    sv = jnp.ones((300,), bool)
    qv = jnp.ones((800,), bool)
    mask, dropped = rad.radius_join_dense(scan, sv, q, qv, r, extent=(64, 64, 64))
    assert int(dropped) == 0
    d = np.linalg.norm(
        np.asarray(q)[:, None, :] - np.asarray(scan)[None, :, :], axis=-1
    ).min(axis=1)
    m = np.asarray(mask)
    assert (m | (d > r)).all(), "missed an exact within-r query"
    assert (~m | (d <= 2 * r * np.sqrt(3))).all(), "kept a far query"
