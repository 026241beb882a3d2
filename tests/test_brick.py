"""Brick engine vs. brute-force 4D dict reference (same oracle as the
row-gather engine in tests/test_sparse.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sps_tpu.ops import brick
from sps_tpu.ops import sparse_conv as sc
from tests import sparse_ref as ref

T = 2
BCAP = 256


def _make(rng, n=150, lo=-8, hi=8):
    coords = rng.integers(lo, hi, size=(n, 3)).astype(np.int32)
    batch = rng.integers(0, 2, size=n).astype(np.int32)
    t = rng.integers(0, T, size=n).astype(np.int32)
    grid, p2s = brick.voxelize_bricks(
        jnp.asarray(coords),
        jnp.asarray(batch),
        jnp.asarray(t),
        jnp.ones(n, bool),
        num_time=T,
        brick_capacity=BCAP,
    )
    return coords, batch, t, grid, p2s


def _feats(rng, grid, cin):
    f = rng.normal(size=(BCAP, 4, 4, 4, T, cin)).astype(np.float32)
    f = f * np.asarray(grid.occ)[..., None]
    return f.reshape(BCAP, 4, 4, 4, T * cin)


def _to_dict(grid, feats):
    """Brick layout -> {(b,x,y,z,t): (C,)} over occupied slots."""
    occ = np.asarray(grid.occ)
    coords = np.asarray(grid.coords)
    nb = int(grid.num_bricks)
    fc = np.asarray(feats)
    c = fc.shape[-1] // T
    x = fc.reshape(fc.shape[:4] + (T, c))
    out = {}
    for i in range(nb):
        b, bx, by, bz = coords[i]
        for lx in range(4):
            for ly in range(4):
                for lz in range(4):
                    for tt in range(T):
                        if occ[i, lx, ly, lz, tt] > 0:
                            out[(b, 4 * bx + lx, 4 * by + ly, 4 * bz + lz, tt)] = x[
                                i, lx, ly, lz, tt
                            ]
    return out


def test_voxelize_bricks_roundtrip():
    rng = np.random.default_rng(0)
    coords, batch, t, grid, p2s = _make(rng)
    assert not bool(grid.overflow)
    occ = np.asarray(grid.occ)
    gc = np.asarray(grid.coords)
    p2s = np.asarray(p2s)
    want = {(batch[i], *(coords[i] >> 2)) for i in range(len(coords))}
    assert int(grid.num_bricks) == len(want)
    for i in range(len(coords)):
        s = p2s[i]
        assert s >= 0
        bi, l = divmod(s, 64)
        lx, ly, lz = l // 16, (l // 4) % 4, l % 4
        assert tuple(gc[bi]) == (batch[i], *(coords[i] >> 2))
        assert (coords[i] & 3 == [lx, ly, lz]).all()
        assert occ[bi, lx, ly, lz, t[i]] == 1.0


@pytest.mark.parametrize("ksize,kt", [(3, 3), (3, 1), (5, 1)])
def test_brick_conv_matches_dense_ref(ksize, kt):
    rng = np.random.default_rng(1)
    coords, batch, t, grid, p2s = _make(rng)
    levels = brick.build_brick_levels(grid, num_levels=1, capacities=(BCAP,))
    cin, cout = 3, 5
    feats = _feats(rng, grid, cin)
    d = _to_dict(grid, feats)
    w = rng.normal(size=(ksize**3, kt, cin, cout)).astype(np.float32) * 0.3
    wd = brick.pack_dense_kernel(jnp.asarray(w), T)
    out = jax.jit(brick.brick_conv)(jnp.asarray(feats), levels[0].nbr27, wd, grid.occ)
    got = _to_dict(grid, np.asarray(out))
    want = ref.conv4d(d, w, ksize, kt)
    want = {k: v for k, v in want.items() if k in got}  # occ-masked slots only
    ref.dict_allclose(want, got, rtol=1e-3, atol=1e-4)
    # mode="halo" must agree with mode="region" (same conv, different
    # assembly: materialized concat halo vs region decomposition)
    out_h = jax.jit(lambda f, n, ww, o: brick.brick_conv(f, n, ww, o, "halo"))(
        jnp.asarray(feats), levels[0].nbr27, wd, grid.occ
    )
    np.testing.assert_allclose(
        np.asarray(out_h), np.asarray(out), rtol=1e-4, atol=1e-5
    )
    # zband (z folded into channels, one 2D conv) must also agree.
    occz = grid.occ.reshape(BCAP, 4, 4, 4 * T)
    out_z = jax.jit(brick.brick_conv_zband)(
        brick.fold_z(jnp.asarray(feats)), levels[0].nbr27, wd, occz
    )
    np.testing.assert_allclose(
        np.asarray(brick.unfold_z(out_z, T * cout)),
        np.asarray(out),
        rtol=1e-4,
        atol=1e-5,
    )


def test_brick_down_conv_matches_dense_ref():
    rng = np.random.default_rng(2)
    coords, batch, t, grid, p2s = _make(rng)
    levels = brick.build_brick_levels(grid, num_levels=2, capacities=(BCAP, BCAP))
    cin, cout = 3, 4
    feats = _feats(rng, grid, cin)
    d = _to_dict(grid, feats)
    w = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.3
    wp = sc.pack_time_toeplitz(jnp.asarray(w[:, None]), T)
    coarse = levels[1]
    out = jax.jit(brick.brick_conv_down)(
        jnp.asarray(feats), coarse.child, wp, coarse.grid.occ
    )
    got = _to_dict(coarse.grid, np.asarray(out))
    want = ref.conv4d_down(d, w)
    assert set(want) == set(got)
    ref.dict_allclose(want, got, rtol=1e-3, atol=1e-4)


def test_brick_up_conv_matches_dense_ref():
    rng = np.random.default_rng(3)
    coords, batch, t, grid, p2s = _make(rng)
    levels = brick.build_brick_levels(grid, num_levels=2, capacities=(BCAP, BCAP))
    fine, coarse = levels
    cin, cout = 3, 4
    cf = rng.normal(size=(BCAP, 4, 4, 4, T, cin)).astype(np.float32)
    cf = cf * np.asarray(coarse.grid.occ)[..., None]
    cf = cf.reshape(BCAP, 4, 4, 4, T * cin)
    cdict = _to_dict(coarse.grid, cf)
    w = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.3
    wp = sc.pack_time_toeplitz(jnp.asarray(w[:, None]), T)
    out = jax.jit(brick.brick_conv_up)(
        jnp.asarray(cf), fine.parent, fine.oct, wp, fine.grid.occ
    )
    got = _to_dict(fine.grid, np.asarray(out))
    d = _to_dict(grid, _feats(rng, grid, cin))
    want = ref.conv4d_up(cdict, set(d.keys()), w)
    assert set(want) == set(got)
    ref.dict_allclose(want, got, rtol=1e-3, atol=1e-4)


def test_coarse_brick_occupancy():
    rng = np.random.default_rng(4)
    coords, batch, t, grid, p2s = _make(rng)
    levels = brick.build_brick_levels(grid, num_levels=3, capacities=(BCAP, BCAP, BCAP))
    d0 = _to_dict(grid, _feats(rng, grid, 1))
    want = {(b, x >> 1, y >> 1, z >> 1, tt) for (b, x, y, z, tt) in d0}
    got = set(_to_dict(levels[1].grid, _feats(np.random.default_rng(9), levels[1].grid, 1)))
    assert want == got
    want2 = {(b, x >> 1, y >> 1, z >> 1, tt) for (b, x, y, z, tt) in want}
    got2 = set(_to_dict(levels[2].grid, _feats(np.random.default_rng(9), levels[2].grid, 1)))
    assert want2 == got2


def test_halo_contains_neighbors():
    rng = np.random.default_rng(5)
    coords, batch, t, grid, p2s = _make(rng, n=300, lo=-6, hi=6)
    levels = brick.build_brick_levels(grid, num_levels=1, capacities=(BCAP,))
    feats = _feats(rng, grid, 2)
    h = np.asarray(brick.halo(jnp.asarray(feats), levels[0].nbr27, 1))
    gc = np.asarray(grid.coords)
    nb = int(grid.num_bricks)
    index = {tuple(gc[i]): i for i in range(nb)}
    fr = feats.reshape(BCAP, 4, 4, 4, -1)
    # Check all 26 neighbor directions land in the right halo cells.
    rngp = np.random.default_rng(6)
    for _ in range(200):
        i = rngp.integers(0, nb)
        dx, dy, dz = rngp.integers(-1, 2, 3)
        if dx == dy == dz == 0:
            continue
        key = (gc[i][0], gc[i][1] + dx, gc[i][2] + dy, gc[i][3] + dz)
        j = index.get(key)
        # sample a voxel in the neighbor that falls inside our halo window
        lx = 0 if dx == 1 else (3 if dx == -1 else rngp.integers(0, 4))
        ly = 0 if dy == 1 else (3 if dy == -1 else rngp.integers(0, 4))
        lz = 0 if dz == 1 else (3 if dz == -1 else rngp.integers(0, 4))
        hx, hy, hz = 4 * dx + lx + 1, 4 * dy + ly + 1, 4 * dz + lz + 1
        if not (0 <= hx < 6 and 0 <= hy < 6 and 0 <= hz < 6):
            continue
        want = fr[j, lx, ly, lz] if j is not None else 0.0
        np.testing.assert_allclose(h[i, hx, hy, hz], want, rtol=1e-6)
