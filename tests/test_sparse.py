"""Sparse topology + convolution vs. a brute-force 4D dict reference.

This is the parity core: the packed-time 3D engine must reproduce the 4D
sparse-conv semantics the reference gets from MinkowskiEngine
(/root/reference/src/sps/models/MinkowskiEngine/minkunet.py:161-219).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sps_tpu.ops import topology as topo
from sps_tpu.ops import sparse_conv as sc
from sps_tpu.ops import voxelize as vox
from tests import sparse_ref as ref

T = 2
VCAP = 512


def _make_grid(rng, n=120, lo=-4, hi=4):
    """Random small 4D coordinate set -> (grid, feats, dict_feats)."""
    coords = rng.integers(lo, hi, size=(n, 3)).astype(np.int32)
    batch = rng.integers(0, 2, size=n).astype(np.int32)
    t = rng.integers(0, T, size=n).astype(np.int32)
    grid, p2v, _ = vox.voxelize(
        jnp.asarray(coords),
        jnp.asarray(batch),
        jnp.asarray(t),
        jnp.ones(n, bool),
        num_time=T,
        voxel_capacity=VCAP,
    )
    cin = 3
    v = int(grid.num_voxels)
    feats = rng.normal(size=(VCAP, T, cin)).astype(np.float32)
    feats = feats * np.asarray(grid.occ)[:, :, None]  # zero phantom slots
    feats[VCAP - (VCAP - v) :] = 0.0
    d = ref.grid_to_dict(np.asarray(grid.coords), np.asarray(grid.occ), feats.reshape(VCAP, T * cin), grid.num_voxels)
    return grid, feats.reshape(VCAP, T * cin), d


def _levels(grid, num=2, ks=((3,), (3,))):
    caps = tuple([VCAP] + [VCAP] * (num - 1))
    return topo.build_levels(grid, num_levels=num, capacities=caps, kernel_sizes=ks)


def test_neighbor_table_bruteforce():
    rng = np.random.default_rng(0)
    grid, _, _ = _make_grid(rng)
    offs = topo.kernel_offsets(3)
    nbr = np.asarray(topo._neighbor_table(grid, offs))
    coords = np.asarray(grid.coords)
    v = int(grid.num_voxels)
    index = {tuple(coords[i]): i for i in range(v)}
    for k in range(27):
        for i in range(v):
            q = (coords[i][0], *(coords[i][1:] + offs[k]))
            assert nbr[k, i] == index.get(q, -1), (k, i)
    # padded rows have no neighbors
    assert (nbr[:, v:] == -1).all()


@pytest.mark.parametrize("ksize,kt", [(3, 3), (3, 1), (5, 1)])
def test_stride1_conv_matches_dense_ref(ksize, kt):
    rng = np.random.default_rng(1)
    grid, feats, d = _make_grid(rng)
    cin, cout = 3, 5
    w = rng.normal(size=(ksize**3, kt, cin, cout)).astype(np.float32) * 0.3

    lv = _levels(grid, num=1, ks=((ksize,),))[0]
    wp = sc.pack_time_toeplitz(jnp.asarray(w), T)
    out = jax.jit(lambda f, n, w_, o: sc.sparse_conv(f, n, w_, o))(
        jnp.asarray(feats), lv.nbr[ksize], wp, grid.occ
    )
    got = ref.grid_to_dict(
        np.asarray(grid.coords), np.asarray(grid.occ), np.asarray(out), grid.num_voxels
    )
    want = ref.conv4d(d, w, ksize, kt)
    ref.dict_allclose(want, got)


def test_down_conv_matches_dense_ref():
    rng = np.random.default_rng(2)
    grid, feats, d = _make_grid(rng)
    levels = _levels(grid)
    cin, cout = 3, 4
    w = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.3
    wp = sc.pack_time_toeplitz(jnp.asarray(w[:, None]), T)  # time kernel 1

    coarse = levels[1]
    out = sc.sparse_conv_down(
        jnp.asarray(feats), coarse.child, wp, coarse.grid.occ
    )
    got = ref.grid_to_dict(
        np.asarray(coarse.grid.coords),
        np.asarray(coarse.grid.occ),
        np.asarray(out),
        coarse.grid.num_voxels,
    )
    want = ref.conv4d_down(d, w)
    ref.dict_allclose(want, got)


def test_up_conv_matches_dense_ref():
    rng = np.random.default_rng(3)
    grid, feats, d = _make_grid(rng)
    levels = _levels(grid)
    fine, coarse = levels[0], levels[1]
    cin, cout = 3, 4
    # Features live on the COARSE level for a transpose conv.
    vc = int(coarse.grid.num_voxels)
    cf = rng.normal(size=(VCAP, T, cin)).astype(np.float32)
    cf = cf * np.asarray(coarse.grid.occ)[:, :, None]
    cf[vc:] = 0.0
    cdict = ref.grid_to_dict(
        np.asarray(coarse.grid.coords),
        np.asarray(coarse.grid.occ),
        cf.reshape(VCAP, T * cin),
        coarse.grid.num_voxels,
    )
    w = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.3
    wp = sc.pack_time_toeplitz(jnp.asarray(w[:, None]), T)
    out = sc.sparse_conv_up(
        jnp.asarray(cf.reshape(VCAP, T * cin)),
        fine.parent,
        fine.parity,
        wp,
        fine.grid.occ,
    )
    got = ref.grid_to_dict(
        np.asarray(fine.grid.coords),
        np.asarray(fine.grid.occ),
        np.asarray(out),
        fine.grid.num_voxels,
    )
    want = ref.conv4d_up(cdict, set(d.keys()), w)
    ref.dict_allclose(want, got)


def test_coarse_occupancy_is_or_of_children():
    rng = np.random.default_rng(4)
    grid, _, d = _make_grid(rng)
    levels = _levels(grid)
    coarse = levels[1]
    want = {(b, x >> 1, y >> 1, z >> 1, t) for (b, x, y, z, t) in d}
    got = set()
    cc = np.asarray(coarse.grid.coords)
    occ = np.asarray(coarse.grid.occ)
    for i in range(int(coarse.grid.num_voxels)):
        for tt in range(T):
            if occ[i, tt] > 0:
                got.add((int(cc[i, 0]), int(cc[i, 1]), int(cc[i, 2]), int(cc[i, 3]), tt))
    assert want == got


def test_masked_batch_stats():
    rng = np.random.default_rng(5)
    grid, feats, d = _make_grid(rng)
    mean, var = sc.masked_batch_stats(jnp.asarray(feats), grid.occ)
    xs = np.stack(list(d.values()))
    np.testing.assert_allclose(np.asarray(mean), xs.mean(0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), xs.var(0), rtol=1e-4, atol=1e-5)


def test_conv_1x1_bias_broadcast():
    rng = np.random.default_rng(6)
    grid, feats, d = _make_grid(rng)
    cin, cout = 3, 2
    w = rng.normal(size=(1, 1, cin, cout)).astype(np.float32)
    b = rng.normal(size=(cout,)).astype(np.float32)
    wp = sc.pack_time_toeplitz(jnp.asarray(w), T)[0]
    out = sc.sparse_conv_1x1(jnp.asarray(feats), wp, grid.occ, jnp.asarray(b))
    got = ref.grid_to_dict(
        np.asarray(grid.coords), np.asarray(grid.occ), np.asarray(out), grid.num_voxels
    )
    want = {k: v @ w[0, 0] + b for k, v in d.items()}
    ref.dict_allclose(want, got)


def test_conv_gradients_flow():
    """MSE through a conv + devox chain is differentiable and nonzero."""
    rng = np.random.default_rng(7)
    grid, feats, _ = _make_grid(rng)
    lv = _levels(grid, num=1, ks=((3,),))[0]
    w = jnp.asarray(rng.normal(size=(27, 3, 3, 1)).astype(np.float32) * 0.3)

    def loss(w):
        wp = sc.pack_time_toeplitz(w, T)
        out = sc.sparse_conv(jnp.asarray(feats), lv.nbr[3], wp, grid.occ)
        return jnp.sum(out**2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
