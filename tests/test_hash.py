"""Tests for the open-addressing voxel hash and voxelization.

Verified against brute-force numpy dictionaries (the semantics
MinkowskiEngine's coordinate manager provides to the reference at
/root/reference/src/sps/models/models.py:24-28).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sps_tpu.ops import hash as vhash
from sps_tpu.ops import voxelize as vox


def _random_coords(rng, n, lo=-50, hi=50, dup_frac=0.5):
    base = rng.integers(lo, hi, size=(max(1, int(n * (1 - dup_frac))), 4))
    picks = rng.integers(0, len(base), size=n)
    return base[picks].astype(np.int32)


@pytest.mark.parametrize("n,cap", [(17, 64), (1000, 4096), (5000, 16384)])
def test_build_lookup_roundtrip(n, cap):
    rng = np.random.default_rng(0)
    coords = _random_coords(rng, n)
    valid = rng.random(n) > 0.1
    table, slot_of = jax.jit(
        lambda c, v: vhash.build(c, v, cap), static_argnums=()
    )(jnp.asarray(coords), jnp.asarray(valid))
    table = jax.tree.map(np.asarray, table)
    slot_of = np.asarray(slot_of)

    # Every valid row resolved to a slot whose key matches.
    assert (slot_of[valid] >= 0).all()
    assert (table.keys[slot_of[valid]] == coords[valid]).all()
    # Duplicate keys share a slot.
    seen = {}
    for i in np.where(valid)[0]:
        k = tuple(coords[i])
        if k in seen:
            assert slot_of[i] == seen[k]
        seen[k] = slot_of[i]
    # Occupied slot count == number of unique valid keys.
    assert (table.rows >= 0).sum() == len(seen)

    # Lookups: present keys return the winner row; absent keys return EMPTY.
    npresent = min(50, n)
    queries = np.concatenate(
        [coords[:npresent], _random_coords(rng, 50, lo=500, hi=600)]
    )
    res = np.asarray(vhash.lookup(jax.tree.map(jnp.asarray, table), jnp.asarray(queries)))
    for i in range(npresent):
        k = tuple(coords[i])
        if k in seen:
            assert res[i] >= 0
            assert tuple(coords[res[i]]) == k
        else:
            assert res[i] == vhash.EMPTY
    assert (res[npresent:] == vhash.EMPTY).all()


def test_lookup_returns_first_occurrence_rowid():
    coords = jnp.asarray([[0, 1, 2, 3], [0, 1, 2, 3], [5, 5, 5, 5]], jnp.int32)
    table, _ = vhash.build(coords, jnp.ones(3, bool), 16)
    res = np.asarray(vhash.lookup(table, coords))
    assert res[0] == res[1] == 0
    assert res[2] == 2


def test_voxelize_matches_numpy_reference():
    rng = np.random.default_rng(1)
    n, vcap, T = 3000, 4096, 2
    pts = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    batch = rng.integers(0, 2, size=n).astype(np.int32)
    t = rng.integers(0, T, size=n).astype(np.int32)
    valid = rng.random(n) > 0.05
    feats = rng.normal(size=(n, 3)).astype(np.float32)
    vs = 0.25

    coords = np.floor(pts / vs).astype(np.int32)
    grid, p2v, pooled = jax.jit(
        lambda c, b, tt, v, f: vox.voxelize(
            c, b, tt, v, num_time=T, voxel_capacity=vcap, features=f
        )
    )(*map(jnp.asarray, (coords, batch, t, valid, feats)))
    grid = jax.tree.map(np.asarray, grid)
    p2v, pooled = np.asarray(p2v), np.asarray(pooled)

    # Numpy reference dedup.
    ref = {}
    for i in range(n):
        if not valid[i]:
            continue
        k = (batch[i], *coords[i])
        ref.setdefault(k, []).append(i)
    assert not grid.overflow
    assert grid.num_voxels == len(ref)

    # Each point maps to a row whose coords match its own voxel.
    for i in range(n):
        if valid[i]:
            assert p2v[i] >= 0
            assert tuple(grid.coords[p2v[i]]) == (batch[i], *coords[i])
        else:
            assert p2v[i] == vhash.EMPTY

    # occupancy + mean pooling per (voxel, t).
    for k, idxs in ref.items():
        row = p2v[idxs[0]]
        for tt in range(T):
            sel = [i for i in idxs if t[i] == tt]
            assert grid.occ[row, tt] == (1.0 if sel else 0.0)
            if sel:
                np.testing.assert_allclose(
                    pooled[row, tt], feats[sel].mean(axis=0), rtol=1e-5, atol=1e-5
                )

    # Padding rows use sentinel coords.
    assert (grid.coords[int(grid.num_voxels):] == vox.PAD_COORD).all()


def test_voxelize_overflow_flag():
    n = 256
    coords = jnp.arange(n * 3, dtype=jnp.int32).reshape(n, 3)
    grid, _, _ = vox.voxelize(
        coords,
        jnp.zeros(n, jnp.int32),
        jnp.zeros(n, jnp.int32),
        jnp.ones(n, bool),
        num_time=1,
        voxel_capacity=64,
    )
    assert bool(grid.overflow)


def test_devoxelize_gather():
    vals = jnp.arange(24, dtype=jnp.float32).reshape(4, 2, 3)
    p2v = jnp.asarray([0, 3, -1, 2], jnp.int32)
    t = jnp.asarray([1, 0, 0, 1], jnp.int32)
    out = np.asarray(vox.devoxelize(vals, p2v, t))
    np.testing.assert_allclose(out[0], np.asarray(vals)[0, 1])
    np.testing.assert_allclose(out[1], np.asarray(vals)[3, 0])
    np.testing.assert_allclose(out[2], 0.0)
    np.testing.assert_allclose(out[3], np.asarray(vals)[2, 1])


def test_quantize_floor_semantics():
    # Floor, not truncate-toward-zero: -0.05/0.1 -> -1 (ME semantics; the
    # reference's util.py:75 .int() truncation is documented as a bug).
    pts = jnp.asarray([[-0.05, 0.05, -0.1], [0.19, -0.19, 0.0]])
    out = np.asarray(vox.quantize(pts, 0.1))
    np.testing.assert_array_equal(out, [[-1, 0, -1], [1, -2, 0]])
