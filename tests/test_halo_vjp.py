"""Gather-transpose VJP of the halo assemblies == autodiff of the plain
implementation, on REAL (adjacency-consistent) level tables."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import sps_tpu.config as cfg_mod
from sps_tpu.models.spsnet import SPSModel, build_levels_from_grid
from sps_tpu.ops import atlas as atl
from sps_tpu.ops import brick as bk
from sps_tpu.ops import voxelize as vox


def _level(bs=4, seed=0):
    """A small real atlas level (consistent nbr27, phantom rows EMPTY)."""
    rng = np.random.default_rng(seed)
    n = 600
    coords = jnp.asarray(rng.integers(-14, 14, (n, 3)), jnp.int32)
    grid, _ = atl.voxelize_bricks(
        coords,
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.int32),
        jnp.ones((n,), bool),
        num_time=1,
        brick_capacity=256,
        brick_side=bs,
        extent=(1, 16, 16, 16),
    )
    levels = atl.build_levels(grid, num_levels=1, capacities=(256,))
    return levels[0]


def test_halo_vjp_matches_autodiff():
    lvl = _level()
    b = lvl.nbr27.shape[1]
    bs = lvl.grid.occ.shape[1]
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((b, bs, bs, bs, 3)), jnp.float32)

    def loss_custom(f):
        return jnp.sum(jnp.sin(bk.halo(f, lvl.nbr27, 1)))

    def loss_plain(f):
        return jnp.sum(jnp.sin(bk._halo_impl(f, lvl.nbr27, 1)))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_custom)(feats)),
        np.asarray(jax.grad(loss_plain)(feats)),
        rtol=1e-5, atol=1e-5,
    )


def test_halo_z_vjp_matches_autodiff():
    lvl = _level(seed=2)
    b = lvl.nbr27.shape[1]
    bs = lvl.grid.occ.shape[1]
    tc = 2
    rng = np.random.default_rng(3)
    zf = jnp.asarray(rng.standard_normal((b, bs, bs, bs * tc)), jnp.float32)

    def loss_custom(f):
        return jnp.sum(jnp.sin(bk.halo_z(f, lvl.nbr27, 1, tc)))

    def loss_plain(f):
        return jnp.sum(jnp.sin(bk._halo_z_impl(f, lvl.nbr27, 1, tc)))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_custom)(zf)),
        np.asarray(jax.grad(loss_plain)(zf)),
        rtol=1e-5, atol=1e-5,
    )


def test_halo_pad2_vjp_matches_autodiff():
    """conv0's 5^3 kernel uses pad=2 halos."""
    lvl = _level(bs=4, seed=4)
    b = lvl.nbr27.shape[1]
    bs = lvl.grid.occ.shape[1]
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.standard_normal((b, bs, bs, bs, 2)), jnp.float32)

    def loss_custom(f):
        return jnp.sum(jnp.cos(bk.halo(f, lvl.nbr27, 2)))

    def loss_plain(f):
        return jnp.sum(jnp.cos(bk._halo_impl(f, lvl.nbr27, 2)))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_custom)(feats)),
        np.asarray(jax.grad(loss_plain)(feats)),
        rtol=1e-5, atol=1e-5,
    )
