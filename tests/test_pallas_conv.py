"""Pallas zband conv kernel: forward parity (compiled path logic via the
interpreter + the XLA fallback) and custom-VJP gradients, all against the
plain lax.conv formulation it replaces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sps_tpu.ops import brick as bk
from sps_tpu.ops import pallas_conv as pc


def _ref_conv(hz, wz):
    return jax.lax.conv_general_dilated(
        hz, wz, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


def _case(k=3, bs=4, tcin=2, tcout=3, b=8, seed=0):
    rng = np.random.default_rng(seed)
    h = bs + k - 1
    hz = jnp.asarray(rng.standard_normal((b, h, h, h * tcin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, k, tcin, tcout)), jnp.float32)
    wz = bk.pack_zband_kernel(w, bs, k // 2)
    return hz, wz, k, bs


@pytest.mark.parametrize("k,bs,tcin,tcout", [(3, 4, 2, 3), (3, 8, 2, 2), (5, 4, 1, 2)])
def test_forward_matches_lax_conv(k, bs, tcin, tcout):
    hz, wz, k, bs = _case(k, bs, tcin, tcout)
    ref = _ref_conv(hz, wz)
    got = pc.zband_conv(hz, wz, k, bs)  # XLA fallback on the CPU mesh
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_kernel_interpret_matches_lax_conv():
    hz, wz, k, bs = _case(3, 4, 2, 2, b=4)
    ref = _ref_conv(hz, wz)
    got = pc.zband_conv(hz, wz, k, bs, 2, True)  # interpret: kernel logic
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_autodiff_of_reference():
    hz, wz, k, bs = _case(3, 4, 2, 2, b=4)

    def loss_ours(hz, wz):
        o = pc.zband_conv(hz, wz, k, bs)
        return jnp.sum(jnp.sin(o))

    def loss_ref(hz, wz):
        return jnp.sum(jnp.sin(_ref_conv(hz, wz)))

    g_ours = jax.grad(loss_ours, argnums=(0, 1))(hz, wz)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(hz, wz)
    for a, b_ in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_nondivisible_batch_falls_back_to_g1():
    hz, wz, k, bs = _case(3, 4, 2, 2, b=6)  # 6 % 16 != 0
    ref = _ref_conv(hz, wz)
    got = pc.zband_conv(hz, wz, k, bs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_epilogue_matches_unfused():
    """zband_conv_fused (XLA fallback + interpret-mode kernel) must equal
    conv -> *scale+bias -> +res -> relu -> *occ composed from primitives."""
    hz, wz, k, bs = _case(3, 4, 2, 2, b=4)
    tb = wz.shape[-1]
    rng = np.random.default_rng(1)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, tb), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(tb), jnp.float32)
    occ = jnp.asarray(rng.integers(0, 2, (4, bs, bs, tb)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((4, bs, bs, tb)), jnp.float32) * occ

    ref = _ref_conv(hz, wz)
    ref = jnp.maximum(ref * scale + bias + res, 0.0) * occ

    got = pc.zband_conv_fused(hz, wz, scale, bias, occ, res, k=k, bs=bs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    got_i = pc.zband_conv_fused(hz, wz, scale, bias, occ, res, k=k, bs=bs,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref), rtol=1e-5, atol=1e-5)

    # relu=False / no-res variant
    ref2 = (_ref_conv(hz, wz) * scale + bias) * occ
    got2 = pc.zband_conv_fused(hz, wz, scale, bias, occ, None, k=k, bs=bs,
                               relu=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), rtol=1e-5, atol=1e-5)
