"""int8 brick-conv kernel accuracy (inference quantization path).

Kernel-level gate for the int8 lever (docs/DESIGN.md §7 lever #1): the
quantized conv must track the float halo conv to within the expected
per-tensor-int8 noise, and preserve the phantom-slot masking semantics
exactly. The model-level uIoU parity gate (BASELINE.md: within 0.5 pt)
lives in tests/test_int8_parity.py (slow tier — full-model compiles).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sps_tpu.ops import brick

T = 2
BCAP = 192


def _level(rng, n=600, bs=4):
    coords = rng.integers(-10, 10, size=(n, 3)).astype(np.int32)
    batch = np.zeros(n, np.int32)
    t = rng.integers(0, T, size=n).astype(np.int32)
    grid, _ = brick.voxelize_bricks(
        jnp.asarray(coords),
        jnp.asarray(batch),
        jnp.asarray(t),
        jnp.ones(n, bool),
        num_time=T,
        brick_capacity=BCAP,
        brick_side=bs,
    )
    assert not bool(grid.overflow)
    (lvl,) = brick.build_brick_levels(grid, num_levels=1, capacities=(BCAP,))
    return lvl


@pytest.mark.parametrize("cin,cout", [(8, 8), (16, 8)])
def test_brick_conv_int8_tracks_float(cin, cout):
    rng = np.random.default_rng(0)
    lvl = _level(rng)
    occ = lvl.grid.occ
    bs = occ.shape[1]
    f = rng.normal(size=(BCAP, bs, bs, bs, T, cin)).astype(np.float32)
    f = (f * np.asarray(occ)[..., None]).reshape(BCAP, bs, bs, bs, T * cin)
    w = rng.normal(size=(3, 3, 3, T * cin, T * cout)).astype(np.float32) * 0.2

    ref = np.asarray(
        brick.brick_conv(jnp.asarray(f), lvl.nbr27, jnp.asarray(w), occ, "halo")
    )
    got = np.asarray(
        brick.brick_conv_int8(jnp.asarray(f), lvl.nbr27, jnp.asarray(w), occ)
    )
    # Per-tensor int8 on the activations: quant step = amax/127; conv
    # averaging keeps the relative RMS well under 2%.
    denom = np.sqrt((ref**2).mean()) + 1e-12
    rel = np.sqrt(((got - ref) ** 2).mean()) / denom
    assert rel < 0.02, rel
    # Phantom slots stay exactly zero (masking semantics unchanged).
    phantom = 1.0 - np.repeat(np.asarray(occ), cout, axis=-1)
    assert np.abs(got * phantom).max() == 0.0


def test_brick_conv_int8_zero_input():
    rng = np.random.default_rng(1)
    lvl = _level(rng, n=200)
    occ = lvl.grid.occ
    bs = occ.shape[1]
    f = jnp.zeros((BCAP, bs, bs, bs, T * 4), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, T * 4, T * 4)), jnp.float32)
    out = np.asarray(brick.brick_conv_int8(f, lvl.nbr27, w, occ))
    assert np.abs(out).max() == 0.0


def test_brick_conv_int8_bf16_storage():
    """The shipping path stores activations in bf16; quantization must
    round in f32 (bf16's 8-bit mantissa would double the step noise)."""
    rng = np.random.default_rng(2)
    lvl = _level(rng)
    occ = lvl.grid.occ
    bs = occ.shape[1]
    f = rng.normal(size=(BCAP, bs, bs, bs, T, 8)).astype(np.float32)
    f = (f * np.asarray(occ)[..., None]).reshape(BCAP, bs, bs, bs, T * 8)
    w = rng.normal(size=(3, 3, 3, T * 8, T * 8)).astype(np.float32) * 0.2
    ref = np.asarray(
        brick.brick_conv(jnp.asarray(f), lvl.nbr27, jnp.asarray(w), occ, "halo")
    ).astype(np.float32)
    got = np.asarray(
        brick.brick_conv_int8(
            jnp.asarray(f, jnp.bfloat16), lvl.nbr27, jnp.asarray(w), occ
        )
    ).astype(np.float32)
    denom = np.sqrt((ref**2).mean()) + 1e-12
    rel = np.sqrt(((got - ref) ** 2).mean()) / denom
    assert rel < 0.03, rel
