"""Pallas TPU kernel for the z-band brick convolution.

The zband formulation (ops/brick.py: fold_z / pack_zband_kernel /
brick_conv_zband) turns the stride-1 sparse 3D conv into ONE 2D conv
whose channel axes carry the folded z dimension — every matmul then runs
with >=128-lane shapes. XLA's conv lowering reaches ~45 TF/s on those
shapes; this kernel instead expresses the conv as its k*k explicit
banded matmuls with the halo block VMEM-resident, measured at
~135 TF/s on v5e (3.2x the shipping XLA halo conv at L0 scale; see
scripts/microbench_pallas.py). This is the Pallas fused conv the
blueprint calls for (SURVEY.md §7 item 3) — the gather-pattern halo
ASSEMBLY stays XLA (grouped slab gathers, measured near the bandwidth
bound; sub-tile HBM slicing is rejected by Mosaic, so fusing the gather
into the kernel loses — docstring history in microbench_pallas.py).

Forward runs the Pallas kernel on TPU backends and falls back to
jax.lax.conv on CPU (tests/CI run on a virtual CPU mesh); the backward
pass is plain XLA dot_generals via custom_vjp (training throughput is
not the streaming-latency path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default brick-block rows per kernel invocation; shrunk adaptively so
# the VMEM working set (input block + one kx weight slab + f32 scratch
# accumulator, double-buffered) stays under ~10 MB of the 16 MB budget
# (g=64 whole-kernel OOM'd at L0 shapes; whole-kernel L2 slabs OOM'd at
# any g — hence the kx grid dimension).
_G = 16
# The analytic estimate in _pick_g undercounts Mosaic's real stack by
# ~4.5x (the unrolled kx bodies keep every ky slice + matmul operand
# live): block7 shapes estimated 3.8 MB, measured 16.75 MB. Budget so
# that estimate * 4.5 stays under the 16 MB VMEM.
_VMEM_BUDGET = 3 * 1024 * 1024


def _pick_g_onepass(b, k, h, bs, tcin_h, tcout_b, itemsize):
    """Largest g whose ONE-PASS working set (input block + the FULL k*k
    weight + f32 accumulator, double-buffered) fits the budget, else 0.

    The kx grid dimension exists because L2-width weights overflow VMEM;
    at L0 widths the whole kernel fits, and the one-pass grid reads the
    assembled halo ONCE instead of k times (the (B//g, k) grid re-DMAs
    the same input block every kx step — 3x the conv's HBM traffic at
    k=3, ~2 GB extra per L0 block conv at BLT scale).

    Gated to k == 3: the shared _VMEM_BUDGET carries a ~4.5x measured
    fudge calibrated on the kx-STREAMED kernel, but the one-pass body
    unrolls all k*k matmuls with every slice live — at k = 5 (25 live
    slice/operand pairs vs 9) the real Mosaic stack can exceed the fudge
    on configs the calibration never covered. k != 3 stays on the
    streamed grid until the k*k unroll is re-measured."""
    if k != 3:
        return 0
    w_full = k * k * tcin_h * tcout_b * itemsize
    for g in (16, 8, 4, 2, 1):
        if b % g:
            continue
        in_blk = g * h * h * tcin_h * itemsize
        acc = g * bs * bs * tcout_b * 4
        out = g * bs * bs * tcout_b * itemsize
        if 2 * (in_blk + w_full) + acc + out <= _VMEM_BUDGET:
            return g
    return 0


def _zmm_kernel_onepass(hz_ref, w_ref, out_ref, *, k: int, bs: int):
    """One grid step per row block: all k*k banded matmuls with the full
    weight VMEM-resident; the input block is DMA'd exactly once."""
    hzv = hz_ref[:]
    acc = None
    for kx in range(k):
        for ky in range(k):
            a = jax.lax.slice(
                hzv,
                (0, kx, ky, 0),
                (hzv.shape[0], kx + bs, ky + bs, hzv.shape[3]),
            )
            p = jax.lax.dot_general(
                a,
                w_ref[kx, ky],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = p if acc is None else acc + p
    out_ref[:] = acc.astype(out_ref.dtype)


def _zmm_kernel(hz_ref, w_ref, out_ref, acc_ref, *, k: int, bs: int):
    # Grid = (row blocks, kx). The kx weight slab streams per step while
    # the f32 accumulator persists across the (innermost) kx dimension.
    # Load the whole (g, h, h, h*TCin) block once and slice VALUES —
    # slicing the ref at sub-tile offsets along the second-to-last dim is
    # rejected by Mosaic (tile-alignment), values are relayout-free.
    kx = pl.program_id(1)
    hzv = hz_ref[:]

    @pl.when(kx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Mosaic has no dynamic_slice lowering for values: unroll kx into k
    # predicated bodies with STATIC slices (one executes per grid step).
    for kxs in range(k):
        @pl.when(kx == kxs)
        def _(kxs=kxs):
            acc = acc_ref[:]
            for ky in range(k):
                a = jax.lax.slice(
                    hzv,
                    (0, kxs, ky, 0),
                    (hzv.shape[0], kxs + bs, ky + bs, hzv.shape[3]),
                )
                acc = acc + jax.lax.dot_general(
                    a,
                    w_ref[0, ky],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            acc_ref[:] = acc

    @pl.when(kx == k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _band_matmul_xla(hz, wz, k, bs):
    """Reference/CPU forward: the same k*k banded matmuls in XLA."""
    acc = None
    for kx in range(k):
        for ky in range(k):
            a = jax.lax.slice(
                hz, (0, kx, ky, 0), (hz.shape[0], kx + bs, ky + bs, hz.shape[3])
            )
            p = jax.lax.dot_general(
                a, wz[kx, ky],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = p if acc is None else acc + p
    return acc.astype(hz.dtype)


def _pick_g(b, k, h, bs, tcin_h, tcout_b, itemsize):
    """Largest g in {16, 8, 4, 2, 1} dividing b whose double-buffered
    working set fits the budget."""
    w_slab = k * tcin_h * tcout_b * itemsize  # one kx slab
    for g in (16, 8, 4, 2, 1):
        if b % g:
            continue
        in_blk = g * h * h * tcin_h * itemsize
        acc = g * bs * bs * tcout_b * 4
        out = g * bs * bs * tcout_b * itemsize
        if 2 * (in_blk + w_slab) + acc + out <= _VMEM_BUDGET:
            return g
    return 1


def _pallas_forward(hz, wz, k, bs, g, interpret):
    b = hz.shape[0]
    h = bs + (k - 1)
    tcout = wz.shape[-1] // bs
    g1 = _pick_g_onepass(b, k, h, bs, hz.shape[3], wz.shape[-1],
                         hz.dtype.itemsize)
    if g1:
        return pl.pallas_call(
            functools.partial(_zmm_kernel_onepass, k=k, bs=bs),
            grid=(b // g1,),
            in_specs=[
                pl.BlockSpec((g1, h, h, hz.shape[3]), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, k, hz.shape[3], bs * tcout),
                             lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((g1, bs, bs, bs * tcout),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, bs, bs, bs * tcout), hz.dtype),
            interpret=interpret,
        )(hz, wz)
    return pl.pallas_call(
        functools.partial(_zmm_kernel, k=k, bs=bs),
        grid=(b // g, k),
        in_specs=[
            pl.BlockSpec((g, h, h, hz.shape[3]), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, hz.shape[3], bs * tcout),
                         lambda i, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, bs, bs, bs * tcout),
                               lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, bs, bs, bs * tcout), hz.dtype),
        scratch_shapes=[pltpu.VMEM((g, bs, bs, bs * tcout), jnp.float32)],
        interpret=interpret,
    )(hz, wz)


def backend_has_pallas() -> bool:
    """Compiled Pallas kernels need a TPU-family backend ('tpu' or the
    tunneled 'axon'); the CPU test mesh takes the XLA fallback."""
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def zband_conv(hz, wz, k: int, bs: int, g: int = _G, interpret: bool = False):
    """VALID 2D conv of the z-folded halo with the packed band kernel.

    hz: (B, bs+k-1, bs+k-1, (bs+k-1)*TCin) assembled halo (halo_z).
    wz: (k, k, (bs+k-1)*TCin, bs*TCout) from pack_zband_kernel.
    Returns (B, bs, bs, bs*TCout) in hz.dtype.
    """
    if not interpret and not backend_has_pallas():
        return _band_matmul_xla(hz, wz, k, bs)
    h = bs + (k - 1)
    gg = min(
        g if hz.shape[0] % g == 0 else 1,
        _pick_g(hz.shape[0], k, h, bs, hz.shape[3], wz.shape[-1],
                hz.dtype.itemsize),
    )
    return _pallas_forward(hz, wz, k, bs, gg, interpret)


def _fused_kernel(hz_ref, w_ref, scale_ref, bias_ref, occ_ref, res_ref,
                  out_ref, acc_ref, *, k: int, bs: int, relu: bool,
                  has_res: bool):
    """_zmm_kernel + inference epilogue: out = occ * [relu](acc * scale +
    bias [+ res]). scale/bias are (bs*TCout,) z-tiled affines (BN folded
    with running stats), occ the z-folded occupancy already repeated to
    channel width. Fusing these INSIDE the kernel removes the separate
    BN/relu/mask passes over the (B, bs, bs, bs*TC) tensor AND the layout
    copies XLA inserts around extra custom-call boundaries."""
    kx = pl.program_id(1)
    hzv = hz_ref[:]

    @pl.when(kx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for kxs in range(k):
        @pl.when(kx == kxs)
        def _(kxs=kxs):
            acc = acc_ref[:]
            for ky in range(k):
                a = jax.lax.slice(
                    hzv,
                    (0, kxs, ky, 0),
                    (hzv.shape[0], kxs + bs, ky + bs, hzv.shape[3]),
                )
                acc = acc + jax.lax.dot_general(
                    a,
                    w_ref[0, ky],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            acc_ref[:] = acc

    @pl.when(kx == k - 1)
    def _():
        y = acc_ref[:] * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(
            jnp.float32
        )
        if has_res:
            y = y + res_ref[:].astype(jnp.float32)
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[:] = (y * occ_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def _fused_kernel_onepass(hz_ref, w_ref, scale_ref, bias_ref, occ_ref,
                          res_ref, out_ref, *, k: int, bs: int, relu: bool,
                          has_res: bool):
    """_zmm_kernel_onepass + the inference epilogue of _fused_kernel."""
    hzv = hz_ref[:]
    acc = None
    for kx in range(k):
        for ky in range(k):
            a = jax.lax.slice(
                hzv,
                (0, kx, ky, 0),
                (hzv.shape[0], kx + bs, ky + bs, hzv.shape[3]),
            )
            p = jax.lax.dot_general(
                a,
                w_ref[kx, ky],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = p if acc is None else acc + p
    y = acc * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    if has_res:
        y = y + res_ref[:].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = (y * occ_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def zband_conv_fused(hz, wz, scale, bias, occ, res=None, *, k: int, bs: int,
                     relu: bool = True, interpret: bool = False):
    """Inference-only fused conv+BN(+res)+relu+mask in the z-folded layout.

    hz: (B, h, h, h*TCin); wz: (k, k, h*TCin, bs*TCout);
    scale/bias: (bs*TCout,) folded per-(z, t, c) affine;
    occ: (B, bs, bs, bs*TCout) occupancy repeated to channel width
    (bf16/f32); res: optional (B, bs, bs, bs*TCout) residual.
    Not differentiable (training uses the unfused path with live BN
    statistics)."""
    b = hz.shape[0]
    h = bs + (k - 1)
    tb = wz.shape[-1]
    if not interpret and not backend_has_pallas():
        y = _band_matmul_xla(hz, wz, k, bs).astype(jnp.float32)
        y = y * scale + bias
        if res is not None:
            y = y + res.astype(jnp.float32)
        if relu:
            y = jnp.maximum(y, 0.0)
        return (y * occ.astype(jnp.float32)).astype(hz.dtype)
    g = min(
        _G,
        _pick_g(b, k, h, bs, hz.shape[3], tb, hz.dtype.itemsize),
    )
    if b % g:
        g = 1
    has_res = res is not None
    if res is None:
        res = jnp.zeros((b, bs, bs, tb), hz.dtype)
    import functools as _ft

    # One-pass grid when the full weight fits VMEM (L0 widths): the halo
    # block and the occ/res epilogue operands are DMA'd once instead of
    # once per kx step. The epilogue operands add to the working set:
    # shrink the budgeted g accordingly via the extra tcout term.
    g1 = _pick_g_onepass(b, k, h, bs, hz.shape[3], tb, hz.dtype.itemsize)
    while g1 and (
        2 * (g1 * h * h * hz.shape[3] + k * k * hz.shape[3] * tb
             + 2 * g1 * bs * bs * tb) * hz.dtype.itemsize
        + g1 * bs * bs * tb * 4
        > _VMEM_BUDGET
    ):
        g1 //= 2
        while g1 and b % g1:
            g1 //= 2
    if g1:
        return pl.pallas_call(
            _ft.partial(_fused_kernel_onepass, k=k, bs=bs, relu=relu,
                        has_res=has_res),
            grid=(b // g1,),
            in_specs=[
                pl.BlockSpec((g1, h, h, hz.shape[3]), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, k, hz.shape[3], tb), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
                pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
                pl.BlockSpec((g1, bs, bs, tb), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),  # occ
                pl.BlockSpec((g1, bs, bs, tb), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),  # res
            ],
            out_specs=pl.BlockSpec((g1, bs, bs, tb), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, bs, bs, tb), hz.dtype),
            interpret=interpret,
        )(hz, wz, scale.astype(jnp.float32), bias.astype(jnp.float32), occ,
          res)
    return pl.pallas_call(
        _ft.partial(_fused_kernel, k=k, bs=bs, relu=relu, has_res=has_res),
        grid=(b // g, k),
        in_specs=[
            pl.BlockSpec((g, h, h, hz.shape[3]), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, hz.shape[3], tb), lambda i, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec((g, bs, bs, tb), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # occ
            pl.BlockSpec((g, bs, bs, tb), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # res
        ],
        out_specs=pl.BlockSpec((g, bs, bs, tb), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, bs, bs, tb), hz.dtype),
        scratch_shapes=[pltpu.VMEM((g, bs, bs, tb), jnp.float32)],
        interpret=interpret,
    )(hz, wz, scale.astype(jnp.float32), bias.astype(jnp.float32), occ, res)


def _fwd(hz, wz, k, bs, g, interpret):
    return zband_conv(hz, wz, k, bs, g, interpret), (hz, wz)


def _bwd(k, bs, g, interpret, res, dout):
    hz, wz = res
    dout32 = dout.astype(jnp.float32)
    # d_hz[b, xo+kx, yo+ky, :] += dout[b, xo, yo, :] @ wz[kx, ky].T
    d_hz = jnp.zeros(hz.shape, jnp.float32)
    for kx in range(k):
        for ky in range(k):
            p = jax.lax.dot_general(
                dout32, wz[kx, ky].astype(jnp.float32),
                dimension_numbers=(((3,), (1,)), ((), ())),
            )
            d_hz = jax.lax.dynamic_update_slice(
                d_hz,
                jax.lax.dynamic_slice(
                    d_hz, (0, kx, ky, 0), (hz.shape[0], bs, bs, hz.shape[3])
                ) + p,
                (0, kx, ky, 0),
            )
    # d_wz[kx, ky] = sum_{b, xo, yo} hz[b, xo+kx, yo+ky, :]^T dout[...]
    d_wz = []
    for kx in range(k):
        row = []
        for ky in range(k):
            a = jax.lax.slice(
                hz, (0, kx, ky, 0), (hz.shape[0], kx + bs, ky + bs, hz.shape[3])
            ).astype(jnp.float32)
            row.append(
                jax.lax.dot_general(
                    a, dout32,
                    dimension_numbers=(((0, 1, 2), (0, 1, 2)), ((), ())),
                )
            )
        d_wz.append(jnp.stack(row))
    return d_hz.astype(hz.dtype), jnp.stack(d_wz).astype(wz.dtype)


zband_conv.defvjp(_fwd, _bwd)
