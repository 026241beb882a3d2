"""MinkUNet14 (flax.linen) over either sparse backend.

Topology parity with the reference's CustomMinkUNet = MinkUNet14 with
PLANES=(8,16,32,64,64,32,16,8), INIT_DIM=8, LAYERS=(1,)*8, D=4
(/root/reference/src/sps/models/MinkowskiEngine/customminkunet.py:10-12 and
minkunet.py:52-219):

  conv0 (5,5,5,1) -> 4x [down(2,2,2,1)s2 + BasicBlock] ->
  4x [transpose(2,2,2,1)s2 + skip-concat + BasicBlock] -> 1x1 head.

BasicBlock (ME resnet_block; re-declared verbatim by MapMOS at
/root/reference/c_ws/src/mapmos/scripts/minkunet.py:31-85): two 3^4 convs
with BN, identity or (1x1 conv + BN) shortcut. The same class serves the
MOS4D (out=3) and MapMOS (out=1, feature=normalized time index) heads.

Two interchangeable engines with identical parameter trees (so converted
torch checkpoints load into either):
  * row-gather (sps_tpu.ops.sparse_conv over ops.topology levels) — the
    reference formulation, exact and simple;
  * dense-brick (sps_tpu.ops.brick) — the TPU-fast formulation; convs run
    as dense 3D convolutions over halo'd 4^3 bricks.
The engine is chosen by the type of the level objects passed to __call__.

Module/parameter names deliberately mirror the reference attribute names
(conv0p1s1, bn0, block1.conv1, ...) so the torch-checkpoint converter in
sps_tpu/convert.py is a mechanical key map.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from sps_tpu.ops import atlas as atl
from sps_tpu.ops import brick as bk
from sps_tpu.ops import sparse_conv as sc


@dataclasses.dataclass(frozen=True)
class MinkUNetConfig:
    in_channels: int = 1
    out_channels: int = 1
    init_dim: int = 8
    planes: tuple = (8, 16, 32, 64, 64, 32, 16, 8)
    layers: tuple = (1, 1, 1, 1, 1, 1, 1, 1)
    num_time: int = 2
    first_kernel: int = 5
    block_kernel: int = 3
    # Compute dtype for gathers/matmuls; params stay float32.
    dtype: jnp.dtype = jnp.float32
    # Brick-engine stride-1 conv formulation ("region" | "halo" | "zband");
    # see ops.brick.brick_conv / brick_conv_zband. "zband" keeps brick-level
    # features in the z-folded (B, bs, bs, bs*TC) layout across the whole
    # level so minor dims stay lane-tile aligned.
    conv_mode: str = "region"
    # "zband" only: fold levels [0, zband_levels). The fold trades k/(bs+2p)
    # FLOP inflation (3.33x at k=3, bs=8) for full MXU lanes — a clear win
    # only where channels are tiny (L0: 16-32 of 128 lanes). Deeper levels
    # run the plain dense-brick conv ("halo" assembly).
    zband_levels: int = 1
    # Rematerialize each residual block in the backward pass
    # (jax.checkpoint): activation memory drops ~[number of saved block
    # outputs]x for ~1/3 extra forward FLOPs — the TPU-idiomatic trade
    # when training at large capacities brushes the HBM ceiling.
    remat: bool = False
    # Fold ONLY the stem conv (k=5, TC 2->16) into the z-band layout
    # while the rest of the net runs halo mode: the stem's channel counts
    # fill 2-16 of 128 lanes unfolded, the regime where the zband fold
    # measured ahead (docs/DESIGN.md §7) — without paying the fold's
    # 3.33x FLOP inflation on the wide convs that made full zband lose.
    # Costs one unfold layout copy of the stem output.
    stem_zband: bool = False
    # Run the 1x1 head on the z-folded layout: the head OUTPUT's minor
    # dim becomes bs*T*C (16 lanes) instead of T*C (2), whose (8, 128)
    # tile padding cost ~4.7 ms of head elementwise passes (DESIGN §8
    # lever #2). Memory order is devoxelize-identical; costs one fold
    # copy of the 16-channel pre-head tensor.
    head_fold: bool = False
    # Inference-only int8 quantization of the brick-level 3^3 convs (the
    # five >4 ms/scan convs of the round-3 attribution all run there):
    # dynamic per-tensor activation scales, per-channel weight scales,
    # int8 MXU conv + f32 dequant (ops.brick.brick_conv_int8). The stem
    # stays bf16 (int8 measured 0.86x at its k=5/2-channel shape) and
    # training always runs the float path. Parity gate:
    # tests/test_int8.py (uIoU within 0.5 pt on the trained movers ckpt).
    int8: bool = False
    # Spatial sharding (parallel/spatial.py): name of the mesh axis over
    # which the brick/row dimension of every level is sharded. When set,
    # activations flow between convs as device-LOCAL blocks; each conv
    # all-gathers its input over this axis (the gather sources are global
    # row ids) and computes only its local output block, and BatchNorm
    # psums its moments. The point-cloud analog of sequence parallelism
    # (SURVEY.md §5). None = single-device layout.
    sp_axis: str | None = None
    # sp only: > 0 switches conv source assembly from a full all-gather to
    # the boundary-only ghost exchange with ghost capacity
    # ghost_frac * block per source level (parallel/spatial.py).
    sp_ghost_frac: float = 0.0


def _kaiming(key, shape, dtype=jnp.float32):
    """He-normal, fan_out with respect to (K*KT, Cin, Cout) conv kernels
    (matches the intent of the reference's kaiming_normal_(mode='fan_out'),
    resnet.py:87-94)."""
    import jax

    k, kt, _, cout = shape
    std = (2.0 / (k * kt * cout)) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


def _is_brick(lvl) -> bool:
    return isinstance(lvl, bk.BrickLevel)


def _is_row(lvl) -> bool:
    return isinstance(lvl, atl.RowLevel)


def occ_of(lvl):
    return lvl.grid.occ  # (V, T) or (B, 4, 4, 4, T)


def mask_any(feats, occ):
    if feats.ndim == 2:
        return sc.mask_slots(feats, occ)
    return bk.mask_bricks(feats, occ)


def cat_time(a, b, num_time):
    """Skip concat per time slot (ME.cat, minkunet.py:192-216): both
    operands live on the same coordinate set. Built from static last-axis
    slices (no reshape: reshapes of conv outputs force TPU layout
    copies). z-folded operands (4-D; zband mode) interleave per (z, t)
    block — same code, the block count is bs*T."""
    t = num_time
    if a.ndim == 4:
        t = t * a.shape[1]
    ca = a.shape[-1] // t
    cb = b.shape[-1] // t
    parts = []
    for i in range(t):
        parts.append(a[..., i * ca : (i + 1) * ca])
        parts.append(b[..., i * cb : (i + 1) * cb])
    return jnp.concatenate(parts, axis=-1)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over real (voxel, t) slots only (ME MinkowskiBatchNorm).

    Running stats follow torch conventions (momentum 0.1 on the *new*
    batch, unbiased variance in the running average) so converted
    checkpoints evaluate identically. Accepts feats (..., T*C) with
    occ (..., T)."""

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    sp_axis: str | None = None  # see MinkUNetConfig.sp_axis

    @nn.compact
    def __call__(self, feats: jnp.ndarray, occ: jnp.ndarray, train: bool,
                 affine: bool = False):
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))

        if affine:
            # Inference affine query (fused zband path): return the
            # per-channel (scale', bias') such that BN(x) = x*scale'+bias'
            # under running stats; the caller fuses them into the conv
            # epilogue (ops.pallas_conv.zband_conv_fused).
            inv = jnp.reciprocal(jnp.sqrt(ra_var.value + self.eps))
            return (
                (inv * scale).astype(jnp.float32),
                (bias - ra_mean.value * inv * scale).astype(jnp.float32),
            )

        shp = feats.shape
        dtype = feats.dtype
        t = occ.shape[-1]
        o2 = occ.reshape(-1, t)

        if train:
            f2 = feats.reshape(-1, shp[-1]).astype(jnp.float32)
            if self.sp_axis is None:
                mean, var = sc.masked_batch_stats(f2, o2)
                cnt = jnp.maximum(jnp.sum(o2, dtype=jnp.float32), 2.0)
            else:
                # Spatially sharded: feats/occ are the device-local brick
                # block; moments are additive, so one psum yields the
                # global statistics every shard normalizes with.
                import jax

                s1, s2, n = sc.masked_batch_moments(f2, o2)
                s1, s2, n = jax.lax.psum((s1, s2, n), self.sp_axis)
                cnt = jnp.maximum(n, 2.0)
                mean = s1 / jnp.maximum(n, 1.0)
                var = jnp.maximum(s2 / jnp.maximum(n, 1.0) - mean**2, 0.0)
            unbiased = var * cnt / (cnt - 1.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        # The per-channel affine is computed in f32 (tiny), but the big
        # tensor stays in its compute dtype and its layout: an f32 round
        # trip doubles the HBM traffic of this (memory-bound) op, and any
        # reshape of a conv output forces a TPU layout copy. Tiling the
        # affine to (T*C,) keeps everything elementwise on the raw shape.
        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        s = jnp.tile((inv * scale).astype(dtype), t)
        b = jnp.tile((bias - mean * inv * scale).astype(dtype), t)
        if train:
            x = f2 * s + b
            out = sc.mask_slots(x.astype(dtype), o2).reshape(shp)
        else:
            x = feats * s + b
            occ_rep = jnp.repeat(occ, c, axis=-1).astype(dtype)
            out = x * occ_rep
        return out.astype(dtype)


class SpConv(nn.Module):
    """Stride-1 sparse conv (either engine)."""

    cin: int
    cout: int
    ksize: int
    time_kernel: int
    num_time: int
    use_bias: bool = False  # ME MinkowskiConvolution default bias=False
    conv_mode: str = "region"
    # False elides the output mask when a MaskedBatchNorm follows (the BN
    # re-masks; saves one full-tensor pass per conv — see docs/DESIGN.md).
    mask_out: bool = True
    sp_axis: str | None = None  # see MinkUNetConfig.sp_axis
    # int8 MXU math for brick-level k=3 convs (callers set this only at
    # inference; see MinkUNetConfig.int8). Parameters are unchanged —
    # quantization is derived from the float kernel at call time.
    int8: bool = False

    @nn.compact
    def __call__(self, feats, lvl, occ, epilogue=None):
        """epilogue (folded zband brick levels, inference only): dict with
        per-channel BN 'scale'/'bias', channel-repeated 'occ_rep', optional
        masked 'res', and 'relu' — fused into the Pallas conv kernel."""
        k = self.ksize**3
        w0 = self.param("kernel", _kaiming, (k, self.time_kernel, self.cin, self.cout))
        w = w0.astype(feats.dtype)
        center = None
        if self.sp_axis is not None and self.ksize > 1:
            # Input is the device-local block; the (possibly remapped)
            # tables hold source row ids, so assemble the gather source —
            # full level (all-gather) or local+ghost rows (exchange). The
            # local block stays as the halo center (its own output domain).
            from sps_tpu.parallel import spatial as sp_mod

            center = feats
            feats = sp_mod.gather_source(feats, lvl, "self", self.sp_axis)
        if self.ksize == 1:
            bias = (
                self.param("bias", nn.initializers.zeros, (self.cout,))
                if self.use_bias
                else None
            )
            wp = sc.pack_time_toeplitz(w, self.num_time)[0]
            reps = self.num_time
            if feats.ndim == 4:
                # z-folded: block-diagonal weight (kron with I_bs) keeps the
                # matmul on the folded layout — no relayout, full lanes.
                bs = feats.shape[1]
                wp = jnp.kron(jnp.eye(bs, dtype=wp.dtype), wp)
                reps = self.num_time * bs
            # Leading dims stay batched (no reshape round-trip: the
            # reshape-back of the matmul output cost ~10 ms/scan in layout
            # copies at BLT scale).
            out = feats @ wp
            if bias is not None:
                # Cast the tiled bias to the compute dtype: an f32 bias
                # promotes the whole (B, bs^3, T*C) tensor chain to f32
                # (and its 2-lane head shape pads 64x in T(8,128) tiles) —
                # measured 4.7 ms of the head's elementwise passes.
                out = out + jnp.tile(bias, reps).astype(out.dtype)
            return mask_any(out, occ) if self.mask_out else out
        if _is_brick(lvl):
            wd = bk.pack_dense_kernel(w, self.num_time)
            if feats.ndim == 4:
                if epilogue is not None:
                    return bk.brick_conv_zband_fused(
                        feats, lvl.nbr27, wd,
                        epilogue["scale"], epilogue["bias"],
                        epilogue["occ_rep"], epilogue.get("res"),
                        num_time=self.num_time,
                        relu=epilogue.get("relu", True), center=center,
                    )
                return bk.brick_conv_zband(
                    feats, lvl.nbr27, wd, occ, mask_out=self.mask_out,
                    center=center,
                )
            # Unfolded levels under conv_mode="zband" use the halo assembly
            # (the measured-best dense-brick formulation at wide channels).
            mode = "halo" if self.conv_mode == "zband" else self.conv_mode
            if self.int8 and self.ksize == 3:
                # Quantize from the float master kernel, not the bf16 cast.
                wd8 = bk.pack_dense_kernel(w0, self.num_time)
                return bk.brick_conv_int8(
                    feats, lvl.nbr27, wd8, occ, mask_out=self.mask_out,
                    center=center,
                )
            return bk.brick_conv(
                feats, lvl.nbr27, wd, occ, mode, mask_out=self.mask_out,
                center=center,
            )
        wp = sc.pack_time_toeplitz(w, self.num_time)
        if _is_row(lvl):
            assert self.ksize == 3, "row levels carry 27-neighbor tables only"
            return sc.sparse_conv(
                feats, lvl.nbr27, wp, occ, mask_out=self.mask_out
            )
        return sc.sparse_conv(
            feats, lvl.nbr[self.ksize], wp, occ, mask_out=self.mask_out
        )


class SpConvDown(nn.Module):
    """Kernel (2,2,2,1), stride (2,2,2,1) conv (minkunet.py:64-70)."""

    cin: int
    cout: int
    num_time: int
    fold_out: bool = False  # return z-folded (target level is zband-folded)
    mask_out: bool = True  # see SpConv.mask_out
    sp_axis: str | None = None  # see MinkUNetConfig.sp_axis

    @nn.compact
    def __call__(self, feats, coarse_lvl):
        w = self.param("kernel", _kaiming, (8, 1, self.cin, self.cout))
        wp = sc.pack_time_toeplitz(w.astype(feats.dtype), self.num_time)
        occ = occ_of(coarse_lvl)
        if self.sp_axis is not None:
            # child tables hold fine-level source rows; assemble them.
            from sps_tpu.parallel import spatial as sp_mod

            feats = sp_mod.gather_source(feats, coarse_lvl, "child", self.sp_axis)
        if _is_brick(coarse_lvl):
            fin = feats
            if feats.ndim == 4:  # z-folded source level: unfold for gather
                fin = bk.unfold_z(feats, feats.shape[-1] // feats.shape[1])
            out = bk.brick_conv_down(
                fin, coarse_lvl.child, wp, occ, mask_out=self.mask_out
            )
            return bk.fold_z(out) if self.fold_out else out
        if _is_row(coarse_lvl):
            # Hybrid boundary: the finer features may still be brick-form
            # (5-D, or 4-D z-folded); child then indexes flat brick slots.
            # Both reshapes preserve memory order (z-major, t, c minor).
            if feats.ndim == 5:
                f2 = feats.reshape(-1, feats.shape[-1])
            elif feats.ndim == 4:
                f2 = feats.reshape(-1, feats.shape[-1] // feats.shape[1])
            else:
                f2 = feats
            return sc.sparse_conv_down(
                f2, coarse_lvl.child, wp, occ, mask_out=self.mask_out
            )
        return sc.sparse_conv_down(
            feats, coarse_lvl.child, wp, occ, mask_out=self.mask_out
        )


class SpConvUp(nn.Module):
    """Transpose conv (2,2,2,1) s2 (minkunet.py:107-147)."""

    cin: int
    cout: int
    num_time: int
    fold_out: bool = False  # return z-folded (target level is zband-folded)
    mask_out: bool = True  # see SpConv.mask_out
    sp_axis: str | None = None  # see MinkUNetConfig.sp_axis

    @nn.compact
    def __call__(self, feats, fine_lvl):
        w = self.param("kernel", _kaiming, (8, 1, self.cin, self.cout))
        wp = sc.pack_time_toeplitz(w.astype(feats.dtype), self.num_time)
        occ = occ_of(fine_lvl)
        if self.sp_axis is not None:
            # parent tables hold coarse-level source rows; assemble them
            # before the octant-selected pull.
            from sps_tpu.parallel import spatial as sp_mod

            feats = sp_mod.gather_source(feats, fine_lvl, "parent", self.sp_axis)
        if _is_brick(fine_lvl):
            if fine_lvl.parent_rows is not None:
                # Representation boundary: the coarse side is voxel rows
                # (2-D feats); parent_rows hold coarse ROW ids per fine
                # parent voxel.
                f2 = feats if feats.ndim == 2 else feats.reshape(-1, feats.shape[-1])
                out = bk.brick_conv_up_from_rows(
                    f2, fine_lvl.parent_rows, wp, occ, mask_out=self.mask_out
                )
            else:
                fin = feats
                if feats.ndim == 4:
                    fin = bk.unfold_z(feats, feats.shape[-1] // feats.shape[1])
                out = bk.brick_conv_up(
                    fin, fine_lvl.parent, fine_lvl.oct, wp, occ,
                    mask_out=self.mask_out,
                )
            return bk.fold_z(out) if self.fold_out else out
        return sc.sparse_conv_up(
            feats, fine_lvl.parent, fine_lvl.parity, wp, occ,
            mask_out=self.mask_out,
        )


class BasicBlock(nn.Module):
    """Residual unit: conv3-bn-relu-conv3-bn (+1x1 shortcut) -> relu."""

    cin: int
    planes: int
    num_time: int
    block_kernel: int = 3
    conv_mode: str = "region"
    sp_axis: str | None = None  # see MinkUNetConfig.sp_axis
    int8: bool = False  # inference-only; see MinkUNetConfig.int8

    @nn.compact
    def __call__(self, feats, lvl, occ, train: bool):
        # Masking discipline: every conv here feeds a MaskedBatchNorm,
        # which re-masks, so the convs run mask_out=False; relu preserves
        # zeros, and the sum of two masked operands is masked, so neither
        # relu needs a mask either. Inputs to convs stay fully masked
        # (phantom slots exactly zero) throughout — required by the
        # halo/neighbor gathers.
        t = self.num_time
        sp = self.sp_axis
        # Inference on folded zband brick levels fuses conv+BN+relu
        # (+residual) into the Pallas kernel epilogue: occ * relu(x*s+b)
        # == relu(occ*(x*s+b)) for occ in {0,1}, and masked(a)+masked(b)
        # commutes with the mask, so the fused math is bit-identical to
        # the unfused path under running statistics.
        if (
            not train
            and sp is None
            and self.conv_mode == "zband"
            and _is_brick(lvl)
            and feats.ndim == 4
        ):
            occ_rep = jnp.repeat(occ, self.planes, axis=-1).astype(feats.dtype)
            s1, b1 = MaskedBatchNorm(self.planes, sp_axis=sp, name="norm1")(
                None, occ, False, affine=True
            )
            out = SpConv(
                self.cin, self.planes, self.block_kernel, 3, t,
                conv_mode=self.conv_mode, mask_out=False, sp_axis=sp,
                name="conv1",
            )(feats, lvl, occ,
              epilogue={"scale": s1, "bias": b1, "occ_rep": occ_rep,
                        "relu": True})
            s2, b2 = MaskedBatchNorm(self.planes, sp_axis=sp, name="norm2")(
                None, occ, False, affine=True
            )
            if self.cin != self.planes:
                res = SpConv(
                    self.cin, self.planes, 1, 1, t, mask_out=False,
                    sp_axis=sp, name="downsample_conv",
                )(feats, lvl, occ)
                res = MaskedBatchNorm(
                    self.planes, sp_axis=sp, name="downsample_norm"
                )(res, occ, False)
            else:
                res = feats
            return SpConv(
                self.planes, self.planes, self.block_kernel, 3, t,
                conv_mode=self.conv_mode, mask_out=False, sp_axis=sp,
                name="conv2",
            )(out, lvl, occ,
              epilogue={"scale": s2, "bias": b2, "occ_rep": occ_rep,
                        "res": res, "relu": True})
        q8 = self.int8 and not train
        out = SpConv(
            self.cin,
            self.planes,
            self.block_kernel,
            3,
            t,
            conv_mode=self.conv_mode,
            mask_out=False,
            sp_axis=sp,
            int8=q8,
            name="conv1",
        )(feats, lvl, occ)
        out = MaskedBatchNorm(self.planes, sp_axis=sp, name="norm1")(out, occ, train)
        out = nn.relu(out)
        out = SpConv(
            self.planes,
            self.planes,
            self.block_kernel,
            3,
            t,
            conv_mode=self.conv_mode,
            mask_out=False,
            sp_axis=sp,
            int8=q8,
            name="conv2",
        )(out, lvl, occ)
        out = MaskedBatchNorm(self.planes, sp_axis=sp, name="norm2")(out, occ, train)
        if self.cin != self.planes:
            res = SpConv(
                self.cin, self.planes, 1, 1, t, mask_out=False, sp_axis=sp,
                name="downsample_conv",
            )(feats, lvl, occ)
            res = MaskedBatchNorm(self.planes, sp_axis=sp, name="downsample_norm")(
                res, occ, train
            )
        else:
            res = feats
        return nn.relu(out + res)


def _blocks(
    name, n, cin, planes, num_time, block_kernel=3, conv_mode="region",
    sp_axis=None, remat=False, int8=False,
):
    # static_argnums indexes flax's inner core_fn(scope, *call_args):
    # `train` is call arg 3 -> core_fn arg 4.
    cls = nn.remat(BasicBlock, static_argnums=(4,)) if remat else BasicBlock
    mods = []
    for i in range(n):
        mods.append(
            cls(
                cin if i == 0 else planes,
                planes,
                num_time,
                block_kernel,
                conv_mode,
                sp_axis,
                int8,
                name=f"{name}_{i}",
            )
        )
    return mods


class MinkUNet(nn.Module):
    """The UNet body. Inputs: level-0 features plus the prebuilt 5-level
    pyramid (ops.topology.build_levels or ops.brick.build_brick_levels)."""

    cfg: MinkUNetConfig

    @nn.compact
    def __call__(self, feats: jnp.ndarray, levels: Sequence, train: bool = False):
        cfg = self.cfg
        t = cfg.num_time
        p = cfg.planes
        d0 = cfg.init_dim
        l0, l1, l2, l3, l4 = levels
        zband = cfg.conv_mode == "zband"

        def is_folded(i, lv):
            return zband and i < cfg.zband_levels and _is_brick(lv)

        def occ_lvl(i, lv):
            o = occ_of(lv)
            if is_folded(i, lv):
                return o.reshape(o.shape[0], o.shape[1], o.shape[2], -1)
            return o

        fold = [is_folded(i, lv) for i, lv in enumerate(levels)]
        occ = [occ_lvl(i, lv) for i, lv in enumerate(levels)]
        if fold[0] and feats.ndim == 5:
            feats = bk.fold_z(feats)

        def relu(x, o):
            del o  # input is BN output: already masked, relu keeps zeros
            return nn.relu(x)

        # Stem (minkunet.py:55-62): kernel (5,5,5,1).
        stem_fold = (
            cfg.stem_zband
            and not fold[0]
            and _is_brick(l0)
            and feats.ndim == 5
            and cfg.sp_axis is None
        )
        sfeats = bk.fold_z(feats) if stem_fold else feats
        socc = (
            occ[0].reshape(occ[0].shape[0], occ[0].shape[1], occ[0].shape[2], -1)
            if stem_fold
            else occ[0]
        )
        x = SpConv(
            cfg.in_channels,
            d0,
            cfg.first_kernel,
            1,
            t,
            conv_mode=cfg.conv_mode,
            mask_out=False,
            sp_axis=cfg.sp_axis,
            name="conv0p1s1",
        )(
            sfeats, l0, socc
        )
        x = MaskedBatchNorm(d0, sp_axis=cfg.sp_axis, name="bn0")(x, socc, train)
        x = relu(x, socc)
        out_p1 = bk.unfold_z(x, t * d0) if stem_fold else x

        # Encoder.
        def down(x, name, cin, cout, coarse, bnname, occ_c, fold_out):
            y = SpConvDown(
                cin, cout, t, fold_out=fold_out, mask_out=False,
                sp_axis=cfg.sp_axis, name=name
            )(x, coarse)
            y = MaskedBatchNorm(cout, sp_axis=cfg.sp_axis, name=bnname)(y, occ_c, train)
            return relu(y, occ_c)

        x = down(out_p1, "conv1p1s2", d0, d0, l1, "bn1", occ[1], fold[1])
        for b in _blocks("block1", cfg.layers[0], d0, p[0], t, cfg.block_kernel, cfg.conv_mode, cfg.sp_axis, cfg.remat, cfg.int8):
            x = b(x, l1, occ[1], train)
        out_b1p2 = x

        x = down(x, "conv2p2s2", p[0], p[0], l2, "bn2", occ[2], fold[2])
        for b in _blocks("block2", cfg.layers[1], p[0], p[1], t, cfg.block_kernel, cfg.conv_mode, cfg.sp_axis, cfg.remat, cfg.int8):
            x = b(x, l2, occ[2], train)
        out_b2p4 = x

        x = down(x, "conv3p4s2", p[1], p[1], l3, "bn3", occ[3], fold[3])
        for b in _blocks("block3", cfg.layers[2], p[1], p[2], t, cfg.block_kernel, cfg.conv_mode, cfg.sp_axis, cfg.remat, cfg.int8):
            x = b(x, l3, occ[3], train)
        out_b3p8 = x

        x = down(x, "conv4p8s2", p[2], p[2], l4, "bn4", occ[4], fold[4])
        for b in _blocks("block4", cfg.layers[3], p[2], p[3], t, cfg.block_kernel, cfg.conv_mode, cfg.sp_axis, cfg.remat, cfg.int8):
            x = b(x, l4, occ[4], train)

        # Decoder (minkunet.py:107-158,188-217).
        def up(x, name, cin, cout, fine, bnname, occ_f, fold_out):
            y = SpConvUp(
                cin, cout, t, fold_out=fold_out, mask_out=False,
                sp_axis=cfg.sp_axis, name=name
            )(x, fine)
            y = MaskedBatchNorm(cout, sp_axis=cfg.sp_axis, name=bnname)(y, occ_f, train)
            return relu(y, occ_f)

        x = up(x, "convtr4p16s2", p[3], p[4], l3, "bntr4", occ[3], fold[3])
        x = cat_time(x, out_b3p8, t)
        for b in _blocks("block5", cfg.layers[4], p[4] + p[2], p[4], t, cfg.block_kernel, cfg.conv_mode, cfg.sp_axis, cfg.remat, cfg.int8):
            x = b(x, l3, occ[3], train)

        x = up(x, "convtr5p8s2", p[4], p[5], l2, "bntr5", occ[2], fold[2])
        x = cat_time(x, out_b2p4, t)
        for b in _blocks("block6", cfg.layers[5], p[5] + p[1], p[5], t, cfg.block_kernel, cfg.conv_mode, cfg.sp_axis, cfg.remat, cfg.int8):
            x = b(x, l2, occ[2], train)

        x = up(x, "convtr6p4s2", p[5], p[6], l1, "bntr6", occ[1], fold[1])
        x = cat_time(x, out_b1p2, t)
        for b in _blocks("block7", cfg.layers[6], p[6] + p[0], p[6], t, cfg.block_kernel, cfg.conv_mode, cfg.sp_axis, cfg.remat, cfg.int8):
            x = b(x, l1, occ[1], train)

        x = up(x, "convtr7p2s2", p[6], p[7], l0, "bntr7", occ[0], fold[0])
        x = cat_time(x, out_p1, t)
        for b in _blocks("block8", cfg.layers[7], p[7] + d0, p[7], t, cfg.block_kernel, cfg.conv_mode, cfg.sp_axis, cfg.remat, cfg.int8):
            x = b(x, l0, occ[0], train)

        # Head: 1x1 conv with bias (minkunet.py:152-158). (A per-point
        # head — gather N pre-head rows, then 1x1 — was measured SLOWER
        # e2e (12.1 vs 12.5 scans/s): 131k 32-byte row gathers cost more
        # than the dense 5.8M-slot matmul once the bias stays bf16.)
        if (
            cfg.head_fold
            and _is_brick(l0)
            and x.ndim == 5
            and cfg.sp_axis is None
        ):
            # Folded head (config.head_fold): fold z into channels, run
            # the 1x1 as the block-diagonal kron (the SpConv 4-dim path),
            # return the folded output. Row-major memory order equals the
            # unfolded (B,bs,bs,bs,T*C), so devoxelize_flat is unchanged.
            xh = bk.fold_z(x)
            o0 = occ[0]
            occ_h = o0.reshape(o0.shape[0], o0.shape[1], o0.shape[2], -1)
            return SpConv(
                p[7], cfg.out_channels, 1, 1, t, use_bias=True, name="final"
            )(xh, l0, occ_h)
        x = SpConv(p[7], cfg.out_channels, 1, 1, t, use_bias=True, name="final")(
            x, l0, occ[0]
        )
        return x
