"""Sparse convolution primitives: gather-GEMM, time-packed 4D semantics.

TPU-native re-design of MinkowskiEngine's sparse convolutions (used by the
reference's MinkUNet at
/root/reference/src/sps/models/MinkowskiEngine/minkunet.py:55-158 and its
BasicBlock residual units). Three departures from the CUDA design:

1. **Time packed into channels.** The reference's 4D tensors have a time
   coordinate that is never strided (all strided convs use kernel/stride
   (2,2,2,1), minkunet.py:64-70) and takes T static values (T=2 for SPS:
   scan=1/map=0, util.py:20-21). We therefore store features as
   (V, T, C) over a 3D voxel set with a per-(voxel, t) occupancy mask; a
   4D conv with time kernel 3 becomes a 3D conv whose per-offset weight is
   a block-Toeplitz (T*Cin, T*Cout) matrix. 3^4=81 offsets -> 27, and the
   MXU sees matrices 2x wider on both sides.

2. **Gather-only forward.** Output rows equal input rows for stride-1
   convs, so out[i] = sum_k take(F, nbr_k[i]) @ W_k needs no scatter;
   autodiff produces the scatter-add only in the backward pass.

3. **Phantom-slot masking.** A (voxel, t) slot absent from the reference's
   4D coordinate set must contribute exactly zero to its neighbors. We
   multiply every conv output by the occupancy mask, which reproduces ME's
   "row does not exist" semantics bit-for-bit given masked inputs.

Weights are stored exactly like ME — (K_space, K_time, Cin, Cout), one
parameter shared by all (t_in, t_out) pairs with t_in - t_out = dt — so
converted torch checkpoints load directly and training gradients tie the
Toeplitz copies correctly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def take_rows(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of (V, ...) feats at idx (...,), 0 where idx < 0."""
    safe = jnp.clip(idx, 0)
    out = feats[safe]
    mask = (idx >= 0).astype(feats.dtype)
    return out * mask.reshape(mask.shape + (1,) * (out.ndim - mask.ndim))


def pack_time_toeplitz(w: jnp.ndarray, num_time: int) -> jnp.ndarray:
    """(K, KT, Cin, Cout) -> (K, T*Cin, T*Cout) block-Toeplitz matrices.

    KT is the time kernel extent (1 or odd). ME conv semantics:
    out[x, t_out] = sum_{off3, dt} W[off3, dt] . in[x + off3, t_out + dt],
    so the (t_in, t_out) block of the packed matrix is W[., dt = t_in-t_out]
    (zero when |dt| > KT//2).
    """
    k, kt, cin, cout = w.shape
    r = kt // 2
    t = num_time
    blocks = []
    for t_in in range(t):
        row = []
        for t_out in range(t):
            dt = t_in - t_out
            if -r <= dt <= r:
                row.append(w[:, dt + r])
            else:
                row.append(jnp.zeros((k, cin, cout), w.dtype))
        blocks.append(row)
    # (K, T*Cin, T*Cout)
    return jnp.concatenate(
        [jnp.concatenate(row, axis=-1) for row in blocks], axis=-2
    )


def sparse_conv(
    feats: jnp.ndarray,
    nbr: jnp.ndarray,
    w_packed: jnp.ndarray,
    occ: jnp.ndarray,
    *,
    unroll: bool = False,
    mask_out: bool = True,
) -> jnp.ndarray:
    """Stride-1 sparse conv: out[i] = sum_k F[nbr[k, i]] @ W[k].

    Assembled as ONE flat row gather in (V_out, K*TCin) memory order
    feeding ONE matmul against the (K*TCin, TCout) reshape of the packed
    weights: K separate per-offset gathers run ~3x slower on v5e (grouped
    gather rule, docs/DESIGN.md §4), and the (v, k) index order makes the
    gathered block contiguous with the weight reshape — no transpose.
    Absent neighbors (nbr = -1) gather a trailing zero row instead of a
    post-gather mask multiply.

    Args:
      feats: (V, T*Cin) input features (phantom slots already zero).
      nbr: (K, V) int32 neighbor table (-1 = absent).
      w_packed: (K, T*Cin, T*Cout) from pack_time_toeplitz.
      occ: (V, T) occupancy; output phantom slots are zeroed.
      unroll: unused (kept for call-site compatibility).
      mask_out: skip the output mask when the caller immediately
        re-masks (e.g. a MaskedBatchNorm follows).

    Returns: (V_out, T*Cout) where V_out = nbr.shape[1] (== V for stride-1
    convs; the coarse row count for strided convs).
    """
    del unroll
    v = nbr.shape[1]
    k = nbr.shape[0]
    tc = feats.shape[1]
    fz = jnp.concatenate([feats, jnp.zeros((1, tc), feats.dtype)], axis=0)
    idx = jnp.where(nbr >= 0, nbr, feats.shape[0]).T.reshape(-1)  # (v*k,)
    g = fz[idx].reshape(v, k * tc)
    out = g @ w_packed.reshape(k * tc, w_packed.shape[-1])
    return mask_slots(out, occ) if mask_out else out


def sparse_conv_down(
    feats: jnp.ndarray,
    child: jnp.ndarray,
    w_packed: jnp.ndarray,
    occ_coarse: jnp.ndarray,
    *,
    mask_out: bool = True,
) -> jnp.ndarray:
    """Strided conv (kernel 2, stride 2): gather 8 children per coarse row.

    Matches ME's MinkowskiConvolution(kernel_size=(2,2,2,1), stride=
    (2,2,2,1)) at minkunet.py:64-70.

    Args:
      feats: (V_fine, T*Cin).
      child: (8, V_coarse) rows into the fine level (DOWN_OFFSETS order).
      w_packed: (8, T*Cin, T*Cout).
      occ_coarse: (V_coarse, T).
    """
    return sparse_conv(feats, child, w_packed, occ_coarse, mask_out=mask_out)


def sparse_conv_up(
    feats: jnp.ndarray,
    parent: jnp.ndarray,
    parity: jnp.ndarray,
    w_packed: jnp.ndarray,
    occ_fine: jnp.ndarray,
    *,
    mask_out: bool = True,
) -> jnp.ndarray:
    """Transpose conv (kernel 2, stride 2): one parity-selected gather.

    Matches ME's MinkowskiConvolutionTranspose(kernel_size=(2,2,2,1),
    stride=(2,2,2,1)) at minkunet.py:107-147: output coordinates are the
    finer level's set; fine voxel u receives coarse voxel floor(u/2) through
    weight W[u mod 2] only.

    Args:
      feats: (V_coarse, T*Cin).
      parent: (V_fine,) coarse row per fine voxel.
      parity: (V_fine,) int32 in [0, 8).
      w_packed: (8, T*Cin, T*Cout).
      occ_fine: (V_fine, T).
    """
    gathered = take_rows(feats, parent)  # (V_fine, T*Cin)
    t = occ_fine.shape[1]
    cout = w_packed.shape[-1] // t
    out = jnp.zeros((gathered.shape[0], t * cout), feats.dtype)
    onehot = jax.nn.one_hot(parity, 8, dtype=feats.dtype)  # (V_fine, 8)
    for p in range(8):
        out = out + (gathered @ w_packed[p]) * onehot[:, p : p + 1]
    return mask_slots(out, occ_fine) if mask_out else out


def sparse_conv_1x1(
    feats: jnp.ndarray, w_packed: jnp.ndarray, occ: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Pointwise conv (kernel 1): a plain matmul per slot.

    w_packed: (T*Cin, T*Cout) (block-diagonal for a 4D 1x1 kernel).
    bias: optional (Cout,) — broadcast across time slots like ME's
    per-channel bias (used by the reference's final conv,
    minkunet.py:152-158).
    """
    out = feats @ w_packed
    if bias is not None:
        t = occ.shape[1]
        out = out + jnp.tile(bias, t)
    return mask_slots(out, occ)


def mask_slots(feats: jnp.ndarray, occ: jnp.ndarray) -> jnp.ndarray:
    """Zero features of phantom (voxel, t) slots. feats (V, T*C), occ (V, T).

    Elementwise multiply with channel-repeated occupancy — layout-agnostic
    (no reshape), so it fuses into the producer (see brick.mask_bricks)."""
    t = occ.shape[1]
    c = feats.shape[1] // t
    return feats * jnp.repeat(occ, c, axis=1).astype(feats.dtype)


def masked_batch_stats(
    feats: jnp.ndarray, occ: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel mean/var over *real* (voxel, t) slots.

    ME's MinkowskiBatchNorm computes statistics per channel over all
    existing coordinate rows (all time slots mixed); phantom slots must not
    contribute. Returns ((C,), (C,)).
    """
    v, tc = feats.shape
    t = occ.shape[1]
    c = tc // t
    x = feats.reshape(v, t, c)
    w = occ.astype(feats.dtype)[:, :, None]
    cnt = jnp.maximum(jnp.sum(w, dtype=jnp.float32).astype(feats.dtype), 1.0)
    mean = jnp.sum(x * w, axis=(0, 1)) / cnt
    var = jnp.sum(w * (x - mean) ** 2, axis=(0, 1)) / cnt
    return mean, var


def masked_batch_moments(
    feats: jnp.ndarray, occ: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-channel raw moments over real slots: (sum, sum-of-squares,
    count). Unlike masked_batch_stats these are ADDITIVE across shards, so
    a spatially-sharded BatchNorm psums them over the device axis and then
    forms mean = s1/n, var = s2/n - mean^2 (parallel/spatial.py)."""
    v, tc = feats.shape
    t = occ.shape[1]
    c = tc // t
    x = feats.reshape(v, t, c)
    w = occ.astype(feats.dtype)[:, :, None]
    s1 = jnp.sum(x * w, axis=(0, 1))
    s2 = jnp.sum(x * x * w, axis=(0, 1))
    cnt = jnp.sum(w, dtype=jnp.float32).astype(feats.dtype)
    return s1, s2, cnt
