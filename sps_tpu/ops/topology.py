"""Multi-level sparse topology: kernel maps, down/up-sampling maps.

TPU-native equivalent of MinkowskiEngine's coordinate-manager kernel maps
(built in C++/CUDA when the reference runs its MinkUNet at
/root/reference/src/sps/models/MinkowskiEngine/minkunet.py:161-219). The
topology — voxel coordinate sets at every tensor stride, neighbor tables
for each kernel shape, and parent/child maps between strides — is built
**once per forward pass** from the stride-1 voxel set and then shared by
every convolution at that stride, instead of being rebuilt per layer.

Coordinates at level L are stored in units of the level's stride (the
reference keeps raw units and grows the tensor stride; dividing by two at
each downsampling is equivalent and keeps hash keys small).

Stride semantics match ME exactly:
  * down conv (kernel 2, stride 2): out[c] = sum_{k in {0,1}^3} W_k f[2c+k]
  * transpose conv (kernel 2, stride 2): each fine voxel u has exactly one
    contributing coarse voxel floor(u/2) with weight W_{u mod 2} — a single
    parity-selected gather.
  * stride-1 convs with odd kernels gather centered offsets.
"""

from __future__ import annotations

import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sps_tpu.ops import hash as vhash
from sps_tpu.ops import voxelize as vox


def kernel_offsets(size: int) -> np.ndarray:
    """Centered 3D offsets for an odd kernel, shape (size**3, 3) int32.

    Enumeration order is x-slowest / z-fastest (np.ndindex order). This is
    *our* canonical order; the torch-checkpoint converter permutes ME's
    kernel dimension into this order (see sps_tpu/convert.py).
    """
    assert size % 2 == 1
    r = size // 2
    offs = list(itertools.product(range(-r, r + 1), repeat=3))
    return np.asarray(offs, np.int32)


DOWN_OFFSETS = np.asarray(list(itertools.product((0, 1), repeat=3)), np.int32)


class Level(NamedTuple):
    """Sparse topology at one tensor stride.

    Attributes:
      grid: VoxelGrid (coords, occupancy, hash table) at this stride.
      nbr: dict kernel_size -> (K, V) int32 neighbor tables: nbr[k][i] is
        the row of coords[i] + offset_k, or -1. Built lazily per level for
        the kernel sizes requested.
      child: (8, V) int32 rows in the *finer* level of each voxel's up-to-8
        children (level 0 has none; entry i of DOWN_OFFSETS order), or -1.
      parent: (V,) int32 row in the *coarser* level of each voxel's parent
        (-1 at the coarsest level).
      parity: (V,) int32 in [0, 8): index into DOWN_OFFSETS of coords mod 2
        (selects the transpose-conv weight).
    """

    grid: vox.VoxelGrid
    nbr: dict
    child: jnp.ndarray | None
    parent: jnp.ndarray | None
    parity: jnp.ndarray | None


def _invert_rows(rows: jnp.ndarray, size: int) -> jnp.ndarray:
    """out[j] = i where rows[i] == j (EMPTY elsewhere); rows injective."""
    n = rows.shape[0]
    src = jnp.arange(n, dtype=jnp.int32)
    dest = jnp.where(rows >= 0, rows, size)
    return (
        jnp.full((size + 1,), vhash.EMPTY, jnp.int32)
        .at[dest]
        .set(src, mode="drop")
    )[:size]


def _neighbor_table(
    grid: vox.VoxelGrid, offsets: np.ndarray, chunk: int = 9
) -> jnp.ndarray:
    """(K, V) neighbor rows for each static offset; -1 where absent.

    Centered odd kernels are centrally symmetric, so only the offsets
    before the center are hash-looked-up; the mirror half follows by
    scatter inversion (j a neighbor of i at d ⟺ i a neighbor of j at -d)
    and the center is the identity — half the probe traffic.

    Offsets are looked up in chunks via lax.map so the probe loop's live
    set stays at chunk*V rows instead of K*V (a 125-offset kernel at
    V=262k would otherwise hold multi-GB gather buffers inside one
    while_loop)."""
    v = grid.coords.shape[0]
    k = offsets.shape[0]
    valid = jnp.arange(v) < grid.num_voxels
    # Detect the symmetric centered layout (kernel_offsets order).
    symmetric = k % 2 == 1 and np.all(offsets[::-1] == -offsets)
    nlook = k // 2 if symmetric else k
    lookups = offsets[:nlook]
    nchunks = max(-(-nlook // chunk), 1)
    padded = np.full((nchunks * chunk, 3), vox.PAD_COORD, np.int32)
    padded[:nlook] = lookups
    offs = jnp.asarray(padded.reshape(nchunks, chunk, 3))

    def one_chunk(off_c):  # (chunk, 3)
        q = jnp.concatenate(
            [
                jnp.broadcast_to(grid.coords[None, :, :1], (chunk, v, 1)),
                grid.coords[None, :, 1:] + off_c[:, None, :],
            ],
            axis=-1,
        ).reshape(chunk * v, 4)
        qvalid = jnp.broadcast_to(valid[None, :], (chunk, v)).reshape(-1)
        return vhash.lookup(grid.table, q, qvalid).reshape(chunk, v)

    rows = jax.lax.map(one_chunk, offs)  # (nchunks, chunk, v)
    rows = rows.reshape(nchunks * chunk, v)[:nlook]
    if not symmetric:
        return rows
    rowid = jnp.arange(v, dtype=jnp.int32)
    out = [None] * k
    for i in range(nlook):
        out[i] = rows[i]
        out[k - 1 - i] = _invert_rows(rows[i], v)
    out[nlook] = jnp.where(valid, rowid, vhash.EMPTY)
    return jnp.stack(out)


def build_levels(
    grid0: vox.VoxelGrid,
    *,
    num_levels: int,
    capacities: tuple[int, ...],
    kernel_sizes: tuple[tuple[int, ...], ...],
) -> list[Level]:
    """Build the full stride pyramid from the stride-1 voxel grid.

    Args:
      grid0: stride-1 VoxelGrid from voxelize().
      num_levels: number of levels (MinkUNet14 uses 5: strides 1,2,4,8,16).
      capacities: static voxel capacity per level (len == num_levels;
        capacities[0] must equal grid0's capacity).
      kernel_sizes: per level, which odd kernel sizes need neighbor tables
        (e.g. ((5, 3), (3,), (3,), (3,), (3,)) for SPS's MinkUNet14).

    Returns a list of Level, finest first.
    """
    assert len(capacities) == num_levels and len(kernel_sizes) == num_levels
    assert capacities[0] == grid0.coords.shape[0]

    levels: list[Level] = []
    grid = grid0
    parent_of: list[jnp.ndarray | None] = []
    for li in range(num_levels):
        nbr = {
            ks: _neighbor_table(grid, kernel_offsets(ks))
            for ks in kernel_sizes[li]
        }
        levels.append(Level(grid=grid, nbr=nbr, child=None, parent=None, parity=None))
        if li == num_levels - 1:
            parent_of.append(None)
            break
        v = grid.coords.shape[0]
        valid = jnp.arange(v) < grid.num_voxels
        coarse_coords = jnp.concatenate(
            [grid.coords[:, :1], grid.coords[:, 1:] >> 1], axis=-1
        )
        # Dedup the coarse coords; "points" here are the fine voxels, and
        # per-t occupancy ORs over children.
        cgrid, fine2coarse, _ = vox.voxelize(
            coarse_coords[:, 1:],
            coarse_coords[:, 0],
            jnp.zeros((v,), jnp.int32),
            valid,
            num_time=1,
            voxel_capacity=capacities[li + 1],
        )
        t = grid.occ.shape[1]
        safe = jnp.where(fine2coarse >= 0, fine2coarse, capacities[li + 1])
        occ_c = (
            jnp.zeros((capacities[li + 1] + 1, t), jnp.float32)
            .at[safe]
            .max(grid.occ * valid[:, None].astype(jnp.float32))
        )[: capacities[li + 1]]
        cgrid = cgrid._replace(occ=occ_c)
        parent_of.append(fine2coarse)
        grid = cgrid

    # Second pass: attach parent/parity/child maps.
    out: list[Level] = []
    for li, lvl in enumerate(levels):
        parent = parent_of[li]
        parity = None
        if parent is not None:
            xyz = lvl.grid.coords[:, 1:] & 1
            parity = (xyz[:, 0] << 2) | (xyz[:, 1] << 1) | xyz[:, 2]
        child = None
        if li > 0:
            # Derived from the downsample-time fine->coarse assignment
            # (fine voxel f with parity p is the (p, parent[f]) child) —
            # a scatter instead of 8*V fresh hash lookups.
            fine = levels[li - 1].grid
            v = lvl.grid.coords.shape[0]
            vf = fine.coords.shape[0]
            validf = jnp.arange(vf, dtype=jnp.int32) < fine.num_voxels
            pxyz = fine.coords[:, 1:] & 1
            pflat = (pxyz[:, 0] << 2) | (pxyz[:, 1] << 1) | pxyz[:, 2]
            fp = parent_of[li - 1]
            dest = jnp.where(validf & (fp >= 0), fp, v)
            child = (
                jnp.full((8, v + 1), vhash.EMPTY, jnp.int32)
                .at[pflat, dest]
                .set(jnp.arange(vf, dtype=jnp.int32), mode="drop")
            )[:, :v]
        out.append(lvl._replace(child=child, parent=parent, parity=parity))
    return out
