"""Spatial sharding (sp): the brick/row axis of every pyramid level is
partitioned across mesh devices — the point-cloud analog of sequence
parallelism (SURVEY.md §5: "shard the voxel hash spatially across cores").

The reference is single-GPU and bounds scene size by pruning
(/root/reference/src/sps/datasets/blt_dataset.py:258-271); scenes that
exceed one chip's HBM have no path at all there. Here a scan/map scene can
be spread over an ICI mesh:

  * The topology build (voxelize + atlas pyramid) runs REPLICATED on every
    device — it is index-only (int32 tables) and a small fraction of scan
    time; replicating it avoids any cross-device coordination in the hash/
    scatter machinery.
  * Each device then owns a contiguous BLOCK of every level's brick (or
    voxel-row) axis: `slice_levels` slices each level's output-domain
    tables (occ, nbr27 columns, parent/child maps) to the local block.
  * Activations flow between convs as LOCAL blocks. A conv's gather
    sources are global row ids, so each conv all-gathers its input over
    the sp axis (one fused ICI all-gather per conv) and computes only its
    local output block. BatchNorm psums its masked moments; everything
    else is elementwise on local blocks.

Communication = one activation all-gather per conv + one psum pair per BN.
This is the all-gather formulation (Megatron-style sequence parallelism);
a boundary-only halo exchange (ppermute of the ~N^(2/3) boundary bricks)
is the planned refinement and slots into the same seams (the atlas
compaction is x-major, so contiguous row blocks are x-slabs and block
neighbors are almost always local).

Because the atlas orders brick rows by cell id (batch-major, then x), a
contiguous row block IS a spatial slab — the all-gather moves data that a
halo exchange would mostly skip, but the partition itself is genuinely
spatial and load-balanced by occupancy, not geometry.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from sps_tpu.ops import atlas as atl
from sps_tpu.ops import brick as bk

try:  # moved in newer jax
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover
    from jax.shard_map import shard_map  # type: ignore

from jax.sharding import PartitionSpec as P


def _axis_block(n_rows: int, axis: str):
    """(start, block) of this device's contiguous row block."""
    n = jax.lax.psum(1, axis)  # constant-folds to the axis size
    assert n_rows % n == 0, (
        f"capacity {n_rows} not divisible by sp axis size {n}; pick "
        f"capacities divisible by the mesh dimension"
    )
    blk = n_rows // n
    return jax.lax.axis_index(axis) * blk, blk


def _s0(x, axis):
    if x is None:
        return None
    start, blk = _axis_block(x.shape[0], axis)
    return jax.lax.dynamic_slice_in_dim(x, start, blk, 0)


def _s1(x, axis):
    if x is None:
        return None
    start, blk = _axis_block(x.shape[1], axis)
    return jax.lax.dynamic_slice_in_dim(x, start, blk, 1)


def slice_levels(levels: list, axis: str) -> list:
    """Device-local view of a (replicated) topology pyramid: slice each
    level's OUTPUT-domain tables to this device's contiguous row block.
    Table VALUES (global row ids into neighboring levels) are untouched —
    consumers all-gather their gather sources (minkunet.SpConv*)."""
    out = []
    for lv in levels:
        if isinstance(lv, atl.RowLevel):
            out.append(
                lv.replace(
                    grid=lv.grid.replace(occ=_s0(lv.grid.occ, axis)),
                    nbr27=_s1(lv.nbr27, axis),
                    brick_of_row=_s0(lv.brick_of_row, axis),
                    lflat_of_row=_s0(lv.lflat_of_row, axis),
                    child=_s1(lv.child, axis),
                    parent=_s0(lv.parent, axis),
                    parity=_s0(lv.parity, axis),
                )
            )
        elif isinstance(lv, bk.BrickLevel):
            g = lv.grid
            out.append(
                lv._replace(
                    grid=g._replace(
                        occ=_s0(g.occ, axis), coords=_s0(g.coords, axis)
                    ),
                    nbr27=_s1(lv.nbr27, axis),
                    parent=_s0(lv.parent, axis),
                    oct=_s0(lv.oct, axis),
                    child=_s1(lv.child, axis),
                    parent_rows=_s0(lv.parent_rows, axis),
                    cross_child=_s0(lv.cross_child, axis),
                    cross_par=_s0(lv.cross_par, axis),
                )
            )
        else:  # ops.topology gather-engine level
            g = lv.grid
            out.append(
                lv._replace(
                    grid=g._replace(
                        occ=_s0(g.occ, axis), coords=_s0(g.coords, axis)
                    ),
                    nbr={k: _s1(v, axis) for k, v in lv.nbr.items()},
                    child=_s1(lv.child, axis),
                    parent=_s0(lv.parent, axis),
                    parity=_s0(lv.parity, axis),
                )
            )
    return out


def sp_config(scfg, axis: str = "sp"):
    """An SPSConfig whose UNet runs spatially sharded over `axis`."""
    return dataclasses.replace(
        scfg, unet=dataclasses.replace(scfg.unet, sp_axis=axis)
    )


def make_sp_apply(model, mesh, axis: str = "sp"):
    """Jitted spatially-sharded forward of an SPSModel built with
    sp_config. All inputs/outputs are replicated (P()); the sharding is
    internal (local table slices + per-conv all-gathers)."""

    def body(variables, pb):
        scores, aux = model.apply(variables, pb)
        return scores, aux["overflow"]

    smapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(smapped)
