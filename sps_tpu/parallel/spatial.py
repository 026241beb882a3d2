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

Two source-assembly modes per conv:

  * ghost_frac = 0 — full all-gather of the input level per conv (the
    Megatron-sequence-parallel formulation). Simple, always correct.
  * ghost_frac > 0 — boundary-only GHOST EXCHANGE: because the atlas
    orders brick rows by cell id (batch-major, then x), a contiguous row
    block is a spatial slab, so the rows a shard references outside its
    own block are just the slab surface (~N^(2/3) of N). slice_levels
    compacts those global ids into a static-capacity ghost list per
    (level, table), remaps the tables into [local | ghost] index space,
    and each conv fetches only the ghost rows with one all_to_all
    (`exchange`) instead of all-gathering the level. Ghost capacity
    overflow is reported through the level overflow flag, never silent.

Communication per conv: all-gather of the level (mode 1) or
n_sp * ghost_cap rows (mode 2) + one psum pair per train-mode BN.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from sps_tpu.ops import atlas as atl
from sps_tpu.ops import brick as bk
from sps_tpu.ops import hash as vhash

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


def _ghost_plan(tables, src_cap: int, axis: str, ghost_cap: int):
    """Ghost plan for a source feature domain of src_cap rows.

    tables: list of (table, flat_divisor) whose VALUES reference global
    source rows (divisor > 1 when values are flat sub-slot ids
    row * divisor + local, e.g. brick-slot children). Marks every value
    outside this shard's [lo, lo+blk) block, compacts the marked globals
    into <= ghost_cap ghost slots, and remaps each table into the
    [0, blk) local | [blk, blk+ghost_cap) ghost index space.

    Returns (remapped_tables, ghost_ids (ghost_cap,), overflow)."""
    n = jax.lax.psum(1, axis)
    assert src_cap % n == 0, (src_cap, n)
    blk = src_cap // n
    lo = jax.lax.axis_index(axis) * blk
    mark = jnp.zeros((src_cap + 1,), jnp.int32)
    infos = []
    for t, div in tables:
        ids = t // div if div > 1 else t
        valid = t >= 0
        remote = valid & ((ids < lo) | (ids >= lo + blk))
        mark = mark.at[jnp.where(remote, ids, src_cap)].max(
            remote.astype(jnp.int32), mode="drop"
        )
        infos.append((t, div, ids, valid, remote))
    rowmap, ghost_ids, _num, overflow = atl._row_compact(mark[:src_cap], ghost_cap)
    remapped = []
    for t, div, ids, valid, remote in infos:
        slot = rowmap[jnp.clip(ids, 0, src_cap)]  # rowmap is (src_cap+1,)
        base = jnp.where(remote, blk + slot, ids - lo)
        new_t = base * div + (t % div) if div > 1 else base
        # Ghost overflow leaves slot = EMPTY: drop the entry (and report
        # overflow) rather than aliasing local row blk-1.
        ok = valid & jnp.where(remote, slot >= 0, True)
        remapped.append(jnp.where(ok, new_t, vhash.EMPTY))
    return remapped, ghost_ids, overflow


def exchange(x_local: jnp.ndarray, ghost_ids: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Fetch ghost rows from their owner shards: (blk, ...) local block +
    (G,) global row ids -> (blk+G, ...) [local | ghosts].

    One tiny id all-gather + one (n*G*rowbytes) all_to_all, vs. the
    all-gather formulation's (src_cap*rowbytes) — the win is the boundary
    fraction G/blk (x-major atlas ordering makes blocks spatial slabs, so
    G is the slab surface, ~N^(2/3))."""
    blk = x_local.shape[0]
    g = ghost_ids.shape[0]
    lo = jax.lax.axis_index(axis) * blk
    ids_all = jax.lax.all_gather(ghost_ids, axis, axis=0)  # (n, G)
    rel = ids_all - lo
    mine = (rel >= 0) & (rel < blk)
    flat = x_local.reshape(blk, -1)
    send = jnp.where(
        mine[..., None], flat[jnp.clip(rel, 0, blk - 1)], 0
    ).astype(x_local.dtype)  # (n, G, F): rows of MY block each shard needs
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
    ghosts = jnp.sum(recv, axis=0)  # each ghost row has exactly one owner
    return jnp.concatenate(
        [x_local, ghosts.reshape((g,) + x_local.shape[1:])], axis=0
    )


def gather_source(feats, lvl, kind: str, axis: str):
    """Assemble a conv's gather source under sp: ghost exchange when the
    level carries a plan for this table kind, else a full all-gather."""
    ids = getattr(lvl, f"ghost_{kind}", None)
    if ids is not None:
        return exchange(feats, ids, axis)
    return jax.lax.all_gather(feats, axis, axis=0, tiled=True)


def slice_levels(levels: list, axis: str, ghost_frac: float = 0.0) -> list:
    """Device-local view of a (replicated) topology pyramid: slice each
    level's OUTPUT-domain tables to this device's contiguous row block.

    ghost_frac = 0: table VALUES (global row ids into neighboring levels)
    are untouched and consumers all-gather their gather sources
    (minkunet.SpConv*). ghost_frac > 0: additionally build ghost plans —
    each table is remapped to [local | ghost] space with ghost capacity
    ceil(ghost_frac * block) per source domain, and convs exchange only
    boundary rows (see exchange). Ghost overflow is OR'd into the level's
    overflow flag (reported, never a recompile — the capacity discipline
    of docs/DESIGN.md §3)."""
    if ghost_frac > 0.0:
        return _slice_levels_ghost(levels, axis, ghost_frac)
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


def _slice_levels_ghost(levels: list, axis: str, frac: float) -> list:
    """Ghost-exchange variant of slice_levels: slice output-domain tables,
    then remap their values into [local | ghost] space with per-source
    ghost plans (capacity = frac * source block, rounded up to 64)."""
    import math

    n = jax.lax.psum(1, axis)

    def gcap(src_cap: int) -> int:
        blk = src_cap // n
        return min(blk * (n - 1), max(64, -(-int(blk * frac) // 64) * 64))

    def src_of(i: int) -> int:
        """Feature-row capacity of level i (brick rows or voxel rows)."""
        return levels[i].grid.occ.shape[0]

    out: list = []
    for li, lv in enumerate(levels):
        is_row = isinstance(lv, atl.RowLevel)
        cap = lv.grid.occ.shape[0]
        over = lv.grid.overflow

        nbr = _s1(lv.nbr27, axis)
        [nbr], g_self, ov = _ghost_plan([(nbr, 1)], cap, axis, gcap(cap))
        over = over | ov

        child = _s1(lv.child, axis)
        g_child = None
        if child is not None:
            scap = src_of(li - 1)
            prev = levels[li - 1]
            div = 1
            if is_row and not isinstance(prev, atl.RowLevel):
                # First row level: child values are flat brick slots
                # (brick_row * bs^3 + local) into the fine BRICK level.
                div = prev.grid.occ.shape[1] ** 3
            [child], g_child, ov = _ghost_plan(
                [(child, div)], scap, axis, gcap(scap)
            )
            over = over | ov

        parent = _s0(lv.parent, axis)
        g_parent = None
        if parent is not None:
            scap = src_of(li + 1)
            [parent], g_parent, ov = _ghost_plan(
                [(parent, 1)], scap, axis, gcap(scap)
            )
            over = over | ov

        if is_row:
            out.append(
                lv.replace(
                    grid=lv.grid.replace(occ=_s0(lv.grid.occ, axis), overflow=over),
                    nbr27=nbr,
                    brick_of_row=_s0(lv.brick_of_row, axis),
                    lflat_of_row=_s0(lv.lflat_of_row, axis),
                    child=child,
                    parent=parent,
                    parity=_s0(lv.parity, axis),
                    ghost_self=g_self,
                    ghost_child=g_child,
                    ghost_parent=g_parent,
                )
            )
        else:
            parent_rows = _s0(lv.parent_rows, axis)
            if parent_rows is not None:
                # Boundary transpose conv: values are coarse ROW ids of the
                # next (row-form) level. Shares the parent plan slot.
                assert parent is None, "parent and parent_rows both set"
                scap = src_of(li + 1)
                [parent_rows], g_parent, ov = _ghost_plan(
                    [(parent_rows, 1)], scap, axis, gcap(scap)
                )
                over = over | ov
            g = lv.grid
            out.append(
                lv._replace(
                    grid=g._replace(
                        occ=_s0(g.occ, axis), coords=_s0(g.coords, axis),
                        overflow=over,
                    ),
                    nbr27=nbr,
                    parent=parent,
                    oct=_s0(lv.oct, axis),
                    child=child,
                    parent_rows=parent_rows,
                    ghost_self=g_self,
                    ghost_child=g_child,
                    ghost_parent=g_parent,
                )
            )
    return out


def sp_config(scfg, axis: str = "sp", ghost_frac: float = 0.0):
    """An SPSConfig whose UNet runs spatially sharded over `axis`.

    ghost_frac > 0 switches the per-conv source assembly from a full
    all-gather to the boundary-only ghost exchange (see exchange)."""
    return dataclasses.replace(
        scfg,
        unet=dataclasses.replace(
            scfg.unet, sp_axis=axis, sp_ghost_frac=ghost_frac
        ),
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
