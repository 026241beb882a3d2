"""Dense brick atlas: probe-free topology over a static AABB window.

Third-generation topology backend (after ops/hash.py probing tables and
ops/brick.py brick hashing). The observation: at brick granularity the
working set is *small*. A BLT-scale scan spans ~60 m; at brick side 8 and
0.1 m voxels that is ~80 bricks per axis — a dense int32 "atlas" mapping
brick cell -> compact brick row over the scan's AABB costs a few MB, far
cheaper than HBM-random probe chains. Every operation the probing hash
served becomes a single-round dense scatter or gather:

  * dedup/compaction: scatter-max occupancy into the atlas, exclusive
    cumsum over cells -> brick rows (no insertion rounds, no claim loops);
  * point -> brick row: one gather at the point's cell;
  * 27-neighborhood: 26 gathers at offset cells (no probe loop at all);
  * stride-2 downsample: cells coarsen arithmetically (bc >> 1), so the
    coarse atlas is built the same way from the fine brick list.

Shapes stay static: the atlas extent (cells per axis) is a compile-time
capacity; the dynamic AABB origin is data. Points outside the window set
the overflow flag and are dropped (the reference has no such bound, but
its scans are range-limited; see docs/DESIGN.md).

Replaces (for the model path) the hash-based equivalents of
MinkowskiEngine's coordinate manager — see ops/brick.py's docstring for
the reference mapping (/root/reference/src/sps/models/models.py:24-25).
The probing hash remains in use where the key space is genuinely large
(resident map table, radius join).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from sps_tpu.ops import brick as bk
from sps_tpu.ops import hash as vhash
from sps_tpu.ops import voxelize as vox

EMPTY = vhash.EMPTY


@flax.struct.dataclass
class AtlasGrid:
    """Brick grid whose lookup structure is a dense AABB atlas.

    Same role as brick.BrickGrid (coords/occ/num_bricks/overflow have
    identical semantics); `atlas` is the dense (NB*NX*NY*NZ,) int32 cell ->
    brick-row map and `origin` the (3,) brick coordinate of cell (0,0,0).
    `extent` is static metadata (not a pytree leaf) so grids cross jit
    boundaries without tracing the window shape.
    """

    coords: jnp.ndarray  # (Bcap, 4) int32 [batch, bx, by, bz]
    occ: jnp.ndarray  # (Bcap, bs, bs, bs, T) bfloat16 (exact 0/1 values)
    num_bricks: jnp.ndarray  # () int32
    atlas: jnp.ndarray  # (NB*NX*NY*NZ,) int32
    origin: jnp.ndarray  # (3,) int32
    overflow: jnp.ndarray  # () bool
    extent: tuple = flax.struct.field(pytree_node=False, default=())

    def _replace(self, **kw):  # NamedTuple-compatible spelling
        return self.replace(**kw)


def _cells(batch_idx, bc, origin, extent):
    """Flat cell ids + in-window mask for (N,) batch ids and (N, 3) brick
    coords."""
    nb, nx, ny, nz = extent
    rel = bc - origin[None, :]
    inb = (
        (batch_idx >= 0)
        & (batch_idx < nb)
        & jnp.all((rel >= 0) & (rel < jnp.array([nx, ny, nz])), axis=-1)
    )
    flat = ((batch_idx * nx + rel[:, 0]) * ny + rel[:, 1]) * nz + rel[:, 2]
    return jnp.where(inb, flat, nb * nx * ny * nz), inb


def atlas_rows(grid: AtlasGrid, batch_idx, bc):
    """Brick rows for (N,) batch ids + (N, 3) brick coords (EMPTY if
    absent/out of window). One gather, no probing."""
    flat, inb = _cells(batch_idx, bc, grid.origin, grid.extent)
    ncell = grid.extent[0] * grid.extent[1] * grid.extent[2] * grid.extent[3]
    r = jnp.concatenate([grid.atlas, jnp.array([EMPTY], jnp.int32)])[
        jnp.minimum(flat, ncell)
    ]
    return jnp.where(inb, r, EMPTY)


def _prefix_rows(occb: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix count minus one over a cell-occupancy bitmap.

    XLA lowers a plain jnp.cumsum over millions of elements to a slow
    chain of dynamic-slice reductions on TPU; a Hillis–Steele log-shift
    scan is ~log2(n) fully-vectorized passes instead."""
    x = occb.astype(jnp.int32)
    n = x.shape[0]
    k = 1
    while k < n:
        x = x + jnp.pad(x, (k, 0))[:n]
        k *= 2
    return x - 1


def _compact(occ_cells, capacity, extent, origin, src_cells=None, src_ok=None):
    """occupancy bitmap over cells -> (atlas, coords, num, overflow).

    atlas[cell] = compact brick row (EMPTY if vacant); coords[row] =
    [batch, bx, by, bz] of that brick (PAD_COORD beyond num).

    src_cells/src_ok: the (much shorter) list of source-entity cells that
    produced the occupancy — points at L0, fine bricks at coarser levels.
    The row->cell inversion then scatters |src| updates instead of
    iterating all ncell cells (TPU scatter cost scales with update count;
    measured 7 ms/level for the full-iota form at BLT scale)."""
    nb, nx, ny, nz = extent
    ncell = nb * nx * ny * nz
    occb = occ_cells > 0
    row_of_cell = _prefix_rows(occb)
    num = jnp.sum(occb.astype(jnp.int32))
    overflow = num > capacity
    atlas = jnp.where(occb & (row_of_cell < capacity), row_of_cell, EMPTY)
    # Invert: cell id of each brick row, then coords arithmetically.
    if src_cells is None:
        dest = jnp.where(atlas >= 0, atlas, capacity)
        cell_of_row = (
            jnp.full((capacity + 1,), 0, jnp.int32)
            .at[dest]
            .set(jnp.arange(ncell, dtype=jnp.int32), mode="drop")
        )[:capacity]
    else:
        aext = jnp.concatenate([atlas, jnp.array([EMPTY], jnp.int32)])
        rows = jnp.where(src_ok, aext[jnp.minimum(src_cells, ncell)], EMPTY)
        dest = jnp.where(rows >= 0, rows, capacity)
        cell_of_row = (
            jnp.zeros((capacity + 1,), jnp.int32)
            .at[dest]
            .set(src_cells, mode="drop")
        )[:capacity]
    b = cell_of_row // (nx * ny * nz)
    r = cell_of_row % (nx * ny * nz)
    cx = r // (ny * nz)
    cy = (r // nz) % ny
    cz = r % nz
    coords = jnp.stack(
        [b, cx + origin[0], cy + origin[1], cz + origin[2]], axis=-1
    ).astype(jnp.int32)
    valid_rows = jnp.arange(capacity) < jnp.minimum(num, capacity)
    coords = jnp.where(valid_rows[:, None], coords, vox.PAD_COORD)
    return atlas, coords, jnp.minimum(num, capacity), overflow


def voxelize_bricks(
    coords: jnp.ndarray,
    batch_idx: jnp.ndarray,
    t_idx: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    num_time: int,
    brick_capacity: int,
    brick_side: int,
    extent: tuple,
    features: jnp.ndarray | None = None,
):
    """Atlas-mode equivalent of brick.voxelize_bricks (same returns, with
    an AtlasGrid instead of a BrickGrid). extent = (NB, NX, NY, NZ) static
    window capacity in bricks; the dynamic origin is the min valid brick
    coordinate."""
    bs = brick_side
    assert bs & (bs - 1) == 0 and bs >= 2
    shift = bs.bit_length() - 1
    bvol = bs**3
    nb, nx, ny, nz = extent
    ncell = nb * nx * ny * nz

    bc = coords >> shift
    local = coords & (bs - 1)
    big = jnp.int32(1 << 30)
    origin = jnp.min(
        jnp.where(valid[:, None], bc, big), axis=0, initial=big
    ).astype(jnp.int32)
    flat, inb = _cells(batch_idx, bc, origin, extent)
    ok = valid & inb
    out_of_window = jnp.any(valid & ~inb)

    occ_cells = (
        jnp.zeros((ncell + 1,), jnp.int32)
        .at[flat]
        .max(ok.astype(jnp.int32), mode="drop")
    )[:ncell]
    atlas, coords_c, num, overflow = _compact(
        occ_cells, brick_capacity, extent, origin, src_cells=flat, src_ok=ok
    )
    overflow = overflow | out_of_window

    aext = jnp.concatenate([atlas, jnp.array([EMPTY], jnp.int32)])
    p2b = jnp.where(ok, aext[jnp.minimum(flat, ncell)], EMPTY)
    lflat = (local[:, 0] * bs + local[:, 1]) * bs + local[:, 2]
    point2slot = jnp.where(p2b >= 0, p2b * bvol + lflat, EMPTY)

    pb = jnp.where(p2b >= 0, p2b, brick_capacity)
    tcl = jnp.clip(t_idx, 0, num_time - 1)
    # Occupancy is kept in bf16 (values are exactly 0/1): every mask/BN
    # multiply in the network reads it, so f32 doubles that traffic.
    occ = (
        jnp.zeros((brick_capacity + 1, bvol, num_time), jnp.float32)
        .at[pb, lflat, tcl]
        .max(ok.astype(jnp.float32))
    )[:brick_capacity].reshape(brick_capacity, bs, bs, bs, num_time)
    occ = occ.astype(jnp.bfloat16)

    grid = AtlasGrid(
        coords=coords_c,
        occ=occ,
        num_bricks=num,
        atlas=atlas,
        origin=origin,
        extent=extent,
        overflow=overflow,
    )
    if features is None:
        return grid, point2slot
    c = features.shape[-1]
    w = ok.astype(features.dtype)
    cnt = (
        jnp.zeros((brick_capacity + 1, bvol, num_time), features.dtype)
        .at[pb, lflat, tcl]
        .add(w)
    )
    sums = (
        jnp.zeros((brick_capacity + 1, bvol, num_time, c), features.dtype)
        .at[pb, lflat, tcl]
        .add(features * w[:, None])
    )
    pooled = sums[:brick_capacity] / jnp.maximum(cnt[:brick_capacity, :, :, None], 1.0)
    pooled = pooled.reshape(brick_capacity, bs, bs, bs, num_time * c)
    return grid, point2slot, pooled


def downsample(grid: AtlasGrid, coarse_capacity: int, coarse_extent: tuple):
    """Coarse-level atlas grid (brick coords halve; ME stride-2 output
    coordinate set). Returns (coarse_grid, fine2coarse)."""
    bcap = grid.coords.shape[0]
    bs = grid.occ.shape[1]
    valid = jnp.arange(bcap) < grid.num_bricks
    fb = grid.coords[:, 1:] >> 1
    fbatch = jnp.where(valid, grid.coords[:, 0], -1)
    corigin = grid.origin >> 1
    nb, nx, ny, nz = coarse_extent
    ncell = nb * nx * ny * nz
    flat, inb = _cells(fbatch, fb, corigin, coarse_extent)
    ok = valid & inb
    occ_cells = (
        jnp.zeros((ncell + 1,), jnp.int32)
        .at[flat]
        .max(ok.astype(jnp.int32), mode="drop")
    )[:ncell]
    atlas, coords_c, num, overflow = _compact(
        occ_cells, coarse_capacity, coarse_extent, corigin, src_cells=flat, src_ok=ok
    )
    aext = jnp.concatenate([atlas, jnp.array([EMPTY], jnp.int32)])
    f2c = jnp.where(ok, aext[jnp.minimum(flat, ncell)], EMPTY)
    cgrid = AtlasGrid(
        coords=coords_c,
        occ=jnp.zeros(
            (coarse_capacity, bs, bs, bs, grid.occ.shape[-1]), jnp.bfloat16
        ),
        num_bricks=num,
        atlas=atlas,
        origin=corigin,
        extent=coarse_extent,
        overflow=overflow,
    )
    return cgrid, f2c


def neighbor_table(grid: AtlasGrid, offsets: np.ndarray) -> jnp.ndarray:
    """(K, Bcap) neighbor brick rows for static offsets: ONE dense gather
    over all K offsets (grouped-gather rule, docs/DESIGN.md §4), zero
    probe rounds (vs. hash _brick_lookup's probe loops)."""
    bcap = grid.coords.shape[0]
    k = len(offsets)
    valid = jnp.arange(bcap) < grid.num_bricks
    batch = jnp.where(valid, grid.coords[:, 0], -1)
    offs = jnp.asarray(np.asarray(offsets), jnp.int32)  # (K, 3)
    q = (grid.coords[None, :, 1:] + offs[:, None, :]).reshape(-1, 3)
    b = jnp.broadcast_to(batch[None, :], (k, bcap)).reshape(-1)
    return atlas_rows(grid, b, q).reshape(k, bcap)


def level_extents(extent: tuple, num_levels: int) -> list[tuple]:
    """Static per-level atlas extents: halve (ceil, +1 for origin-floor
    slack) per stride doubling."""
    exts = [extent]
    for _ in range(num_levels - 1):
        nb, nx, ny, nz = exts[-1]
        exts.append((nb, (nx >> 1) + 1, (ny >> 1) + 1, (nz >> 1) + 1))
    return exts


class RowGrid(flax.struct.PyTreeNode):
    """Compact voxel-row view of a deep level (see RowLevel)."""

    occ: jnp.ndarray  # (V, T)
    num_rows: jnp.ndarray  # ()
    overflow: jnp.ndarray  # ()


class RowLevel(flax.struct.PyTreeNode):
    """Voxel-row topology for a deep pyramid level.

    Deep MinkUNet levels are extremely sparse inside bricks (~5% slot
    occupancy at L3/L4 of a BLT scan), so the dense-brick formulation
    wastes 6-80x FLOPs/bytes on phantom slots there. This level type
    compacts the occupied (voxel, t) slots of a brick level into rows and
    runs the row-gather conv engine (ops.sparse_conv) on them — the
    brick machinery still provides all neighbor/parent structure, so no
    probing hash is involved.

    Index domains:
      * nbr27[k, v]  -> row in this level
      * child[k, c]  -> row in the FINER level, or flat brick slot
        (brick_row * bs^3 + local) if the finer level is brick-form
      * parent[v]    -> row in the COARSER level (with parity[v])
    """

    grid: RowGrid
    nbr27: jnp.ndarray  # (27, V)
    brick_of_row: jnp.ndarray  # (V,)
    lflat_of_row: jnp.ndarray  # (V,)
    child: jnp.ndarray | None = None  # (8, V)
    parent: jnp.ndarray | None = None  # (V,)
    parity: jnp.ndarray | None = None  # (V,)
    # Ghost-exchange spatial sharding (see brick.BrickLevel / spatial.py).
    ghost_self: jnp.ndarray | None = None
    ghost_child: jnp.ndarray | None = None
    ghost_parent: jnp.ndarray | None = None


def _row_compact(occ_any_flat: jnp.ndarray, capacity: int):
    """(S,) slot-occupancy -> (rowmap (S+1,), slot_of_row (V,), num,
    overflow). rowmap[s] = compact row or EMPTY; slot_of_row inverts it."""
    s = occ_any_flat.shape[0]
    flag = occ_any_flat > 0
    pref = _prefix_rows(flag)
    num = jnp.sum(flag.astype(jnp.int32))
    overflow = num > capacity
    rows = jnp.where(flag & (pref < capacity), pref, EMPTY)
    rowmap = jnp.concatenate([rows, jnp.array([EMPTY], jnp.int32)])
    dest = jnp.where(rows >= 0, rows, capacity)
    slot_of_row = (
        jnp.zeros((capacity + 1,), jnp.int32)
        .at[dest]
        .set(jnp.arange(s, dtype=jnp.int32), mode="drop")
    )[:capacity]
    return rowmap, slot_of_row, jnp.minimum(num, capacity), overflow



def alias_row_levels(levels: list, num_levels: int) -> list:
    """RowLevels for levels >= len(levels), ALIASED to shallow brick levels.

    For side-8 bricks, a level-(k+3) voxel (stride 2^(k+3)) covers exactly
    one level-k brick (a 2^k*8-voxel cube), so the deep level's row
    topology IS the shallow level's brick topology:

      * rows       := level-k brick rows (same compaction, same order)
      * occ[v, t]  := any(level-k brick occ[..., t])   (one reduce)
      * nbr27      := levels[k].nbr27                  (verbatim)
      * parent     := levels[k].parent, parity from levels[k].oct
      * child (deeper row levels) := levels[k].child   (verbatim)

    This replaces hybridize_levels' per-row builds (two 27*V-row gathers
    plus scatter inversions per level — ~8 ms/scan of the topology stage
    at BLT scale, the s32-gather wall of docs/DESIGN.md §4) with pure
    reuse of tables the brick levels already built. Callers build only
    `row_from` brick levels (build_levels(num_levels=row_from)) — the
    deep BRICK pyramid (downsample + neighbor tables at L3/L4) is never
    constructed at all.

    `levels`: the brick levels [0, row_from) — row_from must be >= 3 and
    the bricks side 8. Returns the full mixed pyramid of num_levels.
    """
    row_from = len(levels)
    assert row_from >= 3, "aliasing needs level k-3 to exist as bricks"
    assert levels[0].grid.occ.shape[1] == 8, "aliasing is a side-8 identity"
    out: list = list(levels)
    octs = jnp.asarray(np.asarray(bk.OCT_OFFSETS), jnp.int32)  # (8, 3)

    for li in range(row_from, num_levels):
        k = li - 3
        src = levels[k]
        bcap = src.grid.occ.shape[0]
        occ_rows = jnp.max(src.grid.occ, axis=(1, 2, 3))  # (B, T)

        if li == row_from:
            # Children live in the (row_from-1) BRICK level: the 2^3
            # stride-halved voxels of row i sit in brick
            # grandparent^2(i) (level k+2 == li-1) at local octant
            # 4*oct(k+1) + 2*oct(k) + delta per axis.
            p1 = src.parent
            l1 = levels[k + 1]
            gp = jnp.where(p1 >= 0, l1.parent[jnp.clip(p1, 0)], EMPTY)
            o1 = l1.oct[jnp.clip(p1, 0)]
            base = o1 * 4 + src.oct * 2  # (B, 3)
            loc = base[None, :, :] + octs[:, None, :]  # (8, B, 3)
            fl = (loc[..., 0] * 8 + loc[..., 1]) * 8 + loc[..., 2]
            child = jnp.where(gp[None, :] >= 0, gp[None, :] * 512 + fl, EMPTY)
        else:
            child = src.child  # fine rows ARE level k-1's brick rows

        parent = src.parent if li + 1 < num_levels else None
        parity = (
            (src.oct[:, 0] * 2 + src.oct[:, 1]) * 2 + src.oct[:, 2]
            if li + 1 < num_levels
            else None
        )
        out.append(
            RowLevel(
                grid=RowGrid(
                    occ=occ_rows,
                    num_rows=src.grid.num_bricks,
                    overflow=src.grid.overflow,
                ),
                nbr27=src.nbr27,
                # Rows alias level-k bricks; there is no same-level brick
                # form, so the brick/slot decomposition is the identity.
                brick_of_row=jnp.arange(bcap, dtype=jnp.int32),
                lflat_of_row=jnp.zeros((bcap,), jnp.int32),
                child=child,
                parent=parent,
                parity=parity,
            )
        )

    # Boundary: the fine BrickLevel (row_from-1) needs the (4,4,4) block
    # of first-row-level rows covering each brick, for its transpose
    # conv. Row rows are level-(row_from-3) brick rows: chain two stored
    # child tables (level f -> f-1 -> f-2) and interleave octants.
    f = row_from - 1
    fb = levels[f]
    bcap_f = fb.grid.occ.shape[0]
    c1 = levels[f].child  # (8, Bf) -> level f-1 rows
    c0 = levels[f - 1].child  # (8, Bf-1) -> level f-2 rows
    g = jnp.where(c1[None, :, :] >= 0, c0[:, jnp.clip(c1, 0)], EMPTY)
    # g[j0, j1, b]: delta = 2*oct(j1) + oct(j0) per axis, OCT x-slowest.
    g = g.reshape(2, 2, 2, 2, 2, 2, bcap_f)  # (a0,b0,c0, a1,b1,c1, B)
    parent_rows = jnp.transpose(g, (6, 3, 0, 4, 1, 5, 2)).reshape(
        bcap_f, 4, 4, 4
    )
    out[f] = fb._replace(parent_rows=parent_rows)
    return out


def hybridize_levels(
    levels: list, row_from: int, row_caps: tuple
) -> list:
    """Convert levels[row_from:] of a brick pyramid to RowLevels, wiring
    strided maps across the representation boundary.

    Returns a mixed list [BrickLevel, ..., RowLevel, ...]. The boundary
    fine BrickLevel (row_from - 1) gains a `parent_rows` table
    (Bf, bs/2, bs/2, bs/2) of coarse ROW ids for its transpose conv."""
    n = len(levels)
    assert 1 <= row_from < n
    out: list = list(levels)
    rowmaps: dict[int, jnp.ndarray] = {}
    rowlvls: dict[int, RowLevel] = {}

    for li in range(row_from, n):
        bl = levels[li]
        occ_b = bl.grid.occ
        bcap, bs = occ_b.shape[0], occ_b.shape[1]
        bvol = bs**3
        t = occ_b.shape[-1]
        s = bcap * bvol
        capacity = row_caps[li]
        occ_flat = occ_b.reshape(s, t)
        any_t = jnp.max(occ_flat, axis=-1)
        rowmap, slot_of_row, num, overflow = _row_compact(any_t, capacity)
        brick_of_row = slot_of_row // bvol
        lflat_of_row = slot_of_row % bvol
        valid_rows = jnp.arange(capacity) < num
        occ_rows = bk.take_rows(occ_flat, slot_of_row) * valid_rows[:, None]

        lx = lflat_of_row // (bs * bs)
        ly = (lflat_of_row // bs) % bs
        lz = lflat_of_row % bs

        # 27-neighbor voxel table via the brick 27-table (a voxel offset
        # of +-1 crosses at most one brick boundary per axis). All 27
        # offsets resolve with TWO grouped gathers (brick table, then
        # rowmap) instead of 54 per-offset ones (grouped-gather rule,
        # docs/DESIGN.md §4).
        offs = jnp.asarray(np.asarray(bk.OFFS27), jnp.int32)  # (27, 3)
        n3 = jnp.stack([lx, ly, lz])[None, :, :] + offs[:, :, None]  # (27,3,cap)
        c3 = jnp.clip(n3, -1, bs) // bs
        kidx = ((c3[:, 0] + 1) * 3 + (c3[:, 1] + 1)) * 3 + (c3[:, 2] + 1)
        bidx = (kidx * bcap + brick_of_row[None, :]).reshape(-1)
        nbrick = bl.nbr27.reshape(-1)[bidx].reshape(27, capacity)
        nlm = n3 & (bs - 1)
        nl = (nlm[:, 0] * bs + nlm[:, 1]) * bs + nlm[:, 2]
        slot = jnp.where(nbrick >= 0, nbrick * bvol + nl, s)
        nbr27 = rowmap[jnp.minimum(slot, s).reshape(-1)].reshape(27, capacity)
        nbr27 = jnp.where(valid_rows[None, :], nbr27, EMPTY)

        child = _hybrid_child(
            bl, levels[li - 1], brick_of_row, lx, ly, lz, bs,
            rowmaps.get(li - 1), valid_rows,
        )

        rowlvls[li] = RowLevel(
            grid=RowGrid(
                occ=occ_rows, num_rows=num, overflow=bl.grid.overflow | overflow
            ),
            nbr27=nbr27,
            brick_of_row=brick_of_row,
            lflat_of_row=lflat_of_row,
            child=child,
        )
        rowmaps[li] = rowmap

    # parent/parity links (fine row level -> coarse row level).
    for li in range(row_from, n - 1):
        rl = rowlvls[li]
        bl = levels[li]
        bs = bl.grid.occ.shape[1]
        hs = bs // 2
        pbrick = bl.parent[jnp.clip(rl.brick_of_row, 0)]
        octf = bl.oct[jnp.clip(rl.brick_of_row, 0)]  # (V, 3)
        lx = rl.lflat_of_row // (bs * bs)
        ly = (rl.lflat_of_row // bs) % bs
        lz = rl.lflat_of_row % bs
        # fine voxel u = bs*bc + l; parent voxel floor(u/2) lives in brick
        # parent[bc] at local (bs/2)*oct + (l >> 1).
        plx = octf[:, 0] * hs + (lx >> 1)
        ply = octf[:, 1] * hs + (ly >> 1)
        plz = octf[:, 2] * hs + (lz >> 1)
        pl = (plx * bs + ply) * bs + plz
        cbcap = levels[li + 1].grid.occ.shape[0]
        cs = cbcap * bs**3
        pslot = jnp.where(pbrick >= 0, pbrick * bs**3 + pl, cs)
        parent = rowmaps[li + 1][jnp.minimum(pslot, cs)]
        parity = ((lx & 1) * 2 + (ly & 1)) * 2 + (lz & 1)
        rowlvls[li] = rowlvls[li].replace(parent=parent, parity=parity)

    # Boundary: the fine BrickLevel (row_from - 1) gets coarse ROW ids of
    # its (bs/2)^3 parent-voxel block for the transpose conv.
    fb = levels[row_from - 1]
    bs = fb.grid.occ.shape[1]
    hs = bs // 2
    cbcap = levels[row_from].grid.occ.shape[0]
    cs = cbcap * bs**3
    ax = np.arange(hs)
    plx = fb.oct[:, 0, None, None, None] * hs + ax[None, :, None, None]
    ply = fb.oct[:, 1, None, None, None] * hs + ax[None, None, :, None]
    plz = fb.oct[:, 2, None, None, None] * hs + ax[None, None, None, :]
    pl = (plx * bs + ply) * bs + plz  # (Bf, hs, hs, hs)
    pbrick = fb.parent[:, None, None, None]
    pslot = jnp.where(pbrick >= 0, pbrick * bs**3 + pl, cs)
    parent_rows = rowmaps[row_from][jnp.minimum(pslot, cs)]
    out[row_from - 1] = fb._replace(parent_rows=parent_rows)
    for li in range(row_from, n):
        out[li] = rowlvls[li]
    return out


def _hybrid_child(
    bl,
    fine_bl,
    brick_of_row,
    lx,
    ly,
    lz,
    bs: int,
    fine_rowmap,
    valid_rows,
):
    """(8, V) down-conv sources for a row level: fine ROW ids if the finer
    level has a rowmap, else flat fine brick slots."""
    bcap = bl.grid.occ.shape[0]
    fbcap = fine_bl.grid.occ.shape[0]
    bvol = bs**3
    fs = fbcap * bvol
    cap = brick_of_row.shape[0]
    # All 8 octants via two grouped gathers (child table, then rowmap).
    octs = jnp.asarray(np.asarray(bk.OCT_OFFSETS), jnp.int32)  # (8, 3)
    f3 = 2 * jnp.stack([lx, ly, lz])[None, :, :] + octs[:, :, None]  # (8,3,cap)
    kflat = ((f3[:, 0] // bs) * 2 + (f3[:, 1] // bs)) * 2 + (f3[:, 2] // bs)
    cidx = (kflat * bcap + brick_of_row[None, :]).reshape(-1)
    fbrick = bl.child.reshape(-1)[cidx].reshape(8, cap)
    fm = f3 & (bs - 1)
    fl = (fm[:, 0] * bs + fm[:, 1]) * bs + fm[:, 2]
    fslot = jnp.where(fbrick >= 0, fbrick * bvol + fl, fs)
    if fine_rowmap is not None:
        outs = fine_rowmap[jnp.minimum(fslot, fs).reshape(-1)].reshape(8, cap)
    else:
        outs = jnp.where(fslot < fs, fslot, EMPTY)
    return jnp.where(valid_rows[None, :], outs, EMPTY)


def refresh_occupancy(levels: list, occ0: jnp.ndarray) -> list:
    """New per-scan occupancy through a CACHED topology pyramid.

    Topology tables (atlas, nbr27, child/parent/oct, parent_rows) depend
    only on the brick SET; per-slot occupancy is the only per-scan data.
    When consecutive scans' bricks are covered by a cached set (phantom
    slots contribute exact zeros through every masked layer), re-running
    the model with refreshed occupancy is bit-identical to a full rebuild
    — the basis of the streaming topology-reuse path (stream/engine.py).

    occ0: (Bcap, bs, bs, bs, T) level-0 occupancy scattered onto the
    cached brick rows (with the map-overlap bit already set). Brick levels
    re-derive occupancy via their child tables (2^3 max-pool); aliased row
    levels (alias_row_levels) re-derive it as the slot-max of brick level
    li - 3. Returns levels with every grid's occ replaced."""
    out = list(levels)
    occs: list = [occ0]
    out[0] = levels[0]._replace(grid=levels[0].grid._replace(occ=occ0))
    for li in range(1, len(levels)):
        lv = levels[li]
        if isinstance(lv, bk.BrickLevel):
            o = bk.coarse_occ_from_children(occs[li - 1], lv.child)
            occs.append(o)
            out[li] = lv._replace(grid=lv.grid._replace(occ=o))
        else:
            k = li - 3  # alias_row_levels: side-8 identity
            assert k >= 0 and occs[k] is not None, (
                "refresh_occupancy supports brick pyramids with "
                "alias_row_levels row levels (the shipping atlas config)"
            )
            # The aliasing itself must hold (row i of level li IS brick i
            # of level li-3): a hybridized pyramid (row_from set with
            # brick_side != 8, via hybridize_levels) would pass the k>=0
            # guard and get occupancy indexed in the wrong row order —
            # silently, if the capacities happen to coincide (ADVICE r4).
            assert lv.grid.occ.shape[0] == occs[k].shape[0], (
                f"row level {li} rows ({lv.grid.occ.shape[0]}) != brick "
                f"level {k} bricks ({occs[k].shape[0]}): not the "
                "alias_row_levels identity; rebuild topology instead"
            )
            o = jnp.max(occs[k], axis=(1, 2, 3))
            occs.append(None)
            out[li] = lv.replace(grid=lv.grid.replace(occ=o))
    return out


def build_levels(
    grid0: AtlasGrid, *, num_levels: int, capacities: tuple
) -> list[bk.BrickLevel]:
    """Atlas-mode topology pyramid; returns brick.BrickLevel objects (the
    UNet reads only grid.occ/nbr27/parent/oct/child, so the engines are
    interchangeable downstream)."""
    assert capacities[0] == grid0.coords.shape[0]
    exts = level_extents(grid0.extent, num_levels)
    grids = [grid0]
    f2c: list[jnp.ndarray] = []
    for li in range(num_levels - 1):
        cg, m = downsample(grids[-1], capacities[li + 1], exts[li + 1])
        f2c.append(m)
        grids.append(cg)

    levels: list[bk.BrickLevel] = []
    for li, g in enumerate(grids):
        bcap = g.coords.shape[0]
        nbr27 = neighbor_table(g, np.asarray(bk.OFFS27, np.int32))
        parent = f2c[li] if li < num_levels - 1 else None
        oct_ = (g.coords[:, 1:] & 1) if li < num_levels - 1 else None
        child = None
        if li > 0:
            fine = grids[li - 1]
            bf = fine.coords.shape[0]
            validf = jnp.arange(bf, dtype=jnp.int32) < fine.num_bricks
            octf = fine.coords[:, 1:] & 1
            kflat = octf[:, 0] * 4 + octf[:, 1] * 2 + octf[:, 2]
            fc = f2c[li - 1]
            dest = jnp.where(validf & (fc >= 0), fc, bcap)
            child = (
                jnp.full((8, bcap + 1), EMPTY, jnp.int32)
                .at[kflat, dest]
                .set(jnp.arange(bf, dtype=jnp.int32), mode="drop")
            )[:, :bcap]
            g = g._replace(occ=bk.coarse_occ_from_children(grids[li - 1].occ, child))
            grids[li] = g
        levels.append(
            bk.BrickLevel(grid=g, nbr27=nbr27, parent=parent, oct=oct_, child=child)
        )
    return levels
