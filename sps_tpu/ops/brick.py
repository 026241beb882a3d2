"""Dense-brick sparse engine: cubic voxel bricks with dense-halo convs.

Second-generation TPU-native backend for the same sparse-conv semantics as
sps_tpu.ops.sparse_conv (MinkowskiEngine equivalence, see that module's
docstring). Motivation (measured on v5e): TPU random row-gather throughput
is ~1e8 rows/s, so the per-voxel gather formulation costs ~1e8+ gathers
per scan (~30 s). Bricking restores dense structure:

  * Voxels live in bs^3 **bricks** (bs a power of two, default 4, chosen
    per deployment: larger bricks cut hash/topology/gather work by bs^3/64
    at the cost of more — MXU-cheap — phantom-slot FLOPs; at BLT scan
    density bs=8 has ~3.4x fewer bricks for 2.3x more slots);
    hashing/dedup/neighbor lookup happen at brick granularity.
  * A 3^3 (or 5^3) conv becomes a dense 3D convolution over halo-extended
    (6^3 / 8^3) brick blocks — pure MXU work, zero per-voxel gathers.
  * The halo exchange is **separable**: extend x from 2 neighbor-brick
    row-gathers, then extend y by gathering the already-x-extended rows,
    then z — 6 wide row-gathers per brick instead of 26, and diagonal
    neighbors arrive for free through the chaining.
  * Stride-2 down conv gathers a coarse brick's 8 children into an 8^3
    block and reduces 2^3 windows densely; transpose conv gathers the
    parent brick and expands its octant densely (ME stride semantics as in
    ops/topology.py).

Empty voxels inside occupied bricks are phantom slots, masked exactly like
the row-engine masks (occ has shape (B, 4, 4, 4, T)).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sps_tpu.ops import hash as vhash
from sps_tpu.ops import voxelize as vox

BS = 4  # default brick side; most functions derive the side from shapes
BVOL = BS**3

# x-slowest (0,1)^3 enumeration, shared with ops/topology.DOWN_OFFSETS.
OCT_OFFSETS = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]
NBR6_OFFSETS = np.asarray(
    [[-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1]],
    np.int32,
)


class BrickGrid(NamedTuple):
    coords: jnp.ndarray  # (B, 4) int32 [batch, bx, by, bz]; PAD_COORD pad
    occ: jnp.ndarray  # (B, 4, 4, 4, T) float32
    num_bricks: jnp.ndarray  # () int32
    table: vhash.HashTable  # brick coords -> compact row
    overflow: jnp.ndarray  # () bool


OFFS27 = [(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1) for c in (-1, 0, 1)]


class BrickLevel(NamedTuple):
    grid: BrickGrid
    nbr27: jnp.ndarray  # (27, B) neighbor brick rows (OFFS27 order)
    parent: jnp.ndarray | None  # (B,) coarse brick row
    oct: jnp.ndarray | None  # (B, 3) octant (bcoords & 1) per axis
    child: jnp.ndarray | None  # (8, B) fine brick rows (OCT_OFFSETS order)
    # Hybrid pyramids only (atlas.hybridize_levels): coarse ROW ids of
    # this level's (bs/2)^3 parent-voxel block, (B, bs/2, bs/2, bs/2) —
    # set on the fine level just below the brick->row boundary.
    parent_rows: jnp.ndarray | None = None
    # Spatial sharding, ghost-exchange mode only (parallel/spatial.py):
    # per-table lists of GLOBAL source rows this shard needs from other
    # shards. When set, the corresponding table (nbr27 / child / parent or
    # parent_rows) has been remapped into the [local | block+ghost-slot]
    # index space and convs fetch ghosts with an all_to_all instead of
    # all-gathering the full level.
    ghost_self: jnp.ndarray | None = None  # (G,) for nbr27
    ghost_child: jnp.ndarray | None = None  # (G,) for child (finer domain)
    ghost_parent: jnp.ndarray | None = None  # (G,) for parent/parent_rows


def take_rows(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather leading-axis rows; zeros where idx < 0."""
    safe = jnp.clip(idx, 0)
    out = feats[safe]
    mask = (idx >= 0).astype(feats.dtype)
    return out * mask.reshape(mask.shape + (1,) * (out.ndim - 1))


def voxelize_bricks(
    coords: jnp.ndarray,
    batch_idx: jnp.ndarray,
    t_idx: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    num_time: int,
    brick_capacity: int,
    features: jnp.ndarray | None = None,
    brick_side: int = BS,
) -> tuple[BrickGrid, jnp.ndarray] | tuple[BrickGrid, jnp.ndarray, jnp.ndarray]:
    """Dedup integer voxel coords into bricks.

    Returns (grid, point2slot[, pooled]) where point2slot is the flat index
    brick_row * bs^3 + local into the (B*bs^3,) voxel view (-1 invalid) —
    directly usable with ops.voxelize.devoxelize on (B*bs^3, T, C) arrays.
    With `features` (N, C), also returns (B, bs,bs,bs, T*C) mean-pooled
    per-slot features (ME UNWEIGHTED_AVERAGE, as in ops.voxelize).
    """
    bs = brick_side
    assert bs & (bs - 1) == 0 and bs >= 2, "brick side must be a power of two"
    shift = bs.bit_length() - 1
    bvol = bs**3
    n = coords.shape[0]
    bc = coords >> shift  # arithmetic shift = floor-div for negatives
    local = coords & (bs - 1)
    key = jnp.concatenate([batch_idx[:, None], bc], axis=-1).astype(jnp.int32)
    table_cap = vhash.next_pow2(max(2 * n, 16))
    raw, slot_of = vhash.build(key, valid, table_cap)

    occupied = raw.rows >= 0
    brick_of_slot = jnp.cumsum(occupied.astype(jnp.int32)) - 1
    num = jnp.sum(occupied.astype(jnp.int32))
    overflow = num > brick_capacity

    dest = jnp.where(occupied & (brick_of_slot < brick_capacity), brick_of_slot, brick_capacity)
    coords_c = jnp.full((brick_capacity, 4), vox.PAD_COORD, jnp.int32).at[dest].set(
        raw.keys, mode="drop"
    )
    rows_c = jnp.where(
        occupied & (brick_of_slot < brick_capacity), brick_of_slot, vhash.EMPTY
    )
    table = vhash.HashTable(keys=raw.keys, rows=rows_c)

    p2b = jnp.where(valid & (slot_of >= 0), brick_of_slot[jnp.clip(slot_of, 0)], vhash.EMPTY)
    p2b = jnp.where(p2b < brick_capacity, p2b, vhash.EMPTY)
    lflat = (local[:, 0] * bs + local[:, 1]) * bs + local[:, 2]
    point2slot = jnp.where(p2b >= 0, p2b * bvol + lflat, vhash.EMPTY)

    pb = jnp.where(p2b >= 0, p2b, brick_capacity)
    occ = (
        jnp.zeros((brick_capacity + 1, bvol, num_time), jnp.float32)
        .at[pb, lflat, jnp.clip(t_idx, 0, num_time - 1)]
        .max(valid.astype(jnp.float32))
    )[:brick_capacity].reshape(brick_capacity, bs, bs, bs, num_time)

    grid = BrickGrid(
        coords=coords_c,
        occ=occ,
        num_bricks=jnp.minimum(num, brick_capacity),
        table=table,
        overflow=overflow,
    )
    if features is None:
        return grid, point2slot
    c = features.shape[-1]
    tcl = jnp.clip(t_idx, 0, num_time - 1)
    w = valid.astype(features.dtype)
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


def invert_rows(rows: jnp.ndarray, size: int) -> jnp.ndarray:
    """Invert an injective row map: out[j] = i where rows[i] == j (EMPTY
    elsewhere). Used to derive mirror-offset neighbor tables (if j is i's
    neighbor at offset d, then i is j's neighbor at -d) and child maps from
    parent maps — one scatter instead of a fresh hash lookup."""
    n = rows.shape[0]
    src = jnp.arange(n, dtype=jnp.int32)
    dest = jnp.where(rows >= 0, rows, size)
    return (
        jnp.full((size + 1,), vhash.EMPTY, jnp.int32)
        .at[dest]
        .set(src, mode="drop")
    )[:size]


def _brick_lookup(grid: BrickGrid, offsets: np.ndarray) -> jnp.ndarray:
    """(K, B) neighbor brick rows for static brick-coordinate offsets."""
    b = grid.coords.shape[0]
    k = offsets.shape[0]
    valid = jnp.arange(b) < grid.num_bricks
    offs = jnp.asarray(offsets, jnp.int32)
    q = jnp.concatenate(
        [
            jnp.broadcast_to(grid.coords[None, :, :1], (k, b, 1)),
            grid.coords[None, :, 1:] + offs[:, None, :],
        ],
        axis=-1,
    ).reshape(k * b, 4)
    qv = jnp.broadcast_to(valid[None, :], (k, b)).reshape(-1)
    return vhash.lookup(grid.table, q, qv).reshape(k, b)


def downsample_bricks(grid: BrickGrid, coarse_capacity: int) -> tuple[BrickGrid, jnp.ndarray]:
    """Coarse-level brick grid (voxel stride doubles => brick coords halve).

    Returns (coarse_grid, fine2coarse). Coarse occupancy is the 2^3
    max-pool of the assembled children (ME stride-2 output coordinate set).
    """
    b = grid.coords.shape[0]
    valid = jnp.arange(b) < grid.num_bricks
    ckey = jnp.concatenate([grid.coords[:, :1], grid.coords[:, 1:] >> 1], axis=-1)
    ckey = jnp.where(valid[:, None], ckey, vox.PAD_COORD)
    table_cap = vhash.next_pow2(max(2 * b, 16))
    raw, slot_of = vhash.build(ckey, valid, table_cap)
    occupied = raw.rows >= 0
    cid_of_slot = jnp.cumsum(occupied.astype(jnp.int32)) - 1
    num = jnp.sum(occupied.astype(jnp.int32))
    overflow = num > coarse_capacity
    dest = jnp.where(occupied & (cid_of_slot < coarse_capacity), cid_of_slot, coarse_capacity)
    coords_c = jnp.full((coarse_capacity, 4), vox.PAD_COORD, jnp.int32).at[dest].set(
        raw.keys, mode="drop"
    )
    rows_c = jnp.where(occupied & (cid_of_slot < coarse_capacity), cid_of_slot, vhash.EMPTY)
    table = vhash.HashTable(keys=raw.keys, rows=rows_c)
    fine2coarse = jnp.where(
        valid & (slot_of >= 0), cid_of_slot[jnp.clip(slot_of, 0)], vhash.EMPTY
    )
    fine2coarse = jnp.where(fine2coarse < coarse_capacity, fine2coarse, vhash.EMPTY)

    bs = grid.occ.shape[1]
    cgrid = BrickGrid(
        coords=coords_c,
        occ=jnp.zeros((coarse_capacity, bs, bs, bs, grid.occ.shape[-1])),
        num_bricks=jnp.minimum(num, coarse_capacity),
        table=table,
        overflow=overflow,
    )
    return cgrid, fine2coarse


def gather_children(fine_vals: jnp.ndarray, child: jnp.ndarray) -> jnp.ndarray:
    """Assemble (Bc, 2bs,2bs,2bs, C) fine blocks from (8, Bc) child rows
    over (Bf, bs,bs,bs, C) fine values (zeros where absent). Assembled via
    nested concatenation (dynamic-update-slices would copy the full block
    per octant). Rows are gathered from the 2D-flattened view — multi-dim
    row gathers run ~5x slower on TPU (see halo)."""
    bf = fine_vals.shape[0]
    flat = fine_vals.reshape(bf, -1)
    tail = fine_vals.shape[1:]

    def blk(k):
        return take_rows(flat, child[k]).reshape((child.shape[1],) + tail)

    def cz(a, b):  # combine along z
        return jnp.concatenate([a, b], axis=3)

    def cy(a, b):
        return jnp.concatenate([a, b], axis=2)

    def cx(a, b):
        return jnp.concatenate([a, b], axis=1)

    # OCT_OFFSETS is x-slowest: index = 4a + 2b + c.
    return cx(
        cy(cz(blk(0), blk(1)), cz(blk(2), blk(3))),
        cy(cz(blk(4), blk(5)), cz(blk(6), blk(7))),
    )


def coarse_occ_from_children(fine_occ: jnp.ndarray, child: jnp.ndarray) -> jnp.ndarray:
    """(Bc, bs,bs,bs, T) coarse occupancy = OR over the 2^3 fine windows."""
    t = fine_occ.shape[-1]
    bs = fine_occ.shape[1]
    big = gather_children(fine_occ, child)  # (Bc, 2bs,2bs,2bs,T)
    bc = big.shape[0]
    return big.reshape(bc, bs, 2, bs, 2, bs, 2, t).max(axis=(2, 4, 6))


def build_brick_levels(
    grid0: BrickGrid, *, num_levels: int, capacities: tuple[int, ...]
) -> list[BrickLevel]:
    """Brick topology pyramid, finest first (cf. topology.build_levels)."""
    assert capacities[0] == grid0.coords.shape[0]
    grids = [grid0]
    f2c: list[jnp.ndarray] = []
    for li in range(num_levels - 1):
        cg, m = downsample_bricks(grids[-1], capacities[li + 1])
        f2c.append(m)
        grids.append(cg)

    levels: list[BrickLevel] = []
    for li, g in enumerate(grids):
        b = g.coords.shape[0]
        valid_rows = jnp.arange(b, dtype=jnp.int32) < g.num_bricks
        # 27-neighbor table: look up only the 13 offsets before the center;
        # the mirrored half follows by inversion (OFFS27[26-k] == -OFFS27[k])
        # and the center is the identity — half the hash-probe traffic.
        half = _brick_lookup(g, np.asarray(OFFS27[:13], np.int32))  # (13, B)
        rowid = jnp.arange(b, dtype=jnp.int32)
        nbr = [None] * 27
        for k in range(13):
            nbr[k] = half[k]
            nbr[26 - k] = invert_rows(half[k], b)
        nbr[13] = jnp.where(valid_rows, rowid, vhash.EMPTY)
        nbr27 = jnp.stack(nbr)
        parent = f2c[li] if li < num_levels - 1 else None
        oct_ = (g.coords[:, 1:] & 1) if li < num_levels - 1 else None
        child = None
        if li > 0:
            # Child maps come from the downsample-time fine->coarse
            # assignment: fine brick bf with octant o is the (o, f2c[bf])
            # child — a scatter, not 8*B fresh hash lookups.
            fine = grids[li - 1]
            bf = fine.coords.shape[0]
            validf = jnp.arange(bf, dtype=jnp.int32) < fine.num_bricks
            octf = fine.coords[:, 1:] & 1
            kflat = octf[:, 0] * 4 + octf[:, 1] * 2 + octf[:, 2]
            fc = f2c[li - 1]
            dest = jnp.where(validf & (fc >= 0), fc, b)
            child = (
                jnp.full((8, b + 1), vhash.EMPTY, jnp.int32)
                .at[kflat, dest]
                .set(jnp.arange(bf, dtype=jnp.int32), mode="drop")
            )[:, :b]
            # occupancy at this level comes from the children
            g = g._replace(occ=coarse_occ_from_children(grids[li - 1].occ, child))
            grids[li] = g
        levels.append(BrickLevel(grid=g, nbr27=nbr27, parent=parent, oct=oct_, child=child))
    return levels


def _src_dst(d: int, pad: int, bs: int):
    n = bs + 2 * pad
    if d == -1:
        return slice(bs - pad, bs), slice(0, pad)
    if d == 0:
        return slice(0, bs), slice(pad, pad + bs)
    return slice(0, pad), slice(pad + bs, n)


def _halo_impl(
    feats: jnp.ndarray, nbr27: jnp.ndarray, pad: int,
    center: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(B, bs,bs,bs, C) -> (B', bs+2p, bs+2p, bs+2p, C): direct 26-neighbor
    assembly. The source array is statically sliced BEFORE the row gather
    so each neighbor contributes only its face/edge/corner bytes (a
    separable/chained assembly would be cheaper but drops diagonal
    contributions whenever the intermediate face brick is absent).

    `center`: the output-domain block of feats (defaults to feats itself).
    Under spatial sharding (parallel/spatial.py) nbr27 holds only the
    device-local output bricks' columns while feats is the all-gathered
    full level, so the center slab — which is NOT fetched through nbr27 —
    must be passed as the local block explicitly. B' = nbr27.shape[1].

    Gather formulation (measured on v5e at B=12k, bs=8, C=32): gathers of
    multi-dim rows run ~5x slower than the same bytes as flat 2D rows, and
    26 separate gather ops cost ~3x more than a few stacked ones. So the
    26 slabs are grouped into 3 gathers — faces / edges / corners have
    equal flattened slab lengths within a class — over axis-0-stacked
    sources with offset row ids (97 ms -> ~9 ms). The halo is then one
    nested 27-piece concatenation (a single fused write; the previous
    .at[].set form cost 26 full-tensor copy passes)."""
    b, bs, _, _, c = feats.shape
    assert 1 <= pad <= bs
    if center is None:
        center = feats

    def spans(dx, dy, dz):
        sx, _ = _src_dst(dx, pad, bs)
        sy, _ = _src_dst(dy, pad, bs)
        sz, _ = _src_dst(dz, pad, bs)
        return sx, sy, sz

    classes: dict[int, list] = {1: [], 2: [], 3: []}
    for k, (dx, dy, dz) in enumerate(OFFS27):
        if (dx, dy, dz) == (0, 0, 0):
            continue
        classes[abs(dx) + abs(dy) + abs(dz)].append((k, dx, dy, dz))

    bout = nbr27.shape[1]
    pieces: dict[int, jnp.ndarray] = {}
    for items in classes.values():
        srcs = []
        idxs = []
        shapes = []
        for k, dx, dy, dz in items:
            sx, sy, sz = spans(dx, dy, dz)
            sl = feats[:, sx, sy, sz]
            shapes.append(sl.shape[1:])
            srcs.append(sl.reshape(b, -1))
            idxs.append(nbr27[k])
        # One trailing zero row folds into the (already materializing)
        # concat; absent neighbors (idx -1) gather IT instead of paying a
        # full-width clip + mask multiply after the gather (the multiply
        # alone was ~8 ms/scan at BLT scale).
        zrow = jnp.zeros((1, srcs[0].shape[1]), feats.dtype)
        stack = jnp.concatenate(srcs + [zrow], axis=0)  # (len*b+1, L)
        idx = jnp.stack(idxs)  # (len, bout)
        off = (jnp.arange(len(items), dtype=jnp.int32) * b)[:, None]
        flat_idx = jnp.where(idx >= 0, idx + off, len(items) * b).reshape(-1)
        g = stack[flat_idx].reshape(len(items), bout, -1)
        for i, (k, dx, dy, dz) in enumerate(items):
            pieces[k] = g[i].reshape((bout,) + shapes[i])

    k = 0
    xs = []
    for dx in (-1, 0, 1):
        ys = []
        for dy in (-1, 0, 1):
            zs = []
            for dz in (-1, 0, 1):
                zs.append(center if (dx, dy, dz) == (0, 0, 0) else pieces[k])
                k += 1
            ys.append(jnp.concatenate(zs, axis=3))
        xs.append(jnp.concatenate(ys, axis=2))
    return jnp.concatenate(xs, axis=1)


def _halo_bwd_core(nbr27, g, pad, tc=None):
    """Gather-transpose of the halo assembly.

    The autodiff transpose of the class-grouped slab gather is a giant
    scatter-add (XLA TPU scatter serializes on update rows — measured to
    dominate the training step). Brick adjacency is symmetric
    (OFFS27[26-k] == -OFFS27[k], and level tables satisfy
    nbr27[k][b] == s  <=>  nbr27[26-k][s] == b for real bricks; phantom
    rows carry EMPTY), so the transpose is ANOTHER halo-style gather: the
    cotangent slab a source brick contributed to output b at offset k
    comes back from row nbr27[26-k][source]. Static-slice .at[].add then
    accumulates the 27 slabs — no dynamic scatter anywhere."""
    bout = nbr27.shape[1]
    folded = tc is not None
    h = g.shape[1]
    bs = h - 2 * pad

    def spans(dx, dy, dz, which):
        out = []
        for dd in (dx, dy, dz):
            s_, t_ = _src_dst(dd, pad, bs)
            out.append(s_ if which == 0 else t_)
        return out

    def zsl(sl):
        return slice(sl.start * tc, sl.stop * tc)

    cx, cy, cz = spans(0, 0, 0, 1)
    d = g[:, cx, cy, zsl(cz) if folded else cz]

    classes: dict[int, list] = {1: [], 2: [], 3: []}
    for k, (dx, dy, dz) in enumerate(OFFS27):
        if (dx, dy, dz) == (0, 0, 0):
            continue
        classes[abs(dx) + abs(dy) + abs(dz)].append((k, dx, dy, dz))

    for items in classes.values():
        srcs = []
        idxs = []
        shps = []
        for k, dx, dy, dz in items:
            tx, ty, tz = spans(dx, dy, dz, 1)
            sl = g[:, tx, ty, zsl(tz) if folded else tz]
            shps.append(sl.shape[1:])
            srcs.append(sl.reshape(bout, -1))
            idxs.append(nbr27[26 - k])
        zrow = jnp.zeros((1, srcs[0].shape[1]), g.dtype)
        stack = jnp.concatenate(srcs + [zrow], axis=0)
        idx = jnp.stack(idxs)
        off = (jnp.arange(len(items), dtype=jnp.int32) * bout)[:, None]
        flat = jnp.where(idx >= 0, idx + off, len(items) * bout).reshape(-1)
        gg = stack[flat].reshape(len(items), bout, -1)
        for i, (k, dx, dy, dz) in enumerate(items):
            sx, sy, sz = spans(dx, dy, dz, 0)
            piece = gg[i].reshape((bout,) + shps[i])
            if folded:
                d = d.at[:, sx, sy, zsl(sz)].add(piece)
            else:
                d = d.at[:, sx, sy, sz].add(piece)
    return d


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _halo_sym(feats, nbr27, pad):
    return _halo_impl(feats, nbr27, pad)


def _halo_sym_fwd(feats, nbr27, pad):
    return _halo_impl(feats, nbr27, pad), nbr27


def _halo_sym_bwd(pad, nbr27, g):
    return (
        _halo_bwd_core(nbr27, g, pad),
        np.zeros(nbr27.shape, jax.dtypes.float0),
    )


_halo_sym.defvjp(_halo_sym_fwd, _halo_sym_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _halo_z_sym(zfeats, nbr27, pad, tc):
    return _halo_z_impl(zfeats, nbr27, pad, tc)


def _halo_z_sym_fwd(zfeats, nbr27, pad, tc):
    return _halo_z_impl(zfeats, nbr27, pad, tc), nbr27


def _halo_z_sym_bwd(pad, tc, nbr27, g):
    return (
        _halo_bwd_core(nbr27, g, pad, tc=tc),
        np.zeros(nbr27.shape, jax.dtypes.float0),
    )


_halo_z_sym.defvjp(_halo_z_sym_fwd, _halo_z_sym_bwd)


def halo(feats, nbr27, pad, center=None):
    """Public halo assembly (see _halo_impl). Single-device symmetric
    tables take the gather-transpose VJP; spatial-sharding calls (center
    passed / asymmetric row spaces) fall back to autodiff."""
    if center is None and feats.shape[0] == nbr27.shape[1]:
        return _halo_sym(feats, nbr27, pad)
    return _halo_impl(feats, nbr27, pad, center)


def halo_z(zfeats, nbr27, pad, tc, center=None):
    """Public z-folded halo assembly (see _halo_z_impl); VJP as in halo."""
    if center is None and zfeats.shape[0] == nbr27.shape[1]:
        return _halo_z_sym(zfeats, nbr27, pad, tc)
    return _halo_z_impl(zfeats, nbr27, pad, tc, center)


def fold_z(feats: jnp.ndarray) -> jnp.ndarray:
    """(B, bs, bs, bs, TC) -> (B, bs, bs, bs*TC): fold the z axis into
    channels (z-major, t, c minor — memory order is unchanged, only the
    tile layout). With TC*bs a multiple of 128 the folded form fills TPU
    lane tiles that the TC-minor form wastes (e.g. TC=16 uses 16 of 128
    lanes), which is what makes the zband conv formulation fast."""
    b, bs = feats.shape[0], feats.shape[1]
    return feats.reshape(b, bs, bs, -1)


def unfold_z(zfeats: jnp.ndarray, tc: int) -> jnp.ndarray:
    """(B, bs, bs, bs*TC) -> (B, bs, bs, bs, TC)."""
    b, bs = zfeats.shape[0], zfeats.shape[1]
    return zfeats.reshape(b, bs, bs, bs, tc)


def _halo_z_impl(
    zfeats: jnp.ndarray, nbr27: jnp.ndarray, pad: int, tc: int,
    center: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """z-folded halo: (B, bs, bs, bs*TC) -> (B', bs+2p, bs+2p, (bs+2p)*TC).

    Same 26-neighbor assembly and 3-gather grouping as `halo` (see its
    docstring for the measured rationale and the `center` contract), but z
    slab selection and the final z concatenation happen on the folded
    channel axis, so the pieces and the result keep lane-tile-aligned
    minor dims throughout."""
    b, bs = zfeats.shape[0], zfeats.shape[1]
    assert 1 <= pad <= bs
    if center is None:
        center = zfeats

    def span(d):
        s, _ = _src_dst(d, pad, bs)
        return s

    classes: dict[int, list] = {1: [], 2: [], 3: []}
    for k, (dx, dy, dz) in enumerate(OFFS27):
        if (dx, dy, dz) == (0, 0, 0):
            continue
        classes[abs(dx) + abs(dy) + abs(dz)].append((k, dx, dy, dz))

    bout = nbr27.shape[1]
    pieces: dict[int, jnp.ndarray] = {}
    for items in classes.values():
        srcs = []
        idxs = []
        shapes = []
        for k, dx, dy, dz in items:
            sx, sy, sz = span(dx), span(dy), span(dz)
            sl = zfeats[:, sx, sy, sz.start * tc : sz.stop * tc]
            shapes.append(sl.shape[1:])
            srcs.append(sl.reshape(b, -1))
            idxs.append(nbr27[k])
        # Trailing zero row instead of post-gather masking (see halo()).
        zrow = jnp.zeros((1, srcs[0].shape[1]), zfeats.dtype)
        stack = jnp.concatenate(srcs + [zrow], axis=0)
        idx = jnp.stack(idxs)
        off = (jnp.arange(len(items), dtype=jnp.int32) * b)[:, None]
        flat_idx = jnp.where(idx >= 0, idx + off, len(items) * b).reshape(-1)
        g = stack[flat_idx].reshape(len(items), bout, -1)
        for i, (k, dx, dy, dz) in enumerate(items):
            pieces[k] = g[i].reshape((bout,) + shapes[i])

    k = 0
    xs = []
    for dx in (-1, 0, 1):
        ys = []
        for dy in (-1, 0, 1):
            zs = []
            for dz in (-1, 0, 1):
                zs.append(center if (dx, dy, dz) == (0, 0, 0) else pieces[k])
                k += 1
            ys.append(jnp.concatenate(zs, axis=3))
        xs.append(jnp.concatenate(ys, axis=2))
    return jnp.concatenate(xs, axis=1)


def pack_zband_kernel(w_dense: jnp.ndarray, bs: int, pad: int) -> jnp.ndarray:
    """(k, k, k, TCin, TCout) -> (k, k, (bs+2p)*TCin, bs*TCout) 2D kernel
    whose channel axes carry the folded z dimension: output z-block zo
    reads input (halo) z-blocks zo..zo+k-1 through the original kz taps,
    i.e. a block-banded matrix per (kx, ky) tap. The band is k/(bs+2p)
    dense (3.3x FLOPs at k=3, bs=8) but every matmul runs with >=128-lane
    shapes, which nets out well ahead at small TC."""
    k, _, _, tcin, tcout = w_dense.shape
    h = bs + 2 * pad
    wb = w_dense.reshape(k, k, k * tcin, tcout)
    wz = jnp.zeros((k, k, h * tcin, bs * tcout), w_dense.dtype)
    for zo in range(bs):
        wz = wz.at[:, :, zo * tcin : (zo + k) * tcin, zo * tcout : (zo + 1) * tcout].set(wb)
    return wz


def brick_conv_zband(
    zfeats: jnp.ndarray,
    nbr27: jnp.ndarray,
    w_dense: jnp.ndarray,
    occz: jnp.ndarray,
    *,
    mask_out: bool = True,
    center: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Stride-1 sparse conv in the z-folded layout: assemble the folded
    halo and run ONE 2D conv whose channel axes carry z (pack_zband_kernel).

    zfeats: (B, bs, bs, bs*TCin); occz: (B', bs, bs, bs*T) folded occupancy.
    Returns (B', bs, bs, bs*TCout) — output stays folded, so the masks, BN,
    residual adds and skip concats that follow never pay a layout copy.
    `center`: local output-domain block of zfeats (see halo)."""
    from sps_tpu.ops import pallas_conv

    k = w_dense.shape[0]
    pad = k // 2
    bs = zfeats.shape[1]
    tcin = zfeats.shape[-1] // bs
    h = halo_z(zfeats, nbr27, pad, tcin, center=center)
    wz = pack_zband_kernel(w_dense, bs, pad)
    # Pallas banded-matmul kernel (~135 TF/s on v5e vs ~45 TF/s for the
    # XLA conv lowering of the same contraction); XLA fallback on CPU.
    out = pallas_conv.zband_conv(h, wz, k, bs)
    return mask_bricks(out, occz) if mask_out else out


def brick_conv_zband_fused(
    zfeats: jnp.ndarray,
    nbr27: jnp.ndarray,
    w_dense: jnp.ndarray,
    scale_c: jnp.ndarray,
    bias_c: jnp.ndarray,
    occ_rep: jnp.ndarray,
    res: jnp.ndarray | None = None,
    *,
    num_time: int,
    relu: bool = True,
    center: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Inference-fused zband conv: occ * [relu](conv * scale + bias
    [+ res]) in ONE Pallas kernel — the separate BN/relu/mask passes (and
    the layout copies XLA inserts around extra custom-call boundaries)
    collapse into the conv epilogue.

    scale_c/bias_c: per-channel (C,) f32 BN affine from running stats;
    occ_rep: (B, bs, bs, bs*T*C) channel-repeated folded occupancy;
    res: optional masked residual of the same shape. Not differentiable
    (training uses brick_conv_zband + live BN statistics)."""
    from sps_tpu.ops import pallas_conv

    k = w_dense.shape[0]
    pad = k // 2
    bs = zfeats.shape[1]
    tcin = zfeats.shape[-1] // bs
    h = halo_z(zfeats, nbr27, pad, tcin, center=center)
    wz = pack_zband_kernel(w_dense, bs, pad)
    # Affine tiled to the folded (z, t, c)-minor channel axis.
    s = jnp.tile(scale_c.astype(jnp.float32), bs * num_time)
    b = jnp.tile(bias_c.astype(jnp.float32), bs * num_time)
    return pallas_conv.zband_conv_fused(
        h, wz, s, b, occ_rep, res, k=k, bs=bs, relu=relu
    )


def brick_conv_int8(
    feats: jnp.ndarray,
    nbr27: jnp.ndarray,
    w_dense: jnp.ndarray,
    occ: jnp.ndarray,
    *,
    mask_out: bool = True,
    center: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Stride-1 sparse conv with int8 MXU math (inference only).

    v5e's MXU runs int8 at 2x the bf16 MAC rate and the halo assembly
    moves half the bytes (measured at the five hot shipping conv shapes:
    1.42-1.73x conv+dequant vs bf16, scripts/microbench_int8.py). Scheme:

      * activations: dynamic per-tensor symmetric scale from one abs-max
        pass (phantom slots are exactly zero, so they quantize to zero and
        the masking semantics are unchanged);
      * weights: per-output-channel symmetric scales from the dense
        (k,k,k,TCin,TCout) kernel;
      * conv accumulates in int32 (27*TCin*127^2 ~ 1.4e7 << 2^31), then
        one fused dequant epilogue applies s_in * s_w[cout] and returns
        the caller's compute dtype.

    Quantization happens BEFORE the halo assembly so the 26-slab gathers
    move int8. Not differentiable (training stays bf16/f32)."""
    k = w_dense.shape[0]
    pad = k // 2
    # Activation scale: abs-max in the storage dtype (exact for the max),
    # scaling/rounding in f32 (bf16's 8-bit mantissa would add its own
    # rounding on top of the int8 step).
    amax = jnp.max(jnp.abs(feats)).astype(jnp.float32)
    s_in = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    inv = 1.0 / s_in

    def q8(x):
        return jnp.clip(
            jnp.round(x.astype(jnp.float32) * inv), -127.0, 127.0
        ).astype(jnp.int8)

    qc = None if center is None else q8(center)
    h = halo(q8(feats), nbr27, pad, center=qc)
    wf = w_dense.astype(jnp.float32)
    wmax = jnp.max(jnp.abs(wf), axis=(0, 1, 2, 3))
    s_w = jnp.maximum(wmax, 1e-12) * (1.0 / 127.0)
    wq = jnp.clip(jnp.round(wf / s_w), -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        h, wq, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.int32,
    )
    out = (acc.astype(jnp.float32) * (s_in * s_w)).astype(feats.dtype)
    return mask_bricks(out, occ) if mask_out else out


def mask_bricks(feats: jnp.ndarray, occ: jnp.ndarray) -> jnp.ndarray:
    """Zero phantom (voxel, t) slots. feats (B,s,s,s,T*C), occ (B,s,s,s,T).

    Implemented as an elementwise multiply with channel-repeated occupancy
    (NOT a reshape to (..., T, C)): reshapes of conv outputs force layout
    copies — conv results live batch-minor on TPU — while elementwise ops
    are layout-agnostic and fuse into the producer."""
    t = occ.shape[-1]
    c = feats.shape[-1] // t
    return feats * jnp.repeat(occ, c, axis=-1).astype(feats.dtype)


def _conv3d(x, w, padding):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1, 1),
        padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        # f32 inputs get full-precision accumulation via HIGHEST. bf16
        # inputs keep bf16 outputs: the MXU accumulates bf16 convs in f32
        # internally, and a preferred_element_type=f32 here breaks the
        # grad trace (the conv transpose rule would pair a f32 cotangent
        # with the bf16 operand and conv requires matching dtypes).
        precision=(
            jax.lax.Precision.HIGHEST
            if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )


def brick_conv(
    feats: jnp.ndarray,
    nbr27: jnp.ndarray,
    w_dense: jnp.ndarray,
    occ: jnp.ndarray,
    mode: str = "region",
    *,
    mask_out: bool = True,
    center: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Stride-1 sparse conv as dense 3D conv over halo blocks.

    w_dense: (k, k, k, T*Cin, T*Cout) in x-slowest offset order (matches
    ops.topology.kernel_offsets; XLA convs are cross-correlations so no
    flip).

    mode="region" (kernel 3 only): a SAME conv over own-brick voxels plus
    one small conv per neighbor region (6 faces, 12 edges, 8 corners),
    each adding into the output boundary slice — avoids materializing the
    halo tensor. mode="halo": materialize the concat-assembled halo and
    run one VALID conv — ~3x fewer HLO ops (faster compiles), more HBM
    traffic. Larger kernels (the 5^3 stem) always use the halo path.

    `center`: local output-domain block of feats (see halo); under
    spatial sharding nbr27/occ cover only the local bricks.
    """
    k = w_dense.shape[0]
    bs = feats.shape[1]
    pad = k // 2
    if k != 3 or mode == "halo":
        h = halo(feats, nbr27, pad, center=center)
        out = _conv3d(h, w_dense, "VALID").astype(feats.dtype)
        return mask_bricks(out, occ) if mask_out else out

    # Center contribution: SAME conv within the brick.
    out = _conv3d(feats if center is None else center, w_dense, "SAME")
    # Neighbor-region contributions. Accumulated via zero-pad + add (NOT
    # .at[].add: each dynamic-update-slice materializes a full copy of
    # `out`; pads fuse into one accumulation fusion).
    def spans(d):
        # (src slice in neighbor, kernel slice, out pad widths, padding)
        if d == -1:
            return slice(bs - 1, bs), slice(0, 1), (0, bs - 1), (0, 0)
        if d == 0:
            return slice(0, bs), slice(0, 3), (0, 0), (1, 1)
        return slice(0, 1), slice(2, 3), (bs - 1, 0), (0, 0)

    for kk, (dx, dy, dz) in enumerate(OFFS27):
        if (dx, dy, dz) == (0, 0, 0):
            continue
        sx, kx, wx, px = spans(dx)
        sy, ky, wy, py = spans(dy)
        sz, kz, wz, pz = spans(dz)
        slab = take_rows(feats[:, sx, sy, sz], nbr27[kk])
        contrib = _conv3d(slab, w_dense[kx, ky, kz], (px, py, pz))
        out = out + jnp.pad(contrib, ((0, 0), wx, wy, wz, (0, 0)))
    out = out.astype(feats.dtype)
    return mask_bricks(out, occ) if mask_out else out


def brick_conv_down(
    fine_feats: jnp.ndarray,
    child: jnp.ndarray,
    w_packed: jnp.ndarray,
    occ_coarse: jnp.ndarray,
    *,
    mask_out: bool = True,
) -> jnp.ndarray:
    """Kernel-2 stride-2 conv: per-child partial reductions.

    Kernel-2 stride-2 windows never straddle a child-octant boundary
    (both taps 2i+a of window i lie in the same child block for even bs),
    so each child's (bs)^3 block reduces independently to the (bs/2)^3
    output quadrant at its octant. The (2bs)^3 gather_children assembly
    (two extra full-level HBM passes at L0 scale) is never materialized;
    only the bs^3-sized output quadrants are concatenated.

    w_packed: (8, T*Cin, T*Cout) in OCT_OFFSETS order."""
    bs = occ_coarse.shape[1]
    hs = bs // 2
    bf = fine_feats.shape[0]
    tc = fine_feats.shape[-1]
    flat = fine_feats.reshape(bf, -1)
    bc = child.shape[1]

    def quad(k):
        blk = take_rows(flat, child[k]).reshape(bc, hs, 2, hs, 2, hs, 2, tc)
        acc = 0.0
        for k2, (a, b2, c2) in enumerate(OCT_OFFSETS):
            acc = acc + blk[:, :, a, :, b2, :, c2, :] @ w_packed[k2]
        return acc  # (bc, hs, hs, hs, TCout)

    q = [quad(k) for k in range(8)]

    def cz(a, b):
        return jnp.concatenate([a, b], axis=3)

    def cy(a, b):
        return jnp.concatenate([a, b], axis=2)

    def cx(a, b):
        return jnp.concatenate([a, b], axis=1)

    # OCT_OFFSETS is x-slowest (index = 4a + 2b + c), matching
    # gather_children's assembly order.
    out = cx(
        cy(cz(q[0], q[1]), cz(q[2], q[3])),
        cy(cz(q[4], q[5]), cz(q[6], q[7])),
    )
    return mask_bricks(out, occ_coarse) if mask_out else out


def brick_conv_up(
    coarse_feats: jnp.ndarray,
    parent: jnp.ndarray,
    oct_: jnp.ndarray,
    w_packed: jnp.ndarray,
    occ_fine: jnp.ndarray,
    *,
    mask_out: bool = True,
) -> jnp.ndarray:
    """Transpose kernel-2 stride-2 conv: fine brick pulls its parent's
    octant sub-block and expands each coarse voxel into 2^3 fine voxels.

    w_packed: (8, T*Cin, T*Cout), OCT_OFFSETS parity order."""
    bf = occ_fine.shape[0]
    bs = occ_fine.shape[1]
    hs = bs // 2
    bc = coarse_feats.shape[0]
    tcin = coarse_feats.shape[-1]
    # Gather ONLY the needed (bs/2)^3 octant sub-block per fine brick: the
    # coarse level is pre-sliced into its 8 octant views stacked on axis 0
    # (one extra coarse-level pass), then one flat 2D-row gather indexed by
    # oct*Bc + parent fetches exactly sub — gathering whole parent blocks
    # and mask-selecting afterwards moved 8x the bytes.
    slabs = [
        coarse_feats[
            :, hs * a : hs * (a + 1), hs * b2 : hs * (b2 + 1), hs * c2 : hs * (c2 + 1)
        ].reshape(bc, -1)
        for a, b2, c2 in OCT_OFFSETS
    ]
    stack = jnp.concatenate(slabs, axis=0)  # (8*Bc, hs^3*TCin)
    oct_id = (oct_[:, 0] * 2 + oct_[:, 1]) * 2 + oct_[:, 2]
    idx = jnp.where(parent >= 0, oct_id * bc + parent, -1)
    sub = take_rows(stack, idx).reshape(bf, hs, hs, hs, tcin)
    # Expand: fine[2i+a, 2j+b, 2k+c] = sub[i,j,k] @ W[(a,b,c)].
    tcout = w_packed.shape[-1]
    out = jnp.zeros((bf, bs, bs, bs, tcout), coarse_feats.dtype)
    for k2, (a, b2, c2) in enumerate(OCT_OFFSETS):
        out = out.at[:, a::2, b2::2, c2::2].set(sub @ w_packed[k2])
    return mask_bricks(out, occ_fine) if mask_out else out


def brick_conv_up_from_rows(
    row_feats: jnp.ndarray,
    parent_rows: jnp.ndarray,
    w_packed: jnp.ndarray,
    occ_fine: jnp.ndarray,
    *,
    mask_out: bool = True,
) -> jnp.ndarray:
    """Transpose kernel-2 stride-2 conv across the hybrid boundary: fine
    BRICKS pull their (bs/2)^3 parent-voxel block from coarse ROWS.

    row_feats: (Vc, T*Cin) coarse row features.
    parent_rows: (Bf, hs, hs, hs) coarse row ids (atlas.hybridize_levels).
    w_packed: (8, T*Cin, T*Cout) OCT_OFFSETS parity order.
    occ_fine: (Bf, bs, bs, bs, T)."""
    bf, hs = parent_rows.shape[0], parent_rows.shape[1]
    bs = occ_fine.shape[1]
    tcin = row_feats.shape[-1]
    sub = take_rows(row_feats, parent_rows.reshape(-1)).reshape(
        bf, hs, hs, hs, tcin
    )
    tcout = w_packed.shape[-1]
    out = jnp.zeros((bf, bs, bs, bs, tcout), row_feats.dtype)
    for k2, (a, b2, c2) in enumerate(OCT_OFFSETS):
        out = out.at[:, a::2, b2::2, c2::2].set(sub @ w_packed[k2])
    return mask_bricks(out, occ_fine) if mask_out else out


def pack_dense_kernel(w: jnp.ndarray, num_time: int) -> jnp.ndarray:
    """(K, KT, Cin, Cout) params -> (k, k, k, T*Cin, T*Cout) dense kernel
    via ops.sparse_conv.pack_time_toeplitz + spatial reshape."""
    from sps_tpu.ops.sparse_conv import pack_time_toeplitz

    k3 = w.shape[0]
    k = round(k3 ** (1 / 3))
    assert k**3 == k3
    wp = pack_time_toeplitz(w, num_time)  # (K, TCin, TCout)
    return wp.reshape(k, k, k, wp.shape[-2], wp.shape[-1])
