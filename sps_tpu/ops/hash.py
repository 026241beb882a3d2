"""Fixed-capacity open-addressing voxel hash table.

TPU-native replacement for MinkowskiEngine's CoordinateManager / coordinate
hashing (the reference builds coordinate maps inside C++/CUDA via
``ME.TensorField(...).sparse()`` at /root/reference/src/sps/models/models.py:24-25
and shares them across tensors for union/pruning at
/root/reference/src/sps/datasets/util.py:85-114).

Everything here has **static shapes** (capacities chosen at trace time) so
the whole pipeline compiles once under ``jax.jit``; dynamic quantities (the
number of occupied slots, probe lengths) are data, not shapes.

Design: linear probing over a power-of-two table. Insertion is the classic
parallel scheme — every still-pending key tries to claim its current probe
slot with a ``scatter-min`` of its row id; winners install their key, losers
either discover a duplicate of their own key (resolve to that slot) or
advance their probe. This is O(max cluster length) *rounds*, each round a
handful of vectorized gathers/scatters — XLA-friendly, no serial loops over
rows.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Sentinel for "no row" in table slots and failed lookups.
EMPTY = -1

# Sentinel coordinate stored in vacant slots' keys (matches
# ops.voxelize.PAD_COORD so padded-row queries are also out of range).
# Lets the lookup loop decide match/empty/continue from the keys gather
# alone — one gather per probe round instead of two.
SENTINEL = 1 << 24

# Default bound on probe rounds; with load factor <= 0.5 the longest probe
# cluster is far below this in practice. The loops also exit early once all
# rows resolve.
MAX_ROUNDS = 128


class HashTable(NamedTuple):
    """Open-addressing table mapping int32 coordinate 4-tuples -> row ids.

    Attributes:
      keys: (S, 4) int32 — stored coordinate keys (undefined where empty).
      rows: (S,) int32 — row id stored at each slot, EMPTY (-1) if vacant.
    """

    keys: jnp.ndarray
    rows: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.rows.shape[0]


def _mix(coords: jnp.ndarray) -> jnp.ndarray:
    """Hash (N, 4) int32 coordinates to (N,) uint32."""
    c = coords.astype(jnp.uint32)
    h = (
        c[:, 0] * jnp.uint32(0x9E3779B1)
        ^ c[:, 1] * jnp.uint32(0x85EBCA77)
        ^ c[:, 2] * jnp.uint32(0xC2B2AE3D)
        ^ c[:, 3] * jnp.uint32(0x27D4EB2F)
    )
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> jnp.uint32(15))
    return h


def _slot0(coords: jnp.ndarray, capacity: int) -> jnp.ndarray:
    return (_mix(coords) & jnp.uint32(capacity - 1)).astype(jnp.int32)


def _insert_loop(coords, rowid, h0, capacity, rows, keys, slot_of, pending, probe, max_rounds):
    """Shared insertion loop (full claim/resolve round per iteration).
    rowid carries the ORIGINAL row ids (claim tie-break + stored values),
    so the loop works on compacted subsets too."""
    big = jnp.int32(2**30)

    def cond(state):
        rows, keys, slot_of, pending, probe, rnd = state
        return jnp.logical_and(jnp.any(pending), rnd < max_rounds)

    def body(state):
        rows, keys, slot_of, pending, probe, rnd = state
        slot = (h0 + probe) & (capacity - 1)
        occupant = rows[slot]
        is_empty = occupant < 0
        want = pending & is_empty
        cand_slot = jnp.where(want, slot, capacity)
        claim = jnp.full((capacity,), big, jnp.int32).at[cand_slot].min(
            rowid, mode="drop"
        )
        won = want & (claim[slot] == rowid)
        wslot = jnp.where(won, slot, capacity)
        rows = rows.at[wslot].set(rowid, mode="drop")
        keys = keys.at[wslot].set(coords, mode="drop")
        match = (rows[slot] >= 0) & jnp.all(keys[slot] == coords, axis=-1)
        resolved = pending & match
        slot_of = jnp.where(resolved, slot, slot_of)
        pending = pending & ~match
        probe = probe + pending.astype(jnp.int32)
        return rows, keys, slot_of, pending, probe, rnd + 1

    rows, keys, slot_of, pending, probe, _ = jax.lax.while_loop(
        cond, body, (rows, keys, slot_of, pending, probe, jnp.int32(0))
    )
    return rows, keys, slot_of, pending, probe


def build(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    capacity: int,
    max_rounds: int = MAX_ROUNDS,
) -> tuple[HashTable, jnp.ndarray]:
    """Insert (possibly duplicated) coordinates into a fresh table.

    Args:
      coords: (N, 4) int32 keys, e.g. [batch, x, y, z].
      valid: (N,) bool — rows to insert.
      capacity: static power-of-two table size (should be >= 2x the number
        of *unique* valid keys for short probe chains).
      max_rounds: static bound on probe rounds.

    Returns:
      (table, slot_of): ``table.rows[s]`` holds the row id of the *first*
      (lowest row id among claimants) occurrence of the key stored at slot
      ``s``. ``slot_of[i]`` is the slot of row i's key (duplicates share a
      slot); EMPTY for invalid/unresolved rows.
    """
    assert capacity & (capacity - 1) == 0, "capacity must be a power of two"
    n = coords.shape[0]
    coords = coords.astype(jnp.int32)
    h0 = _slot0(coords, capacity)
    rowid = jnp.arange(n, dtype=jnp.int32)

    rows = jnp.full((capacity,), EMPTY, jnp.int32)
    keys = jnp.full((capacity, 4), SENTINEL, jnp.int32)
    slot_of = jnp.full((n,), EMPTY, jnp.int32)
    pending = valid
    probe = jnp.zeros((n,), jnp.int32)

    # Phase 1: a couple of full-width rounds resolve winners and their
    # duplicates (the vast majority at sane load factors).
    rows, keys, slot_of, pending, probe = _insert_loop(
        coords, rowid, h0, capacity, rows, keys, slot_of, pending, probe, 2
    )

    narrow_div = 4
    mn = max(n // narrow_div, 1)
    if n > 256 and mn < n:
        # Phase 2: compact the still-pending rows and continue narrow.
        pos = jnp.cumsum(pending.astype(jnp.int32)) - 1
        dest = jnp.where(pending & (pos < mn), pos, mn)
        idx = (
            jnp.zeros((mn + 1,), jnp.int32)
            .at[dest]
            .set(rowid, mode="drop")
        )[:mn]
        total = jnp.sum(pending.astype(jnp.int32))
        sel = jnp.arange(mn) < jnp.minimum(total, mn)
        rows, keys, sub_slot, sub_pending, _ = _insert_loop(
            coords[idx],
            jnp.where(sel, idx, jnp.int32(2**30)),
            h0[idx],
            capacity,
            rows,
            keys,
            jnp.full((mn,), EMPTY, jnp.int32),
            sel,
            probe[idx],
            max_rounds,
        )
        sidx = jnp.where(sel & ~sub_pending, idx, n)
        slot_of = slot_of.at[sidx].set(sub_slot, mode="drop")
        handled = jnp.zeros((n,), bool).at[sidx].set(True, mode="drop")
        pending = pending & ~handled

    # Phase 3: exact cleanup for compaction overflow (no-op normally).
    rows, keys, slot_of, _, _ = _insert_loop(
        coords, rowid, h0, capacity, rows, keys, slot_of, pending, probe, max_rounds
    )
    return HashTable(keys=keys, rows=rows), slot_of


def _probe_loop(table, queries, h0, found_slot, done, probe, max_rounds):
    """Shared probe loop: one keys-gather per round (vacant slots hold
    SENTINEL keys, so match/empty/continue need no rows gather)."""
    capacity = table.capacity

    def cond(state):
        found_slot, done, probe, rnd = state
        return jnp.logical_and(jnp.any(~done), rnd < max_rounds)

    def body(state):
        found_slot, done, probe, rnd = state
        slot = (h0 + probe) & (capacity - 1)
        k = table.keys[slot]
        match = jnp.all(k == queries, axis=-1)
        is_empty = k[:, 0] >= SENTINEL
        found_slot = jnp.where(~done & match, slot, found_slot)
        done = done | match | is_empty
        probe = probe + (~done).astype(jnp.int32)
        return found_slot, done, probe, rnd + 1

    found_slot, done, probe, _ = jax.lax.while_loop(
        cond, body, (found_slot, done, probe, jnp.int32(0))
    )
    return found_slot, done, probe


def lookup(
    table: HashTable,
    queries: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    max_rounds: int = MAX_ROUNDS,
    narrow_div: int = 4,
) -> jnp.ndarray:
    """Look up (M, 4) int32 queries; returns (M,) row ids or EMPTY (-1).

    A query terminates at the first empty slot on its probe path (correct
    for linear probing without deletions).

    Two-phase schedule: one probe round at full width resolves the vast
    majority of queries (keys at their home slot, or a vacant home slot
    for misses); the unresolved remainder is compacted to M/narrow_div
    rows and probed in a narrow loop, so the per-round cost no longer
    scales with M times the *maximum* probe-chain length. A final
    full-width loop (which exits immediately in the common case) handles
    compaction overflow exactly.
    """
    capacity = table.capacity
    queries = queries.astype(jnp.int32)
    m = queries.shape[0]
    h0 = _slot0(queries, capacity)
    if valid is None:
        valid = jnp.ones((m,), bool)

    # Phase 1: single round, full width.
    slot = h0
    k = table.keys[slot]
    match = jnp.all(k == queries, axis=-1)
    is_empty = k[:, 0] >= SENTINEL
    found_slot = jnp.where(valid & match, slot, EMPTY)
    done = ~valid | match | is_empty

    mn = max(m // narrow_div, 1)
    if m > 256 and mn < m:
        # Phase 2: compact the unresolved queries and probe narrow.
        pending = ~done
        pos = jnp.cumsum(pending.astype(jnp.int32)) - 1
        dest = jnp.where(pending & (pos < mn), pos, mn)
        idx = (
            jnp.zeros((mn + 1,), jnp.int32)
            .at[dest]
            .set(jnp.arange(m, dtype=jnp.int32), mode="drop")
        )[:mn]
        total = jnp.sum(pending.astype(jnp.int32))
        sel = jnp.arange(mn) < jnp.minimum(total, mn)
        subq = queries[idx]
        subh = h0[idx]
        sub_found, sub_done, _ = _probe_loop(
            table,
            subq,
            subh,
            jnp.full((mn,), EMPTY, jnp.int32),
            ~sel,
            jnp.ones((mn,), jnp.int32),
            max_rounds,
        )
        sidx = jnp.where(sel, idx, m)
        found_slot = found_slot.at[sidx].set(sub_found, mode="drop")
        handled = jnp.zeros((m,), bool).at[sidx].set(sel, mode="drop")
        done = done | handled

    # Phase 3: exact cleanup for compaction overflow (no-op normally).
    found_slot, _, _ = _probe_loop(
        table, queries, h0, found_slot, done, jnp.ones((m,), jnp.int32), max_rounds
    )
    result = table.rows[jnp.clip(found_slot, 0)]
    return jnp.where(found_slot >= 0, result, EMPTY)


def next_pow2(x: int) -> int:
    """Smallest power of two >= x (static helper)."""
    p = 1
    while p < x:
        p *= 2
    return p
