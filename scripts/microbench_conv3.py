#!/usr/bin/env python3
"""Brick-conv formulations at brick side 8 (streaming L0 shape).

Chained-iteration device timing (see microbench_conv2.py) of the stride-1
3^3 conv over 8^3 bricks at the BLT streaming scale (B=12288, C=16):

  region       — brick_conv (SAME center conv + 26 slab convs + pad-adds)
  halo-set     — halo via 26 .at[].set into (B,10,10,10,C), one VALID conv
  halo-concat  — halo via nested concat of 27 pieces, one VALID conv
  conv SAME    — in-brick conv only (no neighbors): the MXU floor
  slabs only   — the 26 boundary-slab gathers only: the gather floor
"""

import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from sps_tpu.ops import brick as bk

B = int(os.environ.get("MB_B", 12288))
S = int(os.environ.get("MB_S", 8))
C = int(os.environ.get("MB_C", 16))
COUT = C
DTYPE = jnp.bfloat16
ITERS = 8


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def halo_concat(feats, nbr27, pad):
    """Halo assembly as one nested concatenation (single fused write)."""
    bs = feats.shape[1]

    def piece(k, dx, dy, dz):
        if (dx, dy, dz) == (0, 0, 0):
            return feats
        sx, _ = bk._src_dst(dx, pad, bs)
        sy, _ = bk._src_dst(dy, pad, bs)
        sz, _ = bk._src_dst(dz, pad, bs)
        return bk.take_rows(feats[:, sx, sy, sz], nbr27[k])

    k = 0
    xs = []
    for dx in (-1, 0, 1):
        ys = []
        for dy in (-1, 0, 1):
            zs = []
            for dz in (-1, 0, 1):
                zs.append(piece(k, dx, dy, dz))
                k += 1
            ys.append(jnp.concatenate(zs, axis=3))
        xs.append(jnp.concatenate(ys, axis=2))
    return jnp.concatenate(xs, axis=1)


def main():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, S, S, S, C)), DTYPE)
    occ = jnp.asarray(rng.random((B, S, S, S, 2)) < 0.25, jnp.float32)
    nbr = rng.integers(0, B, (27, B)).astype(np.int32)
    nbr[rng.random((27, B)) < 0.3] = -1
    nbr[13] = np.arange(B)
    nbr = jnp.asarray(nbr)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, COUT)) * 0.1, DTYPE)

    def region(f, o, n, ww):
        return bk.brick_conv(f, n, ww, o)

    def halo_set(f, o, n, ww):
        h = bk.halo(f, n, 1)
        return bk.mask_bricks(bk._conv3d(h, ww, "VALID").astype(f.dtype), o)

    def halo_cat(f, o, n, ww):
        h = halo_concat(f, n, 1)
        return bk.mask_bricks(bk._conv3d(h, ww, "VALID").astype(f.dtype), o)

    def same_only(f, o, n, ww):
        return bk.mask_bricks(bk._conv3d(f, ww, "SAME").astype(f.dtype), o)

    def slabs_only(f, o, n, ww):
        acc = 0.0
        for kk, (dx, dy, dz) in enumerate(bk.OFFS27):
            if (dx, dy, dz) == (0, 0, 0):
                continue
            sx, _ = bk._src_dst(dx, 1, S)
            sy, _ = bk._src_dst(dy, 1, S)
            sz, _ = bk._src_dst(dz, 1, S)
            blk = bk.take_rows(f[:, sx, sy, sz], nbr[kk])
            acc = acc + jnp.sum(blk, dtype=jnp.float32)
        return acc

    def chain(fn):
        def run(f, o, n, ww):
            def body(i, carry):
                out = fn(carry, o, n, ww)
                tap = jnp.ravel(out)[0] if out.ndim else out
                return carry + (tap * 0).astype(carry.dtype)

            return jax.lax.fori_loop(0, ITERS, body, f)

        return jax.jit(run)

    cands = {
        "region     ": region,
        "halo-set   ": halo_set,
        "halo-concat": halo_cat,
        "conv SAME  ": same_only,
        "slabs only ": slabs_only,
        "null       ": lambda f, o, n, ww: f * 1.0,
    }

    # numerical agreement first (un-chained)
    outs = {}
    for name in ("region     ", "halo-set   ", "halo-concat"):
        outs[name] = jax.jit(cands[name])(feats, occ, nbr, w)
    ref = np.asarray(outs["region     "], np.float32)
    for name, o in outs.items():
        d = float(np.max(np.abs(np.asarray(o, np.float32) - ref)))
        log(f"{name} max|diff| vs region = {d:.4f}")

    compiled = {}
    for name, fn in cands.items():
        t0 = time.perf_counter()
        compiled[name] = chain(fn)
        jax.block_until_ready(compiled[name](feats, occ, nbr, w))
        log(f"compiled {name} in {time.perf_counter()-t0:.1f}s")

    from sps_tpu.utils.profiling import latch_sync_mode

    latch_sync_mode()
    results = {}
    for name, fn in compiled.items():
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(feats, occ, nbr, w))
            ts.append(time.perf_counter() - t0)
        results[name] = float(np.percentile(ts, 50))
    base = results["null       "]
    for name, t in results.items():
        if name == "null       ":
            log(f"{name}: {t*1e3:.2f} ms total (dispatch overhead)")
        else:
            log(f"{name}: {(t - base)/ITERS*1e3:.2f} ms")


if __name__ == "__main__":
    main()
