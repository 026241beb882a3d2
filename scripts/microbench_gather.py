#!/usr/bin/env python3
"""Gather-formulation microbench at streaming L0 block8 shapes.

What bounds the halo slab gathers (103 ms/scan in the trace)? Candidates
at B=12288, bs=8, C=32 (T*C):

  slabs-5d     — current: 26x take_rows of pre-sliced 5D slabs
  slabs-2d     — same slabs flattened to (B, flat) before the gather
  full-2d      — one gather of all 26 neighbors' full bricks, 2D rows
  grouped      — 3 gathers (faces/edges/corners) over stacked same-shape
                 slab tensors
  halo-now     — halo() as shipped (gather + nested concat)
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

B, S, C = 12288, 8, 32
ITERS = 8


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def chain(fn, feats, *rest):
    def run(f, *r):
        def body(i, carry):
            out = fn(carry, *r)
            tap = jnp.ravel(out)[0]
            return carry + (tap * 0).astype(carry.dtype)

        return jax.lax.fori_loop(0, ITERS, body, f)

    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, S, S, S, C)), jnp.bfloat16)
    nbr = rng.integers(0, B, (27, B)).astype(np.int32)
    nbr[rng.random((27, B)) < 0.3] = -1
    nbr[13] = np.arange(B)
    nbr = jnp.asarray(nbr)

    offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]

    def slabs_5d(f, n):
        acc = 0.0
        for k, (dx, dy, dz) in enumerate(offs):
            if (dx, dy, dz) == (0, 0, 0):
                continue
            sx, _ = bk._src_dst(dx, 1, S)
            sy, _ = bk._src_dst(dy, 1, S)
            sz, _ = bk._src_dst(dz, 1, S)
            acc = acc + jnp.sum(
                bk.take_rows(f[:, sx, sy, sz], n[k]), dtype=jnp.float32
            )
        return acc

    def slabs_2d(f, n):
        acc = 0.0
        for k, (dx, dy, dz) in enumerate(offs):
            if (dx, dy, dz) == (0, 0, 0):
                continue
            sx, _ = bk._src_dst(dx, 1, S)
            sy, _ = bk._src_dst(dy, 1, S)
            sz, _ = bk._src_dst(dz, 1, S)
            sl = f[:, sx, sy, sz].reshape(B, -1)
            acc = acc + jnp.sum(bk.take_rows(sl, n[k]), dtype=jnp.float32)
        return acc

    def full_2d(f, n):
        f2 = f.reshape(B, -1)
        keep = np.asarray([k for k in range(27) if k != 13])
        idx = n[keep].reshape(-1)
        g = bk.take_rows(f2, idx)
        return jnp.sum(g, dtype=jnp.float32)

    def grouped(f, n):
        # faces: 6 slabs of 64 voxels
        face_specs = [(0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)]
        acc = 0.0
        faces = []
        for ax, d in face_specs:
            sl = [slice(None)] * 3
            sl[ax] = slice(S - 1, S) if d == -1 else slice(0, 1)
            faces.append(f[:, sl[0], sl[1], sl[2]].reshape(B, -1))
        fstack = jnp.stack(faces)  # (6, B, 64C)
        fidx = []
        for k, (dx, dy, dz) in enumerate(offs):
            if (dx, dy, dz) != (0, 0, 0) and abs(dx) + abs(dy) + abs(dz) == 1:
                fidx.append(nbr_k_for(n, k))
        fi = jnp.stack(fidx)  # (6, B)
        flat = (jnp.arange(6)[:, None] * B + jnp.clip(fi, 0)).reshape(-1)
        g = fstack.reshape(6 * B, -1)[flat] * (fi.reshape(-1, 1) >= 0)
        acc = acc + jnp.sum(g, dtype=jnp.float32)
        return acc

    def nbr_k_for(n, k):
        return n[k]

    def halo_now(f, n):
        return jnp.sum(bk.halo(f, n, 1), dtype=jnp.float32)

    cands = {
        "slabs-5d": slabs_5d,
        "slabs-2d": slabs_2d,
        "full-2d ": full_2d,
        "grouped ": grouped,
        "halo-now": halo_now,
        "null    ": lambda f, n: jnp.sum(f[0, 0, 0, 0], dtype=jnp.float32),
    }
    compiled = {}
    for name, fn in cands.items():
        t0 = time.perf_counter()
        compiled[name] = chain(fn, feats, nbr)
        jax.block_until_ready(compiled[name](feats, nbr))
        log(f"compiled {name} in {time.perf_counter()-t0:.1f}s")

    from sps_tpu.utils.profiling import latch_sync_mode

    latch_sync_mode()
    res = {}
    for name, fn in compiled.items():
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(feats, nbr))
            ts.append(time.perf_counter() - t0)
        res[name] = float(np.percentile(ts, 50))
    base = res["null    "]
    for name, t in res.items():
        if name == "null    ":
            log(f"{name}: {t*1e3:.2f} ms total (dispatch)")
        else:
            log(f"{name}: {(t-base)/ITERS*1e3:.2f} ms")


if __name__ == "__main__":
    main()
