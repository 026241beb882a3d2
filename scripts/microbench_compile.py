#!/usr/bin/env python3
"""Isolate compile-time cost of atlas-voxelize building blocks on axon.

Times jit-compile (cache disabled) and run of each piece at streaming L0
scale: N=131072 points, extent (1,256,256,96) = 6.3M cells, bcap=12288,
bs=8, T=2.
"""

import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
# NOTE: deliberately no compilation cache — we're measuring compiles.

import jax
import jax.numpy as jnp
import numpy as np

N = 131072
EXT = (1, 256, 256, 96)
NCELL = EXT[0] * EXT[1] * EXT[2] * EXT[3]
BCAP = 12288
BS = 8
BVOL = BS**3


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def bench(name, fn, *a):
    t0 = time.perf_counter()
    c = jax.jit(fn).lower(*a).compile()
    tc = time.perf_counter() - t0
    out = c(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(c(*a))
        ts.append(time.perf_counter() - t0)
    log(f"{name}: compile {tc:.1f}s run p50 {np.percentile(ts,50)*1e3:.1f} ms")


def main():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-40, 40, (N, 3)), jnp.float32)
    flat = jnp.asarray(rng.integers(0, NCELL, (N,)), jnp.int32)
    ok = jnp.asarray(rng.random(N) < 0.9)
    cells = jnp.asarray((rng.random(NCELL) < 0.002).astype(np.int32))
    p2b = jnp.asarray(rng.integers(0, BCAP, (N,)), jnp.int32)
    lflat = jnp.asarray(rng.integers(0, BVOL, (N,)), jnp.int32)
    t_idx = jnp.asarray(rng.integers(0, 2, (N,)), jnp.int32)

    bench("quantize+min      ", lambda p: jnp.min(jnp.floor(p / 0.1).astype(jnp.int32) >> 3, axis=0), pts)
    bench("scatter-max cells ", lambda f, o: jnp.zeros((NCELL + 1,), jnp.int32).at[f].max(o.astype(jnp.int32), mode="drop")[:NCELL], flat, ok)
    bench("cumsum 6.3M       ", lambda c: jnp.cumsum(c) - 1, cells)
    bench("invert rows       ", lambda c: jnp.full((BCAP + 1,), 0, jnp.int32).at[jnp.minimum(jnp.cumsum(c) - 1, BCAP)].set(jnp.arange(NCELL, dtype=jnp.int32), mode="drop")[:BCAP], cells)
    bench("gather atlas @pts ", lambda a, f: a[jnp.minimum(f, NCELL - 1)], jnp.zeros((NCELL,), jnp.int32), flat)
    bench("occ scatter-max   ", lambda pb, lf, t, o: jnp.zeros((BCAP + 1, BVOL, 2), jnp.float32).at[pb, lf, t].max(o.astype(jnp.float32))[:BCAP], p2b, lflat, t_idx, ok)

    # the full atlas voxelize
    from sps_tpu.ops import atlas as atl

    def vx(p, v):
        coords = jnp.floor(p / 0.1).astype(jnp.int32)
        g, p2s = atl.voxelize_bricks(
            coords, jnp.zeros((N,), jnp.int32), jnp.ones((N,), jnp.int32), v,
            num_time=2, brick_capacity=BCAP, brick_side=BS, extent=EXT,
        )
        return g.occ, g.coords, g.num_bricks, p2s

    bench("atlas voxelize    ", vx, pts, ok)


if __name__ == "__main__":
    main()
