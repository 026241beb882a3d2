#!/usr/bin/env python3
"""Microbenchmark brick-conv formulations at the streaming L0 shape.

Finds the fastest TPU formulation of the stride-1 3^3 sparse conv over
4^3 bricks (B=32768, C=16 = T*C time-packed channels):

  region  — current brick_conv (SAME center conv + 26 slab convs)
  halo    — materialize (B,6,6,6,C) halo, one VALID conv3d
  shifts  — halo + 27 shifted views, each a (B*64, Cin) @ (Cin, Cout)
            matmul accumulated (explicit implicit-GEMM)
  im2col  — halo -> (B*64, 27*Cin) concat, one GEMM
  ceiling — one (B*64, 432) @ (432, 128) matmul (MXU reference)
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


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


B, C, COUT = 32768, 16, 16
DTYPE = jnp.bfloat16


def make_inputs(rng):
    feats = jnp.asarray(rng.standard_normal((B, 4, 4, 4, C)), DTYPE)
    occ = jnp.asarray(rng.random((B, 4, 4, 4, 2)) < 0.35, jnp.float32)
    # plausible neighbor table: random rows with ~30% missing
    nbr = rng.integers(0, B, (27, B)).astype(np.int32)
    nbr[rng.random((27, B)) < 0.3] = -1
    nbr[13] = np.arange(B)
    nbr = jnp.asarray(nbr)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, COUT)) * 0.1, DTYPE)
    return feats, occ, nbr, w


def region(feats, occ, nbr, w):
    return bk.brick_conv(feats, nbr, w, occ)


def halo_conv(feats, occ, nbr, w):
    h = bk.halo(feats, nbr, 1)
    out = bk._conv3d(h, w, "VALID")
    return bk.mask_bricks(out.astype(feats.dtype), occ)


def shifts(feats, occ, nbr, w):
    h = bk.halo(feats, nbr, 1)  # (B, 6,6,6, C)
    acc = jnp.zeros((B, 4, 4, 4, COUT), jnp.float32)
    k = 0
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                v = h[:, dx : dx + 4, dy : dy + 4, dz : dz + 4, :].reshape(-1, C)
                acc = acc + (v @ w[dx, dy, dz]).reshape(B, 4, 4, 4, COUT)
                k += 1
    return bk.mask_bricks(acc.astype(feats.dtype), occ)


def im2col(feats, occ, nbr, w):
    h = bk.halo(feats, nbr, 1)
    cols = [
        h[:, dx : dx + 4, dy : dy + 4, dz : dz + 4, :]
        for dx in range(3)
        for dy in range(3)
        for dz in range(3)
    ]
    mat = jnp.concatenate(cols, axis=-1).reshape(-1, 27 * C)
    out = mat @ w.reshape(27 * C, COUT)
    return bk.mask_bricks(out.reshape(B, 4, 4, 4, COUT), occ)


def main():
    rng = np.random.default_rng(0)
    feats, occ, nbr, w = make_inputs(rng)

    big_a = jnp.asarray(rng.standard_normal((B * 64, 432)), DTYPE)
    big_b = jnp.asarray(rng.standard_normal((432, 128)), DTYPE)

    fns = {
        "region": jax.jit(region),
        "halo  ": jax.jit(halo_conv),
        "shifts": jax.jit(shifts),
        "im2col": jax.jit(im2col),
    }
    ceiling = jax.jit(lambda a, b: a @ b)

    outs = {}
    for name, fn in fns.items():
        log(f"compile {name}")
        outs[name] = fn(feats, occ, nbr, w)
        jax.block_until_ready(outs[name])
    log("compile ceiling")
    jax.block_until_ready(ceiling(big_a, big_b))

    # numerical agreement
    ref = np.asarray(outs["region"], np.float32)
    for name, o in outs.items():
        d = float(np.max(np.abs(np.asarray(o, np.float32) - ref)))
        log(f"{name} max|diff| vs region = {d:.4f}")

    from sps_tpu.utils.profiling import latch_sync_mode

    latch_sync_mode()
    for name, fn in fns.items():
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(feats, occ, nbr, w))
            ts.append(time.perf_counter() - t0)
        log(f"{name}: p50 {np.percentile(ts, 50)*1e3:.2f} ms")
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        jax.block_until_ready(ceiling(big_a, big_b))
        ts.append(time.perf_counter() - t0)
    log(f"ceiling (2.1M x 432 @ 432 x 128 GEMM): p50 {np.percentile(ts, 50)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
