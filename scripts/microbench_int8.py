#!/usr/bin/env python3
"""int8 vs bf16 XLA conv microbench at the shipping halo-conv shapes.

The round-3 device-time attribution (docs/DESIGN.md §7) put five stride-1
brick convs above 4 ms/scan, all running as one VALID `conv_general_dilated`
over halo'd bricks (ops/brick.py:brick_conv).  v5e's MXU runs int8 at 2x
the bf16 MAC rate, and the halo assembly (gather + concat) moves half the
bytes in int8.  This probe measures, for each hot conv shape:

  * bf16 conv (shipping)            x int8 conv + f32 dequant epilogue
  * bf16 halo assembly              x int8 halo assembly

Timing protocol = bench.py's pipelined protocol (queue N fetch-free
dispatches, one trailing fetch) — the axon tunnel's per-fetch overhead
would otherwise dominate.

Usage: python scripts/microbench_int8.py [--n 64]
"""

import argparse
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

# (name, B bricks, bs, k, TCin, TCout) — round-3 attribution shapes
# (docs/DESIGN.md §7; B at BLT capacities, T=2 packed channels).
SHAPES = [
    ("block8.conv1 L0", 11264, 8, 3, 32, 16),
    ("block8.conv2 L0", 11264, 8, 3, 16, 16),
    ("stem k5 L0", 11264, 8, 5, 2, 16),
    ("block7.conv1 L1", 4096, 8, 3, 48, 32),
    ("block6.conv1 L2", 1024, 8, 3, 96, 64),
]


def _conv(x, w, prec_int8):
    if prec_int8:
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.int32,
        )
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def timeit(fn, args, n):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # drain
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}")
    print(f"{'shape':18s} {'bf16 ms':>8s} {'int8 ms':>8s} {'ratio':>6s} "
          f"{'bf16 TF/s':>9s} {'int8 TOP/s':>10s}")
    for name, B, bs, k, tci, tco in SHAPES:
        h = bs + 2 * (k // 2)
        x16 = jnp.asarray(rng.normal(size=(B, h, h, h, tci)), jnp.bfloat16)
        w16 = jnp.asarray(rng.normal(size=(k, k, k, tci, tco)), jnp.bfloat16)
        x8 = jnp.asarray(rng.integers(-127, 127, (B, h, h, h, tci)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 127, (k, k, k, tci, tco)), jnp.int8)
        scale = jnp.asarray(rng.uniform(0.5, 2.0, (tco,)), jnp.float32)

        f16 = jax.jit(lambda x, w: _conv(x, w, False))
        # int8 path incl. the dequant epilogue it ships with
        f8 = jax.jit(
            lambda x, w, s: (_conv(x, w, True).astype(jnp.float32) * s
                             ).astype(jnp.bfloat16)
        )
        t16 = timeit(f16, (x16, w16), args.n)
        t8 = timeit(f8, (x8, w8, scale), args.n)
        flops = 2 * B * bs**3 * k**3 * tci * tco
        print(f"{name:18s} {t16*1e3:8.3f} {t8*1e3:8.3f} {t16/t8:6.2f} "
              f"{flops/t16/1e12:9.1f} {flops/t8/1e12:10.1f}")


if __name__ == "__main__":
    main()
