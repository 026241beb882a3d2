#!/usr/bin/env python3
"""Component-level device timing of the brick conv, dispatch-tax-free.

Each candidate is iterated ITERS times INSIDE one jitted program (chained
so XLA cannot elide iterations); wall time per call = (t_chain - t_null) /
ITERS. This sidesteps the ~35 ms sync-mode dispatch tax that drowns
per-call microbenchmarks (docs/DESIGN.md §4).
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

B, C, COUT = 32768, 16, 16
DTYPE = jnp.bfloat16
ITERS = 8


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def chain(fn):
    """Iterate fn ITERS times, feeding a scalar tap back into the input so
    iterations are data-dependent (no CSE)."""

    def run(feats, occ, nbr, w):
        def body(i, f):
            out = fn(f, occ, nbr, w)
            # fold a scalar of the output back into the input: keeps shape,
            # forces sequencing, negligible cost
            return f + (out.reshape(-1)[0] * 0).astype(f.dtype)

        return jax.lax.fori_loop(0, ITERS, body, feats)

    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, 4, 4, 4, C)), DTYPE)
    occ = jnp.asarray(rng.random((B, 4, 4, 4, 2)) < 0.35, jnp.float32)
    nbr = rng.integers(0, B, (27, B)).astype(np.int32)
    nbr[rng.random((27, B)) < 0.3] = -1
    nbr[13] = np.arange(B)
    nbr = jnp.asarray(nbr)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, COUT)) * 0.1, DTYPE)
    wflat = w.reshape(27 * C, COUT)

    halo_pre = bk.halo(feats, nbr, 1)  # for conv-given-halo variants

    cands = {
        "null (overhead)": lambda f, o, n, ww: f * 1.0,
        "halo build only": lambda f, o, n, ww: bk.halo(f, n, 1)[:, :4, :4, :4],
        "slab gathers only": lambda f, o, n, ww: sum(
            bk.take_rows(f[:, :1, :1, :1], n[k]) for k in range(26)
        )
        + f[:, :1, :1, :1],
        "conv3d SAME only": lambda f, o, n, ww: bk._conv3d(f, ww, "SAME").astype(DTYPE),
        "mask only": lambda f, o, n, ww: bk.mask_bricks(f, o),
        "region full": lambda f, o, n, ww: bk.brick_conv(f, n, ww, o),
        "halo+conv3d full": lambda f, o, n, ww: bk.mask_bricks(
            bk._conv3d(bk.halo(f, n, 1), ww, "VALID").astype(DTYPE), o
        ),
        "halo+shifts full": None,  # filled below
        "halo+im2col full": None,
    }

    def shifts(f, o, n, ww):
        h = bk.halo(f, n, 1)
        acc = jnp.zeros((B, 4, 4, 4, COUT), jnp.float32)
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    v = h[:, dx : dx + 4, dy : dy + 4, dz : dz + 4, :].reshape(-1, C)
                    acc = acc + (v @ ww[dx, dy, dz]).reshape(B, 4, 4, 4, COUT)
        return bk.mask_bricks(acc.astype(DTYPE), o)

    def im2col(f, o, n, ww):
        h = bk.halo(f, n, 1)
        cols = [
            h[:, dx : dx + 4, dy : dy + 4, dz : dz + 4, :]
            for dx in range(3)
            for dy in range(3)
            for dz in range(3)
        ]
        mat = jnp.concatenate(cols, axis=-1).reshape(-1, 27 * C)
        out = (mat @ wflat).astype(DTYPE)
        return bk.mask_bricks(out.reshape(B, 4, 4, 4, COUT), o)

    cands["halo+shifts full"] = shifts
    cands["halo+im2col full"] = im2col

    compiled = {}
    for name, fn in cands.items():
        log(f"compile: {name}")
        compiled[name] = chain(fn)
        jax.block_until_ready(compiled[name](feats, occ, nbr, w))

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
    base = results["null (overhead)"]
    for name, t in results.items():
        per = (t - base) / ITERS * 1e3 if name != "null (overhead)" else t * 1e3
        log(f"{name}: {per:.2f} ms" + ("" if name != "null (overhead)" else " (total incl dispatch)"))


if __name__ == "__main__":
    main()
