#!/usr/bin/env python3
"""Deep-level conv formulations (L3 decoder shape: the single hottest op).

XLA's NDHWC conv3d runs at only ~28 TF/s on (B,10,10,10,C) halo blocks.
Candidates at B=640, Cin=192, Cout=128 (L3 block5 conv1 with tight caps):

  ndhwc    — current: one VALID conv3d, NDHWC/DHWIO
  ncdhw    — same conv, NCDHW/OIDHW orientation
  shifts   — 27 strided views -> (B*512, Cin) @ (Cin, Cout) accumulated
  zband    — z folded into channels: conv2d (B,10,10,10*Cin) with a
             (3,3,10*Cin -> 8*Cout) block-banded kernel (3.1x FLOPs but
             dense-MXU shapes)
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

B = int(os.environ.get("MB_B", 640))
CIN = int(os.environ.get("MB_CIN", 192))
COUT = int(os.environ.get("MB_COUT", 128))
S = 8
H = S + 2
ITERS = 8


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((B, H, H, H, CIN)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, CIN, COUT)) * 0.05, jnp.bfloat16)

    def ndhwc(hh, ww):
        return jax.lax.conv_general_dilated(
            hh, ww, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    def ncdhw(hh, ww):
        hh2 = jnp.transpose(hh, (0, 4, 1, 2, 3))
        ww2 = jnp.transpose(ww, (4, 3, 0, 1, 2))
        out = jax.lax.conv_general_dilated(
            hh2, ww2, (1, 1, 1), "VALID",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            preferred_element_type=jnp.float32,
        )
        return jnp.transpose(out, (0, 2, 3, 4, 1)).astype(jnp.bfloat16)

    def shifts(hh, ww):
        acc = jnp.zeros((B * S * S * S, COUT), jnp.float32)
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    v = hh[:, dx : dx + S, dy : dy + S, dz : dz + S, :].reshape(-1, CIN)
                    acc = acc + v @ ww[dx, dy, dz]
        return acc.reshape(B, S, S, S, COUT).astype(jnp.bfloat16)

    # zband: kernel W2[(ky,kx)?? -> fold z into channels.
    # in2d: (B, 10, 10, 10*CIN); w2d[ky, kx, zi*CIN+ci, zo*COUT+co] =
    #   w[ky, kx, zi-zo, ci, co] if 0 <= zi-zo < 3 else 0
    wz = np.zeros((3, 3, H * CIN, S * COUT), np.float32)
    wnp = np.asarray(w, np.float32)
    for ky in range(3):
        for kx in range(3):
            for zo in range(S):
                for kz in range(3):
                    zi = zo + kz
                    wz[ky, kx, zi * CIN : (zi + 1) * CIN, zo * COUT : (zo + 1) * COUT] = wnp[ky, kx, kz]
    wzj = jnp.asarray(wz, jnp.bfloat16)

    def zband(hh, wwz):
        h2 = hh.reshape(B, H, H, H * CIN)
        out = jax.lax.conv_general_dilated(
            h2, wwz, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return out.reshape(B, S, S, S, COUT).astype(jnp.bfloat16)

    # correctness
    ref = np.asarray(jax.jit(ndhwc)(h, w), np.float32)
    for name, fn, ww in (("ncdhw", ncdhw, w), ("shifts", shifts, w), ("zband", zband, wzj)):
        got = np.asarray(jax.jit(fn)(h, ww), np.float32)
        log(f"{name} max|diff| = {np.max(np.abs(got - ref)):.4f}")

    def chain(fn):
        def run(hh, ww):
            def body(i, carry):
                out = fn(carry, ww)
                tap = jnp.ravel(out)[0]
                upd = (tap * 0).astype(carry.dtype)
                return carry + upd

            return jax.lax.fori_loop(0, ITERS, body, hh)

        return jax.jit(run)

    cands = {
        "ndhwc ": (chain(ndhwc), w),
        "ncdhw ": (chain(ncdhw), w),
        "shifts": (chain(shifts), w),
        "zband ": (chain(zband), wzj),
        "null  ": (jax.jit(lambda hh, ww: hh * 1.0), w),
    }
    for name, (fn, ww) in cands.items():
        jax.block_until_ready(fn(h, ww))

    from sps_tpu.utils.profiling import latch_sync_mode

    latch_sync_mode()
    res = {}
    for name, (fn, ww) in cands.items():
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(h, ww))
            ts.append(time.perf_counter() - t0)
        res[name] = float(np.percentile(ts, 50))
    base = res["null  "]
    gf = B * S**3 * 27 * CIN * COUT * 2 / 1e9
    for name, t in res.items():
        if name == "null  ":
            log(f"{name}: {t*1e3:.2f} ms (dispatch)")
        else:
            per = (t - base) / ITERS
            log(f"{name}: {per*1e3:.2f} ms  ({gf/per/1e3:.0f} TF/s effective)")


if __name__ == "__main__":
    main()
