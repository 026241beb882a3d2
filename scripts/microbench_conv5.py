#!/usr/bin/env python3
"""Shallow-level conv formulations (L0/L1: tiny channels, huge brick count).

At L0 the halo conv is (B=12288, 10,10,10, TC=16) -> (.,8,8,8, 16): only 16
of 128 MXU output lanes are used and the minor dim is 16 of a 128-lane tile,
so XLA's conv3d runs far below roofline. Candidates:

  ndhwc — current: one VALID conv3d, NDHWC/DHWIO
  zband — z folded into channels: conv2d (B,10,10,10*C) with a
          (3,3,10*C -> 8*Cout) block-banded kernel (10/3 x FLOPs but
          full-lane MXU shapes and (8,128)-aligned layouts)
  zmm   — same z-folding but as 9 shifted matmuls (B*64, 10C) @ (10C, 8Cout)

Env: MB_B (bricks), MB_C (channels, =Cin=Cout).
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

B = int(os.environ.get("MB_B", 12288))
C = int(os.environ.get("MB_C", 16))
S = 8
H = S + 2
ITERS = 8


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((B, H, H, H, C)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.05, jnp.bfloat16)

    def ndhwc(hh, ww):
        return jax.lax.conv_general_dilated(
            hh, ww, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    # zband weights: w2[ky, kx, zi*C+ci, zo*C+co] = w[ky,kx,zi-zo,ci,co]
    wz = np.zeros((3, 3, H * C, S * C), np.float32)
    wnp = np.asarray(w, np.float32)
    for ky in range(3):
        for kx in range(3):
            for zo in range(S):
                for kz in range(3):
                    zi = zo + kz
                    wz[ky, kx, zi * C : (zi + 1) * C, zo * C : (zo + 1) * C] = wnp[ky, kx, kz]
    wzj = jnp.asarray(wz, jnp.bfloat16)

    def zband(hh, wwz):
        h2 = hh.reshape(B, H, H, H * C)
        out = jax.lax.conv_general_dilated(
            h2, wwz, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return out.reshape(B, S, S, S, C).astype(jnp.bfloat16)

    def zmm(hh, wwz):
        h2 = hh.reshape(B, H, H, H * C)
        acc = jnp.zeros((B * S * S, S * C), jnp.float32)
        for dx in range(3):
            for dy in range(3):
                v = h2[:, dx : dx + S, dy : dy + S, :].reshape(-1, H * C)
                acc = acc + v @ wwz[dx, dy]
        return acc.reshape(B, S, S, S, C).astype(jnp.bfloat16)

    ref = np.asarray(jax.jit(ndhwc)(h, w), np.float32)
    for name, fn, ww in (("zband", zband, wzj), ("zmm", zmm, wzj)):
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
        "ndhwc": (chain(ndhwc), w),
        "zband": (chain(zband), wzj),
        "zmm  ": (chain(zmm), wzj),
        "null ": (jax.jit(lambda hh, ww: hh * 1.0), w),
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
    base = res["null "]
    gf = B * S**3 * 27 * C * C * 2 / 1e9
    for name, t in res.items():
        if name == "null ":
            log(f"{name}: {t*1e3:.2f} ms (dispatch)")
        else:
            per = (t - base) / ITERS
            log(f"{name}: {per*1e3:.2f} ms  ({gf/per/1e3:.1f} TF/s useful-effective)")


if __name__ == "__main__":
    main()
