#!/usr/bin/env python3
"""Pallas conv probes at streaming brick shapes.

Findings so far (kept for the record):
  * Slab-granular dynamic DMA (fusing the halo gather into a kernel) is
    a dead end on TPU: HBM refs are (8,128)-tile-organized and Mosaic
    rejects sub-tile slices ("Slice shape along dimension 0 must be
    aligned to tiling (8)"); full-brick DMA gathers pay 27x read
    amplification (~5 GB per L0 conv) — worse than XLA's grouped slab
    gathers.
  * So the halo ASSEMBLY stays XLA (grouped gathers, ops.brick.halo_z)
    and Pallas attacks the CONV: the trace shows ~25 ms/scan of conv
    fusions that are MXU-underfilled at TC=16..96 channel widths.

Variants (all timed with in-jit chaining — no dispatch overhead):
  xla-halo      halo() + lax.conv VALID          (shipping conv_mode=halo)
  xla-zband     halo_z() + banded 2D lax.conv    (shipping conv_mode=zband)
  xla-zmm       halo_z() + 9 banded XLA matmuls  (zband without conv op)
  pallas-zmm    halo_z() + Pallas 9-matmul banded kernel
  pallas-conv   conv only (pre-assembled halo_z input) — kernel ceiling

Run: python scripts/microbench_pallas.py --b 11264 --tc 16 [--g 64]
"""

import argparse
import functools
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sps_tpu.ops import brick as bk

ITERS = 16


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def chain_timed(make_fn, feats, *rest):
    """Time ITERS chained applications of fn inside ONE jit (true device
    time per iteration; dispatch overhead excluded)."""
    fn = make_fn()

    @jax.jit
    def once(f, *r):
        return fn(f, *r)

    @jax.jit
    def many(f, *r):
        def body(_, carry):
            out = fn(carry, *r)
            tap = jnp.ravel(out)[:1] * 0
            return carry + jnp.pad(tap, (0, carry.shape[-1] - 1)).astype(carry.dtype)

        return jax.lax.fori_loop(0, ITERS, body, f)

    out1 = once(feats, *rest)
    jax.block_until_ready(out1)
    _ = float(jnp.ravel(out1)[0])  # latch sync mode
    o = many(feats, *rest)
    jax.block_until_ready(o)
    _ = float(jnp.ravel(o)[0])
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        o = many(feats, *rest)
        _ = float(jnp.ravel(o)[0])
        ts.append((time.perf_counter() - t0) / ITERS)
    return float(np.min(ts)), out1


# ---------------------------------------------------------------- pallas --

def _zmm_kernel(hz_ref, w_ref, out_ref, *, bs):
    acc = None
    for kx in range(3):
        for ky in range(3):
            a = hz_ref[:, kx : kx + bs, ky : ky + bs, :]
            p = jax.lax.dot_general(
                a, w_ref[kx, ky],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = p if acc is None else acc + p
    out_ref[:] = acc.astype(out_ref.dtype)


def make_pallas_conv(b, g, bs, tc, dtype=jnp.bfloat16):
    """(B, bs+2, bs+2, (bs+2)*tc) z-folded halo -> (B, bs, bs, bs*tc)."""
    h = bs + 2

    @jax.jit
    def run(hz, wz):
        return pl.pallas_call(
            functools.partial(_zmm_kernel, bs=bs),
            grid=(b // g,),
            in_specs=[
                pl.BlockSpec((g, h, h, h * tc), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((g, bs, bs, bs * tc),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, bs, bs, bs * tc), dtype),
        )(hz, wz)

    return run


# ------------------------------------------------------------------ main --

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=11264)
    ap.add_argument("--tc", type=int, default=16)
    ap.add_argument("--tcout", type=int, default=0, help="0 = same as tc")
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--g", type=int, default=64)
    ap.add_argument("--absent", type=float, default=0.35)
    ap.add_argument("--skip", default="", help="csv variants to skip")
    args = ap.parse_args()
    b, tc, bs, g = args.b, args.tc, args.bs, args.g
    tco = args.tcout or tc
    skip = set(args.skip.split(","))

    rng = np.random.default_rng(0)
    feats5 = jnp.asarray(
        rng.standard_normal((b, bs, bs, bs, tc)) * 0.1, jnp.bfloat16)
    nbr = rng.integers(0, b, (27, b)).astype(np.int32)
    nbr[rng.random((27, b)) < args.absent] = -1
    nbr[13] = np.arange(b)
    nbr_j = jnp.asarray(nbr)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, tc, tco)) * 0.1, jnp.bfloat16)
    occ5 = jnp.ones((b, bs, bs, bs, 1), jnp.bfloat16)
    occz = jnp.ones((b, bs, bs, bs * 1), jnp.bfloat16)

    flops = b * bs**3 * 27 * tc * tco * 2
    zflops = b * bs**2 * 9 * ((bs + 2) * tc) * (bs * tco) * 2
    log(f"B={b} bs={bs} TC={tc}->{tco} G={g}  conv={flops/1e9:.1f}G zband={zflops/1e9:.0f}G FLOPs")

    out_ref_v = None
    if "xla-halo" not in skip:
        t, out_ref_v = chain_timed(
            lambda: (lambda x, n, ww: bk.brick_conv(
                x, n, ww, occ5[..., 0:1] * 0 + 1, mode="halo", mask_out=False)),
            feats5, nbr_j, w)
        log(f"xla-halo    {t*1e3:8.2f} ms  ({flops/t/1e12:5.1f} TF/s eff)")

    zf = bk.fold_z(feats5)
    wz = bk.pack_zband_kernel(w, bs, 1).astype(jnp.bfloat16)

    if "xla-zband" not in skip and tc == tco:
        t, _ = chain_timed(
            lambda: (lambda x, n, ww: bk.brick_conv_zband(
                x, n, ww, occz, mask_out=False)),
            zf, nbr_j, w)
        log(f"xla-zband   {t*1e3:8.2f} ms")

    if "xla-zmm" not in skip and tc == tco:
        def mk():
            def f(x, n, wzz):
                hz = bk.halo_z(x, n, 1, tc)
                acc = None
                for kx in range(3):
                    for ky in range(3):
                        a = hz[:, kx : kx + bs, ky : ky + bs, :]
                        p = jax.lax.dot_general(
                            a, wzz[kx, ky],
                            dimension_numbers=(((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        acc = p if acc is None else acc + p
                return acc.astype(x.dtype)
            return f
        t, _ = chain_timed(mk, zf, nbr_j, wz)
        log(f"xla-zmm     {t*1e3:8.2f} ms")

    if "pallas-zmm" not in skip and tc == tco:
        try:
            pc = make_pallas_conv(b, g, bs, tc)
            def mk():
                def f(x, n, wzz):
                    hz = bk.halo_z(x, n, 1, tc)
                    return pc(hz, wzz)
                return f
            t, out_p = chain_timed(mk, zf, nbr_j, wz)
            log(f"pallas-zmm  {t*1e3:8.2f} ms  ({zflops/t/1e12:5.1f} TF/s)")
            if out_ref_v is not None:
                ref = bk.fold_z(out_ref_v).astype(jnp.float32)
                err = float(jnp.max(jnp.abs(ref - out_p.astype(jnp.float32))))
                scale = float(jnp.max(jnp.abs(ref))) or 1.0
                log(f"pallas-zmm vs xla-halo rel err = {err/scale:.4f}")
        except Exception as e:  # noqa: BLE001
            log(f"pallas-zmm FAILED: {type(e).__name__}: {str(e)[:300]}")

    if "pallas-conv" not in skip and tc == tco:
        try:
            hz = bk.halo_z(zf, nbr_j, 1, tc)
            jax.block_until_ready(hz)
            pc = make_pallas_conv(b, g, bs, tc)
            t, _ = chain_timed(lambda: pc, hz, wz)
            log(f"pallas-conv {t*1e3:8.2f} ms  ({zflops/t/1e12:5.1f} TF/s) [conv only]")
        except Exception as e:  # noqa: BLE001
            log(f"pallas-conv FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
