#!/usr/bin/env python3
"""Per-stage timing of the streaming pipeline on the live device.

Splits the jitted per-scan program into separately-jitted stages
(voxelize+map-overlap / topology pyramid / UNet+devoxelize) and times each
in honest sync mode (docs/DESIGN.md §4). Optionally also compiles the
fused end-to-end program (--fused; slow compile) and captures a
jax.profiler trace.

Usage: python scripts/profile_stream.py [--engine atlas|brick]
         [--brick-side N] [--conv-mode region|halo] [--bricks csv]
         [--fused] [--trace-dir DIR] [--scans N]
"""

import argparse
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".jax_cache"))

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--scans", type=int, default=8)
    ap.add_argument("--engine", default=None)
    ap.add_argument("--brick-side", type=int, default=None)
    ap.add_argument("--conv-mode", default=None)
    ap.add_argument("--bricks", default=None, help="csv per-level brick caps (batch budget)")
    ap.add_argument("--row-from", type=int, default=None)
    ap.add_argument("--zband-levels", type=int, default=None)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--dump-hlo", default=None,
                    help="write stage-3 (unet) optimized HLO here so trace "
                    "fusion.N names map to op_name metadata (per-layer "
                    "attribution of the device trace)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sps_tpu import config as cfg_mod
    from sps_tpu import train as tr
    from sps_tpu.models import spsnet
    from sps_tpu.models.minkunet import MinkUNet
    from sps_tpu.ops import atlas as atl
    from sps_tpu.ops import brick as bk
    from sps_tpu.ops import hash as vhash
    from sps_tpu.ops import voxelize as vox
    from sps_tpu.stream.engine import build_map_atlas, build_map_bricks
    from sps_tpu.utils.profiling import latch_sync_mode

    sys.path.insert(0, _HERE)
    import bench
    import dataclasses

    cfg = cfg_mod.load(os.path.join(_HERE, "config", "config.yaml"), data_root="/tmp")
    tpu_over = {}
    if args.engine:
        tpu_over["engine"] = args.engine
    if args.brick_side is not None:
        tpu_over["brick_side"] = args.brick_side
    if args.conv_mode:
        tpu_over["conv_mode"] = args.conv_mode
    if args.bricks is not None:
        tpu_over["bricks"] = tuple(int(x) for x in args.bricks.split(","))
    if args.row_from is not None:
        tpu_over["row_from"] = args.row_from
    if args.zband_levels is not None:
        tpu_over["zband_levels"] = args.zband_levels
    if args.int8:
        tpu_over["int8"] = True
    if tpu_over:
        cfg = dataclasses.replace(cfg, tpu=dataclasses.replace(cfg.tpu, **tpu_over))

    stable, scans, labels, valids = bench._make_data(cfg, 24)
    sps_cfg = cfg.sps_config(batch_size=1)
    model = spsnet.SPSModel(sps_cfg)
    state = tr.create_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    engine = cfg.tpu.engine
    log(f"engine={engine} side={sps_cfg.brick_side} conv={sps_cfg.unet.conv_mode} "
        f"caps={sps_cfg.caps.bricks}")
    log("building resident map")
    if engine == "atlas":
        map_grid = build_map_atlas(stable, cfg.voxel_size, cfg.tpu.brick_side)
    else:
        map_grid = build_map_bricks(
            stable, cfg.voxel_size, brick_side=cfg.tpu.brick_side
        )

    n = scans.shape[1]
    bcap = sps_cfg.caps.bricks[0]
    vsize = cfg.voxel_size

    # ---- stage 1: transform + voxelize + map-overlap ----
    # (map passed as an argument — closure arrays become compile-time
    # constants and blow XLA compile time up at map scale)
    @jax.jit
    def stage_vox(map_grid, scan_xyz, valid):
        coords = vox.quantize(scan_xyz, vsize)
        zeros = jnp.zeros((n,), jnp.int32)
        ones = jnp.ones((n,), jnp.int32)
        if engine == "atlas":
            grid, p2s = atl.voxelize_bricks(
                coords, zeros, ones, valid,
                num_time=2, brick_capacity=bcap,
                brick_side=sps_cfg.brick_side, extent=sps_cfg.atlas_extent,
            )
            bvalid = jnp.arange(bcap) < grid.num_bricks
            batch0 = jnp.where(bvalid, 0, -1)
            mrow = atl.atlas_rows(map_grid, batch0, grid.coords[:, 1:])
        else:
            grid, p2s = bk.voxelize_bricks(
                coords, zeros, ones, valid,
                num_time=2, brick_capacity=bcap, brick_side=sps_cfg.brick_side,
            )
            bvalid = jnp.arange(bcap) < grid.num_bricks
            mrow = vhash.lookup(map_grid.table, grid.coords, bvalid)
        mocc = bk.take_rows(map_grid.occ, mrow)[..., 0]
        overlap = grid.occ[..., 1] * mocc
        occ = grid.occ.at[..., 0].set(overlap)
        return grid._replace(occ=occ), p2s

    # ---- stage 2: topology pyramid ----
    @jax.jit
    def stage_topo(grid):
        return spsnet.build_levels_from_grid(grid, sps_cfg)[0]

    # ---- stage 3: UNet + devoxelize ----
    @jax.jit
    def stage_unet(variables, levels, p2s, valid):
        ucfg = sps_cfg.unet
        occ0 = levels[0].grid.occ
        feats0 = (0.5 * jnp.repeat(occ0, ucfg.in_channels, axis=-1)).astype(ucfg.dtype)
        unet = MinkUNet(ucfg, name="MinkUNet")
        out = unet.apply(
            {
                "params": variables["params"]["MinkUNet"],
                "batch_stats": variables["batch_stats"]["MinkUNet"],
            },
            feats0,
            levels,
            False,
        )
        per_point = vox.devoxelize_flat(
            out, p2s, jnp.ones((n,), jnp.int32), num_time=2,
            channels=ucfg.out_channels,
        )[:, 0].astype(jnp.float32)
        return jax.nn.sigmoid(per_point) * valid

    @jax.jit
    def fused(variables, map_grid, scan_xyz, valid):
        grid, p2s = stage_vox.__wrapped__(map_grid, scan_xyz, valid)
        levels = stage_topo.__wrapped__(grid)
        return stage_unet.__wrapped__(variables, levels, p2s, valid)

    xyz0 = jnp.asarray(scans[0])
    val0 = jnp.asarray(valids[0]).astype(jnp.float32)
    vbool0 = jnp.asarray(valids[0])

    t0 = time.perf_counter()
    log("compiling stage 1 (voxelize+overlap)")
    g, p = stage_vox(map_grid, xyz0, vbool0)
    jax.block_until_ready(g.occ)
    log(f"  compile {time.perf_counter()-t0:.0f}s")
    t0 = time.perf_counter()
    log("compiling stage 2 (topology)")
    lv = stage_topo(g)
    jax.block_until_ready(lv[0].nbr27)
    log(f"  compile {time.perf_counter()-t0:.0f}s")
    t0 = time.perf_counter()
    log("compiling stage 3 (unet)")
    s = stage_unet(variables, lv, p, val0)
    jax.block_until_ready(s)
    log(f"  compile {time.perf_counter()-t0:.0f}s")
    if args.dump_hlo:
        txt = stage_unet.lower(variables, lv, p, val0).compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        log(f"stage-3 optimized HLO -> {args.dump_hlo}")
    if args.fused:
        t0 = time.perf_counter()
        log("compiling fused")
        sf = fused(variables, map_grid, xyz0, vbool0)
        jax.block_until_ready(sf)
        log(f"  compile {time.perf_counter()-t0:.0f}s")
    log("latching sync mode")
    latch_sync_mode()
    nb = int(g.num_bricks)
    log(f"bricks occupied at L0: {nb} / cap {bcap}")
    for li, l in enumerate(lv):
        gg = l.grid
        if hasattr(gg, "num_rows"):
            log(f"  L{li}: rows {int(gg.num_rows)} / {gg.occ.shape[0]}"
                f" (overflow={bool(gg.overflow)})")
        else:
            log(f"  L{li}: {int(gg.num_bricks)} / {gg.coords.shape[0]}")

    def timeit(name, fn, *a):
        ts = []
        for i in range(args.scans):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        log(f"{name}: p50 {np.percentile(ts, 50)*1e3:.1f} ms (min {min(ts)*1e3:.1f})")
        return out

    timeit("stage1 vox+overlap", stage_vox, map_grid, xyz0, vbool0)
    timeit("stage2 topology   ", stage_topo, g)
    timeit("stage3 unet+devox ", stage_unet, variables, lv, p, val0)
    if args.fused:
        timeit("fused             ", fused, variables, map_grid, xyz0, vbool0)

    if args.trace_dir:
        log(f"tracing -> {args.trace_dir}")
        with jax.profiler.trace(args.trace_dir):
            g2, p2 = stage_vox(map_grid, xyz0, vbool0)
            lv2 = stage_topo(g2)
            out = stage_unet(variables, lv2, p2, val0)
            jax.block_until_ready(out)
        log("trace done")


if __name__ == "__main__":
    main()
