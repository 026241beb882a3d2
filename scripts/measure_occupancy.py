#!/usr/bin/env python3
"""Max per-level brick/row occupancy over the bench scan set.

Runs voxelize+overlap and the topology pyramid (no UNet) for every bench
scan and prints per-level max occupancy vs. the configured caps — the
data for right-sizing `TPU.BRICKS` (every phantom brick above actual
occupancy pays full conv+gather cost; see docs/DESIGN.md).

Usage: [JAX_PLATFORMS=cpu] python scripts/measure_occupancy.py [--bricks csv]
"""

import argparse
import dataclasses
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
    ap.add_argument("--bricks", default=None)
    ap.add_argument("--scans", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sps_tpu import config as cfg_mod
    from sps_tpu.models import spsnet
    from sps_tpu.ops import atlas as atl
    from sps_tpu.ops import brick as bk
    from sps_tpu.ops import voxelize as vox
    from sps_tpu.stream.engine import build_map_atlas

    import bench

    cfg = cfg_mod.load(os.path.join(_HERE, "config", "config.yaml"), data_root="/tmp")
    if args.bricks:
        caps = tuple(int(x) for x in args.bricks.split(","))
        cfg = dataclasses.replace(cfg, tpu=dataclasses.replace(cfg.tpu, bricks=caps))

    stable, scans, labels, valids = bench._make_data(cfg, 24)
    sps_cfg = cfg.sps_config(batch_size=1)
    assert cfg.tpu.engine == "atlas", "occupancy sweep assumes the atlas engine"
    map_grid = build_map_atlas(stable, cfg.voxel_size, cfg.tpu.brick_side)

    n = scans.shape[1]
    bcap = sps_cfg.caps.bricks[0]
    vsize = cfg.voxel_size

    @jax.jit
    def occupancy(map_grid, scan_xyz, valid):
        coords = vox.quantize(scan_xyz, vsize)
        zeros = jnp.zeros((n,), jnp.int32)
        ones = jnp.ones((n,), jnp.int32)
        grid, p2s = atl.voxelize_bricks(
            coords, zeros, ones, valid,
            num_time=2, brick_capacity=bcap,
            brick_side=sps_cfg.brick_side, extent=sps_cfg.atlas_extent,
        )
        bvalid = jnp.arange(bcap) < grid.num_bricks
        batch0 = jnp.where(bvalid, 0, -1)
        mrow = atl.atlas_rows(map_grid, batch0, grid.coords[:, 1:])
        mocc = bk.take_rows(map_grid.occ, mrow)[..., 0]
        overlap = grid.occ[..., 1] * mocc
        occ = grid.occ.at[..., 0].set(overlap)
        grid = grid._replace(occ=occ)
        levels, _ = spsnet.build_levels_from_grid(grid, sps_cfg)
        out = []
        for l in levels:
            gg = l.grid
            if hasattr(gg, "num_rows"):
                out.append((gg.num_rows, gg.occ.shape[0], gg.overflow))
            else:
                out.append((gg.num_bricks, gg.coords.shape[0],
                            getattr(gg, "overflow", jnp.zeros((), bool))))
        return out

    log(f"caps={sps_cfg.caps.bricks} (sweeping {args.scans} scans)")
    maxes = None
    caps_seen = None
    for i in range(args.scans):
        res = occupancy(map_grid, jnp.asarray(scans[i]), jnp.asarray(valids[i]))
        vals = [(int(a), int(b), bool(c)) for a, b, c in jax.device_get(res)]
        if maxes is None:
            maxes = [v[0] for v in vals]
            caps_seen = [v[1] for v in vals]
        else:
            maxes = [max(m, v[0]) for m, v in zip(maxes, vals)]
        if any(v[2] for v in vals):
            log(f"  scan {i}: OVERFLOW at levels "
                f"{[j for j, v in enumerate(vals) if v[2]]}")
    for li, (m, c) in enumerate(zip(maxes, caps_seen)):
        log(f"L{li}: max occupancy {m} / cap {c}  ({100.0 * m / c:.0f}%)")


if __name__ == "__main__":
    main()
