#!/usr/bin/env python3
"""NCLT-scale headroom check (BASELINE.md measurement config #3).

Builds a synthetic world ~5x the BLT bench map (extent 110 m -> ~6M map
points at the bench density), runs the full streaming pipeline
(voxelize + map overlap + topology + UNet) over a loop of scans with
config_nclt.yaml, and asserts that NO capacity-overflow flag fires —
the cross-dataset guarantee that the static shapes sized for BLT scale
up to the NCLT parking lot without recompilation or truncation.

Prints one JSON line: per-level max occupancy vs caps + overflow.

Usage: python scripts/check_nclt_headroom.py [--scans N] [--extent M]
"""

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".jax_cache"))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=12)
    ap.add_argument("--extent", type=float, default=110.0)
    ap.add_argument("--config", default=os.path.join(_HERE, "config", "config_nclt.yaml"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sps_tpu import config as cfg_mod
    from sps_tpu import train as tr
    from sps_tpu.data import synthetic
    from sps_tpu.stream.engine import StreamingFilter

    cfg = cfg_mod.load(args.config, data_root="/tmp")
    ns = cfg.tpu.scan_points

    cache = f"/tmp/sps_nclt_cache_{int(args.extent)}_{args.scans}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        stable, scans, valids = z["stable"], z["scans"], z["valids"]
    else:
        log(f"generating {args.extent:.0f} m world")
        rng = np.random.default_rng(7)
        # Same surface density as the BLT bench world, ~ (110/50)^2 = 4.8x
        # the points; structures scale with area.
        stable = synthetic.make_world(
            seed=7, extent=args.extent, n_stable=580,
            ground_points=int(1_200_000 * (args.extent / 50.0) ** 2),
        )
        clutter = synthetic._boxes(rng, 120, args.extent * 0.8).astype(np.float32)
        scans = np.zeros((args.scans, ns, 3), np.float32)
        valids = np.zeros((args.scans, ns), bool)
        for i in range(args.scans):
            ang = 2 * np.pi * i / args.scans
            pose_xy = (0.5 * args.extent) * np.array([np.cos(ang), np.sin(ang)])
            pts, _ = synthetic.sample_scan(
                rng, stable, clutter, pose_xy, n_rays=360 * 24, max_r=30.0
            )
            k = min(len(pts), ns)
            scans[i, :k], valids[i, :k] = pts[:k], True
        np.savez(cache, stable=stable, scans=scans, valids=valids)
    log(f"map {len(stable)} points ({len(stable)/1.23e6:.1f}x BLT bench map)")

    state = tr.create_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    log("building resident map + compiling")
    filt = StreamingFilter(cfg, variables, stable)

    eye = np.eye(4, dtype=np.float32)
    labels = np.zeros((ns,), np.float32)
    overflow = False
    max_scan_vox = max_submap_vox = 0
    pend = []
    for i in range(args.scans):
        scores, keep, stats = filt(scans[i], valids[i], labels, eye)
        pend.append(stats)
    for i, stats in enumerate(pend):
        overflow |= bool(stats["overflow"])
        max_scan_vox = max(max_scan_vox, int(stats["n_scan_voxels"]))
        max_submap_vox = max(max_submap_vox, int(stats["n_submap_voxels"]))
        log(f"scan {i}: S={int(stats['n_scan_voxels'])} "
            f"M={int(stats['n_submap_voxels'])} overflow={bool(stats['overflow'])}")

    out = {
        "map_points": int(len(stable)),
        "map_vs_blt_bench": round(len(stable) / 1.23e6, 2),
        "scans": args.scans,
        "max_scan_voxels": max_scan_vox,
        "max_submap_voxels": max_submap_vox,
        "overflow": overflow,
        "bricks_caps": list(cfg.sps_config(1).caps.bricks),
    }
    print(json.dumps(out))
    if overflow:
        sys.exit(1)


if __name__ == "__main__":
    main()
