#!/usr/bin/env python3
"""Topology-reuse miss evidence on sensor-rate trajectories.

The headline bench (bench.py --topo-every K) times the reuse-heavy
dispatch pattern with one staged scan, where misses are zero by
construction. This script supplies the deployment-honesty evidence: on a
trajectory sampled at realistic per-scan motion (sensor at 10 Hz moving
v m/s -> v/10 m per scan), how many points per scan fall in bricks the
cached topology does not cover, for each reuse period K?

A missed point scores sigmoid(0) = 0.5 until the next rebuild
(stream/engine.py _make_atlas_reuse_fn); the policy knob is the consumer's
miss tolerance. Writes exp_results/topo_reuse.json.

Usage: python scripts/measure_topo_reuse.py [--steps 0.2,1.0,6.5] [--k 8]
"""

import argparse
import json
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", default="0.2,1.0,6.5",
                    help="per-scan motion in m (0.2 = 2 m/s at 10 Hz; "
                    "6.5 = the bench trajectory's step)")
    ap.add_argument("--k", type=int, default=8, help="rebuild period")
    ap.add_argument("--scans", type=int, default=24)
    args = ap.parse_args()

    import dataclasses

    import jax

    import bench
    from sps_tpu import config as cfg_mod
    from sps_tpu import train as tr
    from sps_tpu.data import synthetic
    from sps_tpu.stream.engine import StreamingFilter

    cfg = cfg_mod.load(os.path.join(_HERE, "config", "config.yaml"),
                       data_root="/tmp")
    cfg = dataclasses.replace(
        cfg, tpu=dataclasses.replace(cfg.tpu, topo_every=args.k)
    )
    ns = cfg.tpu.scan_points
    stable, _, _, _ = bench._make_data(cfg, 24)
    state = tr.create_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    filt = StreamingFilter(cfg, variables, stable)

    rng = np.random.default_rng(1)
    clutter = synthetic._boxes(rng, 40, 40.0).astype(np.float32)
    out = {"k": args.k, "scans": args.scans, "trajectories": []}
    for step in [float(s) for s in args.steps.split(",")]:
        filt.invalidate()
        rows = []
        for i in range(args.scans):
            ang = (step * i) / 25.0  # arc length -> angle at r=25
            pose_xy = 25.0 * np.array([np.cos(ang), np.sin(ang)])
            pts, lab = synthetic.sample_scan(
                rng, stable, clutter, pose_xy, n_rays=360 * 24, max_r=30.0
            )
            k = min(len(pts), ns)
            sx = np.zeros((ns, 3), np.float32)
            sl = np.zeros((ns,), np.float32)
            sv = np.zeros((ns,), bool)
            sx[:k], sl[:k], sv[:k] = pts[:k], lab[:k], True
            _, _, stats = filt(sx, sv, sl, np.eye(4, dtype=np.float32))
            rows.append(
                (int(stats["topo_miss_points"]), int(sv.sum()))
            )
        reuse_rows = [r for i, r in enumerate(rows) if i % args.k != 0]
        miss = np.array([r[0] for r in reuse_rows], np.float64)
        tot = np.array([r[1] for r in reuse_rows], np.float64)
        entry = {
            "step_m": step,
            "speed_at_10hz_m_s": step * 10.0,
            "reuse_scans": len(reuse_rows),
            "miss_points_mean": float(miss.mean()),
            "miss_points_max": int(miss.max()),
            "miss_frac_mean": float((miss / tot).mean()),
            "miss_frac_max": float((miss / tot).max()),
        }
        out["trajectories"].append(entry)
        print(entry, file=sys.stderr, flush=True)

    os.makedirs(os.path.join(_HERE, "exp_results"), exist_ok=True)
    path = os.path.join(_HERE, "exp_results", "topo_reuse.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
