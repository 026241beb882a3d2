#!/usr/bin/env python3
"""Full-localization-loop rate on TPU (BASELINE.md config #5).

Times the FUSED per-scan localization step (stream/loop.py: cv prior ->
filter -> register [-> refilter -> register]) with the bench.py protocol:
pipelined fetch-free dispatches chained through device-resident pose
state, one trailing fetch. The reference replays rosbags at real time
(loc_exp_general.bash:142 `-r $RATE`) through the SPS node + the external
hdl_localization stack; the loop-rate target is the same 10 Hz sensor
budget the filter alone is measured against.

Writes exp_results/loop_rate.json and prints one JSON line.
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


def _log(msg):
    print(f"[loop {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-refine", action="store_true",
                    help="single filter+register pass per scan (the "
                    "reference node's shape: one filter at the external "
                    "prior; refine exists for the self-referential cv "
                    "loop — stream/localize.py docstring)")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--dispatches", type=int, default=48)
    ap.add_argument("--static", action="store_true",
                    help="legacy one-staged-scan protocol (zero topology "
                    "misses by construction); default stages a sensor-rate "
                    "trajectory (scan i at pose i, 0.2 m apart)")
    ap.add_argument("--traj-step", type=float, default=0.2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from sps_tpu import config as cfg_mod
    from sps_tpu import train as tr
    from sps_tpu.stream.loop import LocalizationLoop

    cfg = cfg_mod.load(os.path.join(_HERE, "config", "config.yaml"),
                       data_root="/tmp")
    _log("generating/loading data")
    stable, scans, labels, valids = bench._make_data(
        cfg, 24, traj_step=None if args.static else args.traj_step
    )
    _log("init model")
    state = tr.create_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    _log("build loop (map grid + registration pyramid + LUTs)")
    loop = LocalizationLoop(cfg, variables, stable, refine=not args.no_refine)

    # Scan 0's sensor pose on the bench trajectory (bench scans are
    # already in the map frame => sensor pose identity works as seed).
    seed = np.eye(4, dtype=np.float32)
    _log("warmup/compile (seeded + cv-prior + reuse variants)")
    pose, keep, stats = loop(scans[0], valids[0], labels[0], prior=seed)
    pose, keep, stats = loop(scans[0], valids[0], labels[0], prior=seed)
    pose, keep, stats = loop(scans[0], valids[0], labels[0])  # cv + reuse
    jax.block_until_ready(pose)

    n_stage = 1 if args.static else len(scans)
    _log(f"staging {n_stage} scan(s) on device")
    staged_list = [
        tuple(jax.device_put(a) for a in (scans[i], valids[i], labels[i]))
        for i in range(n_stage)
    ]
    jax.block_until_ready(staged_list)
    _log("drain fetch")
    t0 = time.perf_counter()
    _ = int(jnp.sum(keep))
    _log(f"  drained in {time.perf_counter()-t0:.1f}s")

    tput = None
    for r in range(args.rounds):
        _log(f"round {r}: {args.dispatches} chained fetch-free dispatches")
        t0 = time.perf_counter()
        for i in range(args.dispatches):
            pose, keep, stats = loop(*staged_list[i % n_stage])
        _ = int(jnp.sum(keep))
        wall = time.perf_counter() - t0
        t = args.dispatches / wall
        tput = t if tput is None else max(tput, t)
        _log(f"  {t:.2f} scans/s ({wall:.2f}s)")

    _log("sync-mode latency")
    lat = []
    for i in range(16):
        t0 = time.perf_counter()
        pose, keep, stats = loop(*staged_list[i % n_stage])
        jax.block_until_ready((pose, keep))
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)

    result = {
        "metric": "localization_loop_scans_per_sec",
        "value": round(tput, 2),
        "unit": "scans/s",
        "vs_10hz_budget": round(tput / 10.0, 2),
        "refine": not args.no_refine,
        "p50_latency_ms": round(float(np.percentile(lat, 50)) * 1e3, 3),
        "reg_inliers": int(stats["inliers"]),
        "reg_rmse": round(float(stats["reg_rmse"]), 4),
        "overflow": bool(stats["overflow"]),
        "topo_every": cfg.tpu.topo_every,
        "protocol": "static" if args.static else "trajectory",
        "traj_step_m": None if args.static else args.traj_step,
        "topo_miss_points_last": int(stats.get("topo_miss_points", 0)),
        "device": str(jax.devices()[0]),
    }
    os.makedirs(os.path.join(_HERE, "exp_results"), exist_ok=True)
    suffix = "_norefine" if args.no_refine else ""
    with open(os.path.join(_HERE, "exp_results", f"loop_rate{suffix}.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
