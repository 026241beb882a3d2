#!/usr/bin/env python3
"""Headline benchmark: streaming SPS scans/sec on TPU.

Measures the full online per-scan pipeline (pose transform -> voxelize ->
map-overlap prune -> MinkUNet14 stability scores -> threshold filter) at
BLT scale (~1.2e5-point scans against a ~1.5e6-point map, 0.1 m voxels —
SURVEY.md §6), the counterpart of the reference online node's per-scan
wall time (sps_node.py:164-176, target sensor rate 10 Hz).

vs_baseline: reference pipeline sensor-rate budget of 10 scans/sec (the
repo publishes no numbers — BASELINE.md; 10 Hz is the rate the reference's
online pipeline must sustain and roughly what its GPU timing logs show).

Prints ONE JSON line.
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".jax_cache"))

import numpy as np


def _log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _make_data(cfg, n_scans):
    """Generate (and cache) the BLT-scale synthetic world + scans."""
    from sps_tpu.data import synthetic

    ns = cfg.tpu.scan_points
    cache = f"/tmp/sps_bench_cache_{ns}_{n_scans}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["stable"], z["scans"], z["labels"], z["valids"]
    rng = np.random.default_rng(0)
    stable = synthetic.make_world(
        seed=0, extent=50.0, n_stable=120, ground_points=1_200_000
    )
    clutter = synthetic._boxes(rng, 40, 40.0).astype(np.float32)
    scans = np.zeros((n_scans, ns, 3), np.float32)
    labels = np.zeros((n_scans, ns), np.float32)
    valids = np.zeros((n_scans, ns), bool)
    for i in range(n_scans):
        ang = 2 * np.pi * i / n_scans
        pose_xy = 25.0 * np.array([np.cos(ang), np.sin(ang)])
        pts, lab = synthetic.sample_scan(
            rng, stable, clutter, pose_xy, n_rays=360 * 24, max_r=30.0
        )
        k = min(len(pts), ns)
        scans[i, :k], labels[i, :k], valids[i, :k] = pts[:k], lab[:k], True
    np.savez(cache, stable=stable, scans=scans, labels=labels, valids=valids)
    return stable, scans, labels, valids


def main():
    import argparse
    import dataclasses

    import jax

    from sps_tpu import config as cfg_mod
    from sps_tpu import train as tr
    from sps_tpu.stream.engine import StreamingFilter

    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default=None)
    ap.add_argument("--brick-side", type=int, default=None)
    ap.add_argument("--conv-mode", default=None)
    ap.add_argument("--bricks", default=None, help="csv per-level caps (batch budget)")
    ap.add_argument("--row-from", type=int, default=None)
    ap.add_argument("--zband-levels", type=int, default=None)
    ap.add_argument("--brick2-from", type=int, default=None)
    ap.add_argument("--bricks2", default=None, help="csv per-level side-2 brick caps")
    ap.add_argument("--batch", type=int, default=int(os.environ.get("BENCH_BATCH", "1")),
                    help="scans per dispatch (atlas engine); throughput mode")
    ap.add_argument("--drain-s", type=float, default=75.0,
                    help="fetch-free sleep after warmup (first-touch map transfer)")
    ap.add_argument("--tput", action="store_true",
                    help="also time a fetch-free pipelined phase (UNRELIABLE on "
                    "axon: the one allowed fetch absorbs a variable compile/"
                    "transfer residue that cannot be drained without a fetch)")
    args = ap.parse_args()

    cfg = cfg_mod.load(
        os.path.join(_HERE, "config", "config.yaml"), data_root="/tmp"
    )
    over = {}
    if args.engine:
        over["engine"] = args.engine
    if args.brick_side:
        over["brick_side"] = args.brick_side
    if args.conv_mode:
        over["conv_mode"] = args.conv_mode
    if args.bricks:
        over["bricks"] = tuple(int(x) for x in args.bricks.split(","))
    if args.row_from is not None:
        over["row_from"] = args.row_from
    if args.zband_levels is not None:
        over["zband_levels"] = args.zband_levels
    if args.brick2_from is not None:
        over["brick2_from"] = args.brick2_from
    if args.bricks2 is not None:
        over["bricks2"] = tuple(int(x) for x in args.bricks2.split(","))
    if over:
        cfg = dataclasses.replace(cfg, tpu=dataclasses.replace(cfg.tpu, **over))
    n_scans, ns = 24, cfg.tpu.scan_points
    _log("generating/loading data")
    stable, scans, labels, valids = _make_data(cfg, n_scans)
    poses = [np.eye(4, dtype=np.float32)] * n_scans  # already map frame

    _log("init model")
    state = tr.create_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    _log("build map table")
    filt = StreamingFilter(cfg, variables, stable, batch=args.batch)

    # Honest-timing protocol for the axon runtime: dispatch is async and
    # block_until_ready does NOT wait for execution (measured: 27 TFLOP
    # "completes" in 40 us), but a device->host VALUE fetch does — and the
    # first fetch permanently latches the session into synchronous mode
    # (~35 ms/dispatch overhead; wall-clock per call = dispatch overhead +
    # TRUE device time). Two phases exploit this:
    #   1. throughput (headline): queue all dispatches WITHOUT any fetch,
    #      then fetch once — the fetch waits for every queued execution, so
    #      wall/N is true pipelined scans/s, the deployment semantics (the
    #      sensor queues scans; results are consumed one scan behind).
    #   2. latency: the phase-1 fetch latched sync mode, so per-call wall
    #      now gives honest p50/p90 per-scan latency.
    nb = args.batch
    poses_np = np.stack(poses)

    def batch_args(i):
        sl = [(i + j) % n_scans for j in range(nb)]
        if nb == 1:
            return scans[sl[0]], valids[sl[0]], labels[sl[0]], poses_np[sl[0]]
        return scans[sl], valids[sl], labels[sl], poses_np[sl]

    _log("warmup/compile")
    scores, keep, stats = filt(*batch_args(0))
    jax.block_until_ready(scores)

    import jax.numpy as jnp

    # Pre-stage every dispatch's inputs on device: the per-scan host->
    # device copy is ~0.2 ms over PCIe on a real TPU host but tens of ms
    # through the axon tunnel; staging keeps the timing about the
    # framework, not the tunnel. (A deployment ingests at sensor rate and
    # uploads the next scan while the current one computes.) Stage each
    # scan exactly once: ceil(n_scans/nb) disjoint batches, cycled.
    _log("staging scan batches on device")
    n_staged = max(1, n_scans // nb)
    staged = [
        tuple(jax.device_put(a) for a in batch_args(i * nb))
        for i in range(n_staged)
    ]
    jax.block_until_ready(staged)

    def staged_args(i):
        return staged[i % n_staged]

    tput = None
    if args.tput:
        # Drain the warmup WITHOUT a value fetch (a fetch would latch sync
        # mode and kill the pipelined phase). block_until_ready does not
        # wait on axon, and the warmup includes compile + the first-touch
        # resident-map transfer — a sleep is the only (lossy) drain.
        _log(f"draining warmup ({args.drain_s:.0f}s, no fetch)")
        time.sleep(args.drain_s)
        _log(f"throughput phase (async pipeline, {n_scans} dispatches x {nb})")
        t0 = time.perf_counter()
        for i in range(n_scans):
            scores, keep, stats = filt(*staged_args(i))
        # One fetch: device executes in order, so waiting on the last
        # dispatch waits on all of them; latches sync mode for phase 2.
        _ = int(jnp.sum(keep))
        tput_wall = time.perf_counter() - t0
        tput = n_scans * nb / tput_wall
        _log(f"throughput: {tput:.2f} scans/s ({tput_wall:.2f}s)")
    else:
        _ = int(jnp.sum(keep))  # force real execution; latch sync mode

    _log(f"timing (sync mode, batch={nb})")
    lat = []
    for i in range(n_scans):
        t0 = time.perf_counter()
        scores, keep, stats = filt(*staged_args(i))
        jax.block_until_ready((scores, keep))
        lat.append(time.perf_counter() - t0)
        _log(f"dispatch {i} ({nb} scan{'s' if nb > 1 else ''}): {lat[-1]:.3f}s")
    lat = np.asarray(lat)
    p50 = float(np.percentile(lat, 50))

    mean_pts = float(np.mean([v.sum() for v in valids]))
    sps = nb / p50
    result = {
        "metric": "streaming_scans_per_sec",
        "value": round(sps, 2),
        "unit": "scans/s",
        "vs_baseline": round(sps / 10.0, 2),
        "p50_latency_ms": round(p50 * 1e3, 3),
        "p90_latency_ms": round(float(np.percentile(lat, 90)) * 1e3, 3),
        "mean_scan_points": int(mean_pts),
        "scan_voxels": int(stats["n_scan_voxels"]),
        "submap_voxels": int(stats["n_submap_voxels"]),
        "overflow": bool(stats["overflow"]),
        "batch": nb,
        "device": str(jax.devices()[0]),
    }
    if tput is not None:
        result["pipelined_scans_per_sec"] = round(tput, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
