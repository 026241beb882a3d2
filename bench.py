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


def _make_data(cfg, n_scans, extent=50.0, traj_step=None):
    """Generate (and cache) a synthetic world + scans: BLT scale at the
    default extent 50 m (~1.2M-point map); extent 110 gives the
    NCLT-parking-lot scale (~5x map, config_nclt.yaml / BASELINE.md
    config #3). Surface density is constant, so points scale with
    area and structure count with (extent/50)^2.

    traj_step: scan i taken `traj_step` meters further along the loop —
    the sensor-rate trajectory protocol (0.2 m = 2 m/s at 10 Hz), under
    which streaming topology reuse pays real cache misses. None = scans
    spread around the full loop (the static throughput protocol's data;
    scan spacing then says nothing about sensor rate)."""
    from sps_tpu.data import synthetic

    ns = cfg.tpu.scan_points
    area = (extent / 50.0) ** 2
    tag = f"_t{traj_step}" if traj_step else ""
    cache = f"/tmp/sps_bench_cache_{ns}_{n_scans}_{int(extent)}{tag}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["stable"], z["scans"], z["labels"], z["valids"]
    rng = np.random.default_rng(0)
    stable = synthetic.make_world(
        seed=0, extent=extent, n_stable=int(120 * area),
        ground_points=int(1_200_000 * area),
    )
    clutter = synthetic._boxes(rng, int(40 * area), 0.8 * extent).astype(np.float32)
    scans = np.zeros((n_scans, ns, 3), np.float32)
    labels = np.zeros((n_scans, ns), np.float32)
    valids = np.zeros((n_scans, ns), bool)
    radius = 0.5 * extent
    for i in range(n_scans):
        if traj_step:
            ang = (traj_step / radius) * i
        else:
            ang = 2 * np.pi * i / n_scans
        pose_xy = radius * np.array([np.cos(ang), np.sin(ang)])
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
    ap.add_argument("--int8", action="store_true", default=None,
                    help="int8 MXU math for brick-level 3^3 convs "
                    "(TPU.INT8; parity-gated by tests/test_int8_parity.py)")
    ap.add_argument("--no-int8", dest="int8", action="store_false")
    ap.add_argument("--stem-zband", action="store_true", default=None,
                    help="fold only the k=5 stem into the zband layout")
    ap.add_argument("--head-fold", action="store_true", default=None,
                    help="run the 1x1 head on the z-folded layout")
    ap.add_argument("--topo-every", type=int, default=None,
                    help="rebuild streaming topology every N scans, reuse "
                    "the cached pyramid in between (TPU.TOPO_EVERY)")
    ap.add_argument("--batch", type=int, default=int(os.environ.get("BENCH_BATCH", "1")),
                    help="scans per dispatch (atlas engine); throughput mode")
    ap.add_argument("--no-tput", action="store_true",
                    help="skip the pipelined throughput phase (headline); "
                    "report only sync-mode latency")
    ap.add_argument("--rounds", type=int, default=3,
                    help="pipelined rounds; best reported")
    ap.add_argument("--config", default=os.path.join(_HERE, "config", "config.yaml"),
                    help="config YAML (e.g. config/config_nclt.yaml for the "
                    "NCLT-scale protocol)")
    ap.add_argument("--world-extent", type=float, default=50.0,
                    help="synthetic world half-extent in m (50 = BLT bench "
                    "scale; 110 = NCLT parking-lot scale)")
    ap.add_argument("--static", action="store_true",
                    help="legacy static protocol: ONE staged scan repeated "
                    "(topology reuse never misses by construction). The "
                    "default is the trajectory protocol: scan i at pose i "
                    "along a sensor-rate path, misses counted in the JSON.")
    ap.add_argument("--traj-step", type=float, default=0.2,
                    help="trajectory spacing m/scan (0.2 = 2 m/s at 10 Hz)")
    args = ap.parse_args()

    cfg = cfg_mod.load(args.config, data_root="/tmp")
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
    if args.int8 is not None:
        over["int8"] = args.int8
    if args.topo_every is not None:
        over["topo_every"] = args.topo_every
    if args.stem_zband is not None:
        over["stem_zband"] = args.stem_zband
    if args.head_fold is not None:
        over["head_fold"] = args.head_fold
    if over:
        cfg = dataclasses.replace(cfg, tpu=dataclasses.replace(cfg.tpu, **over))
    n_scans, ns = 24, cfg.tpu.scan_points
    _log("generating/loading data")
    stable, scans, labels, valids = _make_data(
        cfg, n_scans, extent=args.world_extent,
        traj_step=None if args.static else args.traj_step,
    )
    poses = [np.eye(4, dtype=np.float32)] * n_scans  # already map frame

    _log("init model")
    state = tr.create_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    _log("build map table")
    filt = StreamingFilter(cfg, variables, stable, batch=args.batch)

    # Honest-timing protocol for the axon runtime: dispatch is async,
    # block_until_ready does NOT wait for execution or transfers, and a
    # device->host VALUE fetch waits for everything queued before it
    # (measured round 2: a fetch costs ~30 ms but does NOT serialize
    # subsequent fetch-free dispatch runs). Protocol:
    #   0. drain: one fetch after warmup deterministically absorbs
    #      compile + the resident-map upload + the staged batch.
    #   1. throughput (headline): N fetch-free dispatches + ONE trailing
    #      fetch — the device executes in order, so wall/N is true
    #      pipelined scans/s, the deployment semantics (the sensor queues
    #      scans; results are consumed one scan behind).
    #   2. latency: per-dispatch fetch gives honest p50/p90 per-scan
    #      wall (device time + per-fetch link overhead).
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

    # Stage scan batches on device BEFORE the drain fetch: the axon
    # tunnel moves ~0.5 MB/s and block_until_ready does not wait for
    # transfers, so uploads must be absorbed by the drain (a value fetch
    # waits for everything queued before it), never by the timed phase
    # (measured r2: 24 mid-phase staged batches turned a ~2 s pipelined
    # phase into 114 s). Trajectory protocol (default): all n_scans
    # distinct batches — scan i at pose i, so topology reuse pays its
    # real miss pattern. --static: one batch repeated (legacy headline;
    # zero misses by construction).
    if args.static:
        _log("staging one scan batch on device (--static)")
        staged = [tuple(jax.device_put(a) for a in batch_args(0))]
    else:
        _log(f"staging {n_scans} trajectory batches on device "
             f"(~{2.6 * n_scans:.0f} MB through the tunnel; drained below)")
        staged = [
            tuple(jax.device_put(a) for a in batch_args(i))
            for i in range(n_scans)
        ]
    jax.block_until_ready(staged)

    def staged_args(i):
        return staged[i % len(staged)]

    # HEADLINE: pipelined throughput — the deployment semantics (a real
    # TPU host dispatches asynchronously; the sensor queues scans and
    # results are consumed one scan behind). Queue all dispatches WITHOUT
    # any fetch, then fetch once: the device executes in order, so the
    # single trailing fetch waits for every queued execution and
    # wall/N = true pipelined scans/s. The trailing fetch can absorb
    # undrained warmup residue (compile + first-touch map transfer),
    # which only UNDERestimates; the drain sleep mitigates. One round
    # only: that first fetch latches the axon session into sync mode.
    _log("drain fetch (absorbs compile + map/scan uploads)")
    t0 = time.perf_counter()
    _ = int(jnp.sum(keep))
    _log(f"  drained in {time.perf_counter()-t0:.1f}s")
    s0, k0, st0 = filt(*staged_args(0))
    _ = int(jnp.sum(k0))  # staged batch confirmed resident

    tput = None
    miss_stats = []  # device arrays; fetched AFTER all timing completes
    if not args.no_tput:
        n_disp = 4 * n_scans  # ~8 s of device work at the current rate
        for r in range(args.rounds):
            _log(f"throughput round {r} (async, {n_disp} dispatches x {nb})")
            round_stats = []
            t0 = time.perf_counter()
            for i in range(n_disp):
                scores, keep, stats = filt(*staged_args(i))
                round_stats.append(stats.get("topo_miss_points"))
            _ = int(jnp.sum(keep))  # waits for ALL queued executions
            tput_wall = time.perf_counter() - t0
            t = n_disp * nb / tput_wall
            if tput is None or t > tput:
                tput = t
                miss_stats = round_stats
            _log(f"  {t:.2f} scans/s ({tput_wall:.2f}s)")

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
    # Topology-reuse honesty: total miss points / total points dispatched
    # in the best throughput round (trajectory protocol; --static is 0 by
    # construction). Misses score 0.5 until the next rebuild — the
    # accuracy cost of the reuse policy at this trajectory speed.
    topo_miss_frac = None
    if miss_stats and miss_stats[0] is not None:
        total_miss = float(np.sum([int(m) for m in miss_stats]))
        topo_miss_frac = total_miss / max(len(miss_stats) * nb * mean_pts, 1.0)
    sync_sps = nb / p50
    sps = tput if tput is not None else sync_sps
    result = {
        "metric": "streaming_scans_per_sec",
        "value": round(sps, 2),
        "unit": "scans/s",
        # The reference publishes no numbers (BASELINE.md); the denominator
        # is the 10 Hz sensor-rate budget its online node must sustain,
        # NOT a measured reference throughput. vs_baseline stays for the
        # driver contract; vs_10hz_budget is the honest name.
        "vs_baseline": round(sps / 10.0, 2),
        "vs_10hz_budget": round(sps / 10.0, 2),
        "baseline_definition": "10hz_sensor_rate_budget_not_measured_reference",
        "sync_scans_per_sec": round(sync_sps, 2),
        "p50_latency_ms": round(p50 * 1e3, 3),
        "p90_latency_ms": round(float(np.percentile(lat, 90)) * 1e3, 3),
        "mean_scan_points": int(mean_pts),
        "scan_voxels": int(stats["n_scan_voxels"]),
        "submap_voxels": int(stats["n_submap_voxels"]),
        "overflow": bool(stats["overflow"]),
        "batch": nb,
        "map_points": int(len(stable)),
        "config": os.path.basename(args.config),
        "device": str(jax.devices()[0]),
        "protocol": "static" if args.static else "trajectory",
        "traj_step_m": None if args.static else args.traj_step,
        "topo_every": int(getattr(cfg.tpu, "topo_every", 0)),
    }
    if topo_miss_frac is not None:
        result["topo_miss_frac"] = round(topo_miss_frac, 5)
    if tput is not None:
        result["pipelined_scans_per_sec"] = round(tput, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
