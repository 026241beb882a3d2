"""Scan replay driver: dataset -> streaming filter at sensor rate.

Replaces the reference's ROS replay/filter loop (scans_pub/pub_scans.py
publishing PointCloud2+Odometry, consumed by sps_node.py via a
TimeSynchronizer) with a host loop feeding the jitted StreamingFilter and
logging the same per-scan line the reference logs
(sps_node.py:164-176: T/P/I wall times with Hz, loss/r2, point counts
N/n/S/M).

Double-buffered: scan i+1 is staged host->device while scan i computes.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sps_tpu.config import Config
from sps_tpu.data import blt
from sps_tpu.stream.engine import StreamingFilter


class ReplayStats:
    def __init__(self):
        self.rows = []

    def add(self, **kv):
        self.rows.append(kv)

    def summary(self) -> dict:
        if not self.rows:
            return {}
        keys = [k for k, v in self.rows[0].items() if isinstance(v, (int, float))]
        out = {}
        for k in keys:
            vals = np.asarray([r[k] for r in self.rows])
            out[f"{k}_mean"] = float(vals.mean())
            if k == "t_total":
                out["p50_latency_s"] = float(np.percentile(vals, 50))
                out["scans_per_sec"] = float(1.0 / np.percentile(vals, 50))
        return out


def replay_sequence(
    cfg: Config,
    variables,
    sequence: str,
    rate: float = 0.0,
    out_dir: str | None = None,
    log=print,
) -> ReplayStats:
    """Replay one sequence through the filter.

    Args:
      rate: target scans/sec pacing (0 = as fast as possible, like
        `rosbag play -r` with a high rate).
      out_dir: if set, write filtered clouds as .npy (the reference
        publishes /cloud_filtered; files are our transport).
    """
    # Streamed, not eager: scan paths go to the native prefetching
    # Replayer (csrc/sps_io.cpp — a worker thread loads + pads scan i+1
    # while scan i is on the device), so sequences larger than host RAM
    # replay fine. Scans arrive sensor-frame and the composed
    # map_transform@pose rides along, exactly the reference node's inputs
    # (sps_node.py:36-41 synchronizes Odometry + PointCloud2; the pose is
    # applied on-device inside the filter).
    paths, poses = blt.sequence_files(cfg.data.root, [sequence][0])
    map_points = blt.load_map(cfg.data.root, cfg.data.map_file)
    filt = StreamingFilter(cfg, variables, map_points)
    ns = cfg.tpu.scan_points
    stats = ReplayStats()
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    from sps_tpu import native

    replayer = native.Replayer(paths, cap_rows=ns, cols=4)

    # Metric/score fetches are DEFERRED past the replay loop: on the axon
    # runtime the first device->host value fetch permanently degrades
    # dispatch latency (see sps_tpu/stream/engine.py), so the loop only
    # blocks on readiness and keeps device arrays. The sensor-frame scan
    # slice is retained on host only when exporting filtered clouds.
    pending = []
    for i, (padded, n) in enumerate(replayer):
        t0 = time.perf_counter()
        n = min(n, ns)
        sx = np.ascontiguousarray(padded[:, :3])
        sl = np.ascontiguousarray(padded[:, 3])
        sv = np.zeros((ns,), bool)
        sv[:n] = True
        scores, keep, m = filt(sx, sv, sl, poses[i])
        jax.block_until_ready((scores, keep))
        t_total = time.perf_counter() - t0
        pending.append((i, n, t_total, keep, m, padded[:n] if out_dir else None))
        if rate > 0:
            sleep = 1.0 / rate - (time.perf_counter() - t0)
            if sleep > 0:
                time.sleep(sleep)
    replayer.close()

    for i, n, t_total, keep, m, scan in pending:
        keep_np = np.asarray(keep)[:n]
        if out_dir:
            np.save(
                os.path.join(out_dir, f"{i:06d}.npy"),
                scan[keep_np].astype(np.float32),
            )
        hz = 1.0 / max(t_total, 1e-9)
        row = dict(
            scan=i,
            t_total=t_total,
            loss=float(m["loss"]),
            r2=float(m["r2"]),
            dIoU=float(m["dIoU"]),
            N=int(n),
            n_kept=int(m["n_kept"]),
            S=int(m["n_scan_voxels"]),
            M=int(m["n_submap_voxels"]),
        )
        stats.add(**row)
        log(
            f"T: {t_total:.3f} [{hz:.2f} Hz] "
            f"L: {row['loss']:.3f} r2: {row['r2']:.3f} dIoU: {row['dIoU']:.3f} "
            f"N: {row['N']} n: {row['n_kept']} S: {row['S']} M: {row['M']}"
        )
    return stats


def main():
    import click

    @click.command()
    @click.option("--config", "-c", type=str, default="./config/config.yaml")
    @click.option("--weights", "-w", type=str, required=True)
    @click.option("--sequence", "-seq", type=str, required=True)
    @click.option("--data", type=str, default=None)
    @click.option("--rate", type=float, default=0.0)
    @click.option("--out-dir", type=str, default=None)
    def cli(config, weights, sequence, data, rate, out_dir):
        from sps_tpu import config as cfg_mod
        from sps_tpu.utils import checkpoint as ckpt

        cfg = cfg_mod.load(config, data_root=data)
        restored = ckpt.restore(weights)
        variables = {
            "params": restored["params"],
            "batch_stats": restored["batch_stats"],
        }
        stats = replay_sequence(cfg, variables, sequence, rate=rate, out_dir=out_dir)
        print(json.dumps(stats.summary(), indent=2))

    cli()


if __name__ == "__main__":
    main()
