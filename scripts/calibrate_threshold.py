#!/usr/bin/env python3
"""Calibrate the filter threshold epsilon on the VALIDATION split.

The reference ships FILTER.THRESHOLD = 0.84 tuned for ITS released
checkpoint (config/config.yaml:33-34); the right epsilon is a property of
the trained model's score distribution. This sweeps epsilon over the val
sequence's per-point scores (streaming path, the same scores the online
filter thresholds) and reports the max-F1 value on the unstable class —
paste it into FILTER.THRESHOLD or pass --epsilon to downstream tools.

Prints one JSON line {epsilon, f1, precision, recall, counts...}.
"""

import json
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
# Persistent XLA compile cache (TPU backends; tests opt out on CPU
# — see tests/conftest.py): repeat invocations skip the multi-minute
# compile of the per-scan/train programs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_HERE, ".jax_cache"))

import click
import numpy as np


@click.command()
@click.option("--config", "-c", type=str, default="./config/config_loc.yaml")
@click.option("--weights", "-w", type=str, required=True)
@click.option("--data", type=str, default=None)
@click.option("--sequence", "-seq", type=str, default=None,
              help="default: the config VAL split's first sequence")
@click.option("--max-scans", type=int, default=12)
def main(config, weights, data, sequence, max_scans):
    import jax

    from sps_tpu import config as cfg_mod
    from sps_tpu.data import blt
    from sps_tpu.stream.engine import StreamingFilter
    from sps_tpu.utils import checkpoint as ckpt

    cfg = cfg_mod.load(config, data_root=data)
    seq = sequence or cfg.data.val[0]
    restored = ckpt.restore(weights)
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}
    scans, poses = blt.load_sequences_raw(cfg.data.root, [seq])
    map_points = blt.load_map(cfg.data.root, cfg.data.map_file)
    filt = StreamingFilter(cfg, variables, map_points)
    ns = cfg.tpu.scan_points

    idx = np.linspace(0, len(scans) - 1, min(max_scans, len(scans))).astype(int)
    all_s, all_l = [], []
    pend = []
    for i in idx:
        scan = scans[i]
        n = min(len(scan), ns)
        sx = np.zeros((ns, 3), np.float32)
        sl = np.zeros((ns,), np.float32)
        sv = np.zeros((ns,), bool)
        sx[:n], sl[:n], sv[:n] = scan[:n, :3], scan[:n, 3], True
        scores, keep, stats = filt(sx, sv, sl, poses[i].astype(np.float32))
        pend.append((scores, sl[:n].copy(), n))
    for scores, lab, n in pend:
        all_s.append(np.asarray(scores)[:n])
        all_l.append(lab)
    s = np.concatenate(all_s)
    l = np.concatenate(all_l) > 0.5

    best = None
    curve = []
    grid = np.concatenate(
        [np.linspace(0.02, 0.98, 97), np.linspace(0.982, 0.998, 9)])
    for eps in grid:
        pred = s > eps  # unstable
        tp = int((pred & l).sum())
        fp = int((pred & ~l).sum())
        fn = int((~pred & l).sum())
        p = tp / max(tp + fp, 1)
        r = tp / max(tp + fn, 1)
        f1 = 2 * p * r / max(p + r, 1e-9)
        row = {"epsilon": round(float(eps), 3), "f1": round(f1, 4),
               "precision": round(p, 4), "recall": round(r, 4)}
        if abs(eps * 10 - round(eps * 10)) < 1e-6:
            curve.append(row)
        if best is None or f1 > best["f1"]:
            best = dict(row)
    best["curve"] = curve
    best.update(sequence=seq, points=int(len(s)),
                unstable_frac=round(float(l.mean()), 4),
                score_mean_stable=round(float(s[~l].mean()), 4),
                score_mean_unstable=round(float(s[l].mean()), 4))
    print(json.dumps(best))


if __name__ == "__main__":
    main()
