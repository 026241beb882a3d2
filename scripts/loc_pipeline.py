#!/usr/bin/env python3
"""One-process localization-evidence pipeline (train -> calibrate ->
baselines -> experiment table).

The axon TPU runtime compiles remotely and has no persistent local
compile cache, so every NEW process pays the multi-minute compile of each
program again. This driver chains all four TPU stages of the
localization-evidence workflow (SURVEY.md §3.4 / the reference's
exp_pipeline loop) in ONE process so the streaming-filter and
registration programs compile once:

  A. train the SPS model on the movers dataset (scripts/train.py logic)
  B. snapshot <ckpt-out>/best into the repo
  C. calibrate the filter threshold on the val split
     (scripts/calibrate_threshold.py logic, reusing the same compiled
     streaming filter the experiment uses)
  D. train the baseline filters (scripts/train_baselines.py)
  E. run the full {runs x seqs x filters} localization experiment
     (scripts/loc_experiment.py logic) with the calibrated epsilon

Each stage is independently fault-isolated: artifacts are written as soon
as they exist, and a stage failure skips to the next stage where
possible.
"""

import dataclasses
import json
import os
import shutil
import sys
import time
import traceback

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "scripts"))

import click
import numpy as np


def log(m):
    print(f"[pipeline {time.strftime('%H:%M:%S')}] {m}", flush=True)


@click.command()
@click.option("--config", "-c", default="./config/config_loc_movers.yaml")
@click.option("--data", default="/tmp/loc_movers")
@click.option("--epochs", type=int, default=60)
@click.option("--ckpt-out", default="./ckpt_loc_movers",
              help="repo-committed snapshot (best + sidecar + calibration)")
@click.option("--baselines-out", default="./ckpt_baselines")
@click.option("--baseline-steps", type=int, default=300)
@click.option("--runs", type=int, default=2)
@click.option("--filters", default="sps,mask,raw,mos4d,mapmos,lts,oracle")
@click.option("--out", default="./exp_results")
@click.option("--skip-train", is_flag=True, help="reuse <ckpt-out>/best")
@click.option("--resume-train", is_flag=True,
              help="resume stage A from /tmp/ckpt_pipeline/last (wedged-"
              "session recovery; epochs already trained are not repeated)")
@click.option("--skip-baselines", is_flag=True)
def main(config, data, epochs, ckpt_out, baselines_out, baseline_steps,
         runs, filters, out, skip_train, resume_train, skip_baselines):
    import jax

    from sps_tpu import config as cfg_mod
    from sps_tpu import train as tr
    from sps_tpu.data import blt
    from sps_tpu.stream import localize as loc
    from sps_tpu.stream.engine import StreamingFilter
    from sps_tpu.utils import checkpoint as ckpt

    cfg = cfg_mod.load(config, data_root=data)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, max_epoch=epochs)
    )
    ckpt_out = os.path.abspath(ckpt_out)
    best_repo = os.path.join(ckpt_out, "best")

    # ---- A/B: train + snapshot ----
    if skip_train and os.path.isdir(best_repo):
        log(f"skip-train: using {best_repo}")
    else:
        log(f"stage A: training {epochs} epochs on {data}")
        best = tr.fit(cfg, log_dir="/tmp/tb_pipeline",
                      ckpt_dir="/tmp/ckpt_pipeline", resume=resume_train)
        os.makedirs(ckpt_out, exist_ok=True)
        if os.path.isdir(best_repo):
            shutil.rmtree(best_repo)
        shutil.copytree(best, best_repo)
        shutil.copyfile(best + ".config.json", best_repo + ".config.json")
        log(f"stage B: snapshot -> {best_repo}")

    restored = ckpt.restore(best_repo)
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}

    # ---- C: threshold calibration on the val split ----
    # (same sweep as scripts/calibrate_threshold.py, sharing the compiled
    # streaming filter with stage E through the experiment cache)
    cache = {}
    epsilon = cfg.threshold
    try:
        seq = cfg.data.val[0]
        scans, poses = blt.load_sequences_raw(cfg.data.root, [seq])
        map_points = blt.load_map(cfg.data.root, cfg.data.map_file)
        log(f"stage C: calibrating epsilon on {seq} ({len(scans)} scans)")
        filt = StreamingFilter(cfg, variables, map_points)
        cache["sps"] = filt  # reused by stage E (same map for all seqs)
        ns = cfg.tpu.scan_points
        all_s, all_l, pend = [], [], []
        for i in range(len(scans)):
            scan = scans[i]
            n = min(len(scan), ns)
            sx = np.zeros((ns, 3), np.float32)
            sl = np.zeros((ns,), np.float32)
            sv = np.zeros((ns,), bool)
            sx[:n], sl[:n], sv[:n] = scan[:n, :3], scan[:n, 3], True
            scores, _, _ = filt(sx, sv, sl, poses[i].astype(np.float32))
            pend.append((scores, sl[:n].copy(), n))
        for scores, lab, n in pend:
            all_s.append(np.asarray(scores)[:n])
            all_l.append(lab)
        s = np.concatenate(all_s)
        lbl = np.concatenate(all_l) > 0.5
        best_row, curve = None, []
        grid = np.concatenate(
            [np.linspace(0.02, 0.98, 97), np.linspace(0.982, 0.998, 9)])
        for eps in grid:
            pred = s > eps
            tp = int((pred & lbl).sum())
            fp = int((pred & ~lbl).sum())
            fn = int((~pred & lbl).sum())
            p = tp / max(tp + fp, 1)
            r = tp / max(tp + fn, 1)
            f1 = 2 * p * r / max(p + r, 1e-9)
            row = {"epsilon": round(float(eps), 3), "f1": round(f1, 4),
                   "precision": round(p, 4), "recall": round(r, 4)}
            if abs(eps * 10 - round(eps * 10)) < 1e-6:
                curve.append(row)
            if best_row is None or f1 > best_row["f1"]:
                best_row = dict(row)
        best_row["curve"] = curve
        best_row.update(sequence=seq, points=int(len(s)),
                        unstable_frac=round(float(lbl.mean()), 4),
                        score_mean_stable=round(float(s[~lbl].mean()), 4),
                        score_mean_unstable=round(float(s[lbl].mean()), 4))
        with open(os.path.join(ckpt_out, "calibration.json"), "w") as f:
            json.dump(best_row, f)
        epsilon = best_row["epsilon"]
        log(f"stage C: epsilon={epsilon} F1={best_row['f1']}")
        # The committed sidecar must carry the calibrated threshold
        # (ADVICE r2: an uncalibrated frozen threshold misleads consumers).
        sidecar = best_repo + ".config.json"
        with open(sidecar) as f:
            sc = json.load(f)
        sc["threshold"] = epsilon
        with open(sidecar, "w") as f:
            json.dump(sc, f, indent=2)
    except Exception:
        traceback.print_exc()
        log("stage C FAILED; continuing with config threshold")

    # ---- D: baseline training ----
    if not skip_baselines:
        try:
            import train_baselines as tb

            log(f"stage D: training baselines ({baseline_steps} steps each)")
            scans_tr, poses_tr = blt.load_sequences_raw(
                cfg.data.root, cfg.data.train)
            map_pts = blt.load_map(cfg.data.root, cfg.data.map_file)
            os.makedirs(baselines_out, exist_ok=True)
            # Scans are ~8.7k points: 12288 covers them (matches the sps
            # scan capacity so the filters share level capacities).
            pps = cfg.tpu.scan_points
            tb.train_mos4d(cfg, scans_tr, poses_tr, True, baseline_steps,
                           4, pps, baselines_out, 0)
            tb.train_mapmos(cfg, scans_tr, poses_tr, map_pts, baseline_steps,
                            pps, cfg.tpu.submap_points, baselines_out, 0)
            tb.train_lts(cfg, scans_tr, baseline_steps, baselines_out, 0)
        except Exception:
            traceback.print_exc()
            log("stage D FAILED; experiment will use random baselines")

    # ---- E: the localization table ----
    log(f"stage E: experiment runs={runs} filters={filters} eps={epsilon}")
    cfg_e = dataclasses.replace(cfg, threshold=float(epsilon))
    seqs = list(cfg.data.test)
    flts = [f.strip() for f in filters.split(",")]
    os.makedirs(out, exist_ok=True)
    results = []
    path = os.path.join(out, "results.jsonl")
    with open(path, "w") as f:
        for run in range(runs):
            for seq in seqs:
                for flt in flts:
                    t0 = time.time()
                    try:
                        r = loc.run_localization(
                            cfg_e, variables, seq, flt, seed=run,
                            prior="odom", init_noise=0.05,
                            baseline_weights=os.path.abspath(baselines_out),
                            refine=True, cache=cache,
                            log=lambda s: None,
                        )
                    except Exception:
                        traceback.print_exc()
                        log(f"run {run} {seq} {flt} FAILED")
                        continue
                    r.update(run=run, seq=seq, filter=flt,
                             wall_s=round(time.time() - t0, 1))
                    results.append(r)
                    f.write(json.dumps(r) + "\n")
                    f.flush()
                    log(f"run {run} {seq} {flt}: ATE {r['ate_rmse']:.3f} m "
                        f"kept {r['kept_frac_mean']:.2f}")

    lines = ["| sequence | filter | ATE-RMSE (m) | kept |", "|---|---|---|---|"]
    for seq in seqs:
        for flt in flts:
            rs = [r for r in results if r["seq"] == seq and r["filter"] == flt]
            if not rs:
                continue
            ate = float(np.mean([r["ate_rmse"] for r in rs]))
            kept = float(np.mean([r["kept_frac_mean"] for r in rs]))
            lines.append(f"| {seq} | {flt} | {ate:.3f} | {kept:.2f} |")
    with open(os.path.join(out, "summary.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
