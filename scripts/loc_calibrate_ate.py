#!/usr/bin/env python3
"""Deployment-objective threshold calibration + final localization table.

Stage C of scripts/loc_pipeline.py calibrates epsilon by point-label F1
on the val split — the reference's notion of filter quality (Readme.md
evaluation tables). But the flagship claim is LOCALIZATION improvement
(Readme.md:84-99), and the F1-optimal epsilon is not the ATE-optimal
one: F1 weighs every point equally, while registration error is driven
by the few structured clutter surfaces (growth walls) that bias ICP —
measured here, the F1-optimal eps=0.992 keeps 68% of a changed-world
scan including enough growth surface to hold sps at raw's ATE, while a
tighter threshold approaches the mask filter's error with none of its
clean-world over-pruning.

So: sweep epsilon on the VAL sequence's localization ATE (the traced-
epsilon streaming filter + compiled-program cache make each point a
reuse of ONE executable), pick the minimizer, write it to the committed
checkpoint sidecar + calibration.json, and rerun the full
{runs x seqs x filters} table with it. Runs differ by the init-noise
seed on the externally-seeded scans (the deterministic pipeline makes
noiseless runs identical — the reference repeats runs because
hdl_localization is a stochastic particle filter, loc_exp_general.bash).
"""

import dataclasses
import json
import os
import sys
import time
import traceback

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

import click
import numpy as np


def epsilon_robustness(sweep, eps_ate, blowup=2.0):
    """The contiguous epsilon window around the deployed value whose ATE
    stays within `blowup` x the best — recorded so a deployment nudging
    epsilon (e.g. upward for recall) sees the measured safe interval and
    the location of the first cliff instead of discovering it in the
    field (round-3 finding: eps 0.9 -> 0.0148 m but 0.95 -> 0.0982 m)."""
    best = min(s["ate_rmse"] for s in sweep)
    pts = sorted(sweep, key=lambda s: s["epsilon"])
    ok = [s["ate_rmse"] <= blowup * best for s in pts]
    idx = [i for i, s in enumerate(pts) if s["epsilon"] == eps_ate]
    lo = hi = idx[0] if idx else ok.index(True)
    while lo > 0 and ok[lo - 1]:
        lo -= 1
    while hi + 1 < len(pts) and ok[hi + 1]:
        hi += 1
    cliff = pts[hi + 1]["epsilon"] if hi + 1 < len(pts) else None
    return {
        "window": [pts[lo]["epsilon"], pts[hi]["epsilon"]],
        "blowup_threshold": blowup,
        "first_cliff_above": cliff,
        "note": "ATE <= blowup x best inside window (measured grid points)",
    }


def log(m):
    print(f"[ate-cal {time.strftime('%H:%M:%S')}] {m}", flush=True)


@click.command()
@click.option("--config", "-c", default="./config/config_loc_movers.yaml")
@click.option("--data", default="/tmp/loc_movers")
@click.option("--weights", "-w", default="./ckpt_loc_movers/best")
@click.option("--baselines", default="./ckpt_baselines")
@click.option("--grid", default="0.3,0.5,0.7,0.84,0.9,0.95,0.992")
@click.option("--val-seqs", default=None,
              help="csv val sequences for the sweep objective (mean ATE); "
              "default = config val + '<val>_clean' when that sequence "
              "exists (a clean control in the objective keeps the "
              "calibrated epsilon from over-pruning unchanged worlds)")
@click.option("--runs", type=int, default=2)
@click.option("--init-noise", type=float, default=0.05,
              help="translation noise (m) on the odometry prior (every "
              "scan under --prior odom; the seeded scans under cv); "
              "differentiates runs of the otherwise deterministic loop")
@click.option("--prior", type=click.Choice(["odom", "cv"]), default="odom",
              help="pose prior for BOTH the sweep and the table — must "
              "match the campaign protocol (round-4 finding: the "
              "cv-calibrated epsilon window did not transfer to the odom "
              "campaign)")
@click.option("--filters", default="sps,mask,raw,mos4d,mapmos,lts,oracle")
@click.option("--out", default="./exp_results")
def main(config, data, weights, baselines, grid, val_seqs, runs, init_noise,
         prior, filters, out):
    from sps_tpu import config as cfg_mod
    from sps_tpu.stream import localize as loc
    from sps_tpu.utils import checkpoint as ckpt

    cfg = cfg_mod.load(config, data_root=data)
    restored = ckpt.restore(weights)
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}

    cache = {}
    if val_seqs:
        vseqs = [s.strip() for s in val_seqs.split(",")]
    else:
        vseqs = list(cfg.data.val)
        clean = cfg.data.val[0] + "_clean"
        if os.path.isdir(os.path.join(cfg.data.root, "sequence", clean)):
            vseqs.append(clean)
    log(f"sweep objective: mean ATE over {vseqs}")
    sweep = []
    for eps in [float(x) for x in grid.split(",")]:
        ates, kepts = [], []
        for vs in vseqs:
            r = loc.run_localization(
                cfg, variables, vs, "sps", seed=0, epsilon=eps,
                prior=prior, init_noise=init_noise,
                refine=True, cache=cache, log=lambda s: None,
            )
            ates.append(r["ate_rmse"])
            kepts.append(r["kept_frac_mean"])
        sweep.append({
            "epsilon": eps,
            "ate_rmse": round(float(np.mean(ates)), 4),
            "per_seq": {s: round(a, 4) for s, a in zip(vseqs, ates)},
            "kept_frac": round(float(np.mean(kepts)), 3),
        })
        log(f"val {vseqs} eps={eps}: mean ATE {np.mean(ates):.3f} m "
            f"({['%.3f' % a for a in ates]}) kept {np.mean(kepts):.2f}")
    best = min(sweep, key=lambda s: s["ate_rmse"])
    eps_ate = best["epsilon"]
    log(f"ATE-optimal epsilon on val: {eps_ate} (mean ATE {best['ate_rmse']})")

    # Record both calibrations next to the checkpoint: threshold (the one
    # deployed, ATE-optimal) + the F1 curve already in calibration.json.
    caldir = os.path.dirname(os.path.abspath(weights))
    calpath = os.path.join(caldir, "calibration.json")
    cal = {}
    if os.path.exists(calpath):
        with open(calpath) as f:
            cal = json.load(f)
    cal["ate_sweep"] = sweep
    cal["epsilon_ate"] = eps_ate
    cal["epsilon_robustness"] = epsilon_robustness(sweep, eps_ate)
    # Protocol tag (round-4 weak #2: a calibration without its protocol
    # cannot be checked against the campaign that consumes it).
    cal["protocol"] = {
        "prior": prior,
        "init_noise": init_noise,
        "refine": True,
        "objective": f"mean ATE over {vseqs}",
        "weights": os.path.abspath(weights),
    }
    with open(calpath, "w") as f:
        json.dump(cal, f)
    sidecar = os.path.abspath(weights) + ".config.json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            sc = json.load(f)
        sc["threshold"] = eps_ate
        with open(sidecar, "w") as f:
            json.dump(sc, f, indent=2)

    # Final table: the ATE-calibrated epsilon applies to the SPS filter
    # only (via the epsilon kwarg below). Baselines keep their own
    # operating thresholds from cfg — LTSFilter reads cfg.threshold
    # (localize.py), which must stay the reference's 0.84
    # (stability_filter.py:36), not the SPS calibration.
    seqs = list(cfg.data.test)
    flts = [f.strip() for f in filters.split(",")]
    os.makedirs(out, exist_ok=True)
    results = []
    with open(os.path.join(out, "results.jsonl"), "w") as f:
        for run in range(runs):
            for seq in seqs:
                for flt in flts:
                    t0 = time.time()
                    try:
                        r = loc.run_localization(
                            cfg, variables, seq, flt, seed=run,
                            prior=prior, init_noise=init_noise,
                            baseline_weights=os.path.abspath(baselines),
                            epsilon=eps_ate if flt == "sps" else None,
                            refine=True, cache=cache, log=lambda s: None,
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

    lines = [
        "Trained checkpoint `ckpt_loc_movers/best` (60 epochs, movers "
        "dataset), epsilon calibrated on mean val localization ATE over "
        f"{vseqs} ({eps_ate}; sweep in ckpt_loc_movers/calibration.json). "
        f"Runs: run 0 exact external seed, run 1 with {init_noise} m "
        "init noise on the seeded scans. Baselines trained by "
        "scripts/train_baselines.py (ckpt_baselines/).",
        "",
        "| sequence | filter | ATE-RMSE (m) | kept |",
        "|---|---|---|---|",
    ]
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
