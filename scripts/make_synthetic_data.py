#!/usr/bin/env python3
"""Generate a synthetic BLT-layout dataset (for tests/benchmarks where the
external BLT/NCLT downloads are unavailable)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click


@click.command()
@click.option("--root", type=str, required=True)
@click.option("--scans-per-seq", type=int, default=12)
@click.option("--seed", type=int, default=0)
@click.option("--n-rays", type=int, default=400,
              help="scan density; 400 -> ~6k pts/scan (fits config_small), "
                   "use ~8000 for BLT-scale ~120k pts (config.yaml)")
@click.option("--ground-points", type=int, default=22000)
def main(root, scans_per_seq, seed, n_rays, ground_points):
    from sps_tpu.data import synthetic

    synthetic.generate(
        root,
        scans_per_seq=scans_per_seq,
        seed=seed,
        n_rays=n_rays,
        ground_points=ground_points,
    )
    print(f"synthetic dataset written to {root}")


if __name__ == "__main__":
    main()
