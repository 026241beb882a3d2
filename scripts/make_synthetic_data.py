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
def main(root, scans_per_seq, seed):
    from sps_tpu.data import synthetic

    synthetic.generate(root, scans_per_seq=scans_per_seq, seed=seed)
    print(f"synthetic dataset written to {root}")


if __name__ == "__main__":
    main()
