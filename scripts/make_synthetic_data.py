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
@click.option("--dense", is_flag=True,
              help="dense-world generator (surface-sampled map and scans; "
                   "use for localization experiments — see generate_dense)")
@click.option("--map-density", type=float, default=260.0)
@click.option("--scan-density", type=float, default=28.0)
@click.option("--extent", type=float, default=22.0,
              help="dense-world half-extent in m (world spans ±extent)")
@click.option("--n-stable", type=int, default=28,
              help="dense-world stable structure count")
@click.option("--clutter-boxes", type=int, default=14)
@click.option("--clutter-scale", type=float, default=1.6)
@click.option("--growth-boxes", type=int, default=0,
              help="per-seq inflated copies of mapped structures (walls "
                   "offset <1 m from real walls; biases ICP — the change "
                   "mode SPS filtering targets)")
@click.option("--mover-boxes", type=int, default=0,
              help="per-seq boxes translating 0.25-0.8 m between scans "
                   "(actors; the motion signal MOS4D detects)")
@click.option("--clean-sequences", type=str, default="",
              help="csv sequence names generated with zero clutter "
                   "(unchanged-world control)")
@click.option("--sequences", type=str, default="",
              help="csv sequence names (default: the 4 BLT-style names)")
def main(root, scans_per_seq, seed, n_rays, ground_points, dense,
         map_density, scan_density, extent, n_stable, clutter_boxes,
         clutter_scale, growth_boxes, mover_boxes, clean_sequences,
         sequences):
    from sps_tpu.data import synthetic

    if dense:
        kw = {}
        if sequences:
            kw["sequences"] = tuple(s.strip() for s in sequences.split(","))
        synthetic.generate_dense(
            root,
            scans_per_seq=scans_per_seq,
            seed=seed,
            map_density=map_density,
            scan_density=scan_density,
            extent=extent,
            n_stable=n_stable,
            clutter_boxes=clutter_boxes,
            clutter_scale=clutter_scale,
            growth_boxes=growth_boxes,
            mover_boxes=mover_boxes,
            clean_sequences=tuple(
                s.strip() for s in clean_sequences.split(",") if s.strip()
            ),
            **kw,
        )
    else:
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
