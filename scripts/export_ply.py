#!/usr/bin/env python3
"""Export prediction dumps / maps to colored PLY for any point-cloud viewer.

The reference ships rviz layouts for visual debugging
(/root/reference/config/rviz/*.rviz: /cloud_filtered, /debug/cloud_submap,
/debug/raw_cloud_tr topics) and dumps per-scan npy predictions
(src/sps/models/models.py:113-152). Without ROS, the equivalent here is:
`predict.py --save-vis` writes the same (x, y, z, gt, score) npy rows, and
this tool turns them (or a raw map .npy) into PLY files that MeshLab /
CloudCompare / Open3D open directly.

Coloring:
  * predictions: score in [0, 1] mapped blue (stable) -> red (unstable);
    points above the threshold — the ones the filter removes — at full
    saturation.
  * --mode filtered: export only kept points (score <= epsilon), the
    analog of the /cloud_filtered topic.
  * map: uniform gray.
"""

import os
import struct
import sys

import click
import numpy as np


def write_ply(path: str, xyz: np.ndarray, rgb: np.ndarray) -> None:
    """Binary little-endian PLY with uchar colors."""
    n = len(xyz)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    rec = np.zeros(
        n,
        dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
               ("r", "u1"), ("g", "u1"), ("b", "u1")],
    )
    rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    rec["r"], rec["g"], rec["b"] = rgb[:, 0], rgb[:, 1], rgb[:, 2]
    with open(path, "wb") as f:
        f.write(header.encode())
        rec.tofile(f)


def score_colors(scores: np.ndarray, eps: float) -> np.ndarray:
    """Blue (stable, 0) -> red (unstable, 1); filtered points saturated."""
    s = np.clip(scores, 0.0, 1.0)
    rgb = np.zeros((len(s), 3), np.uint8)
    rgb[:, 0] = (255 * s).astype(np.uint8)
    rgb[:, 2] = (255 * (1.0 - s)).astype(np.uint8)
    cut = s > eps
    rgb[cut] = (255, 0, 0)
    return rgb


@click.command()
@click.argument("src", type=str)
@click.option("--out", type=str, default=None, help="Output .ply (default: SRC.ply)")
@click.option("--mode", type=click.Choice(["scores", "filtered", "map"]),
              default="scores")
@click.option("--epsilon", type=float, default=0.84,
              help="Filter threshold (reference config.yaml:34)")
def main(src, out, mode, epsilon):
    """SRC: a predictions npy (N, 5) [x y z gt score] from
    `predict.py --save-vis`, or any (N, >=3) point npy (--mode map)."""
    arr = np.load(src)
    if arr.ndim != 2 or arr.shape[1] < 3:
        sys.exit(f"unsupported array shape {arr.shape}")
    xyz = arr[:, :3].astype(np.float32)
    out = out or os.path.splitext(src)[0] + ".ply"
    if mode == "map" or arr.shape[1] < 5:
        rgb = np.full((len(xyz), 3), 160, np.uint8)
    else:
        scores = arr[:, 4]
        if mode == "filtered":
            keep = scores <= epsilon
            xyz, scores = xyz[keep], scores[keep]
        rgb = score_colors(scores, epsilon)
    write_ply(out, xyz, rgb)
    print(f"{out}: {len(xyz)} points")


if __name__ == "__main__":
    main()
