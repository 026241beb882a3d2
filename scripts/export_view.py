#!/usr/bin/env python3
"""Export a multi-layer visualization per a dataset view preset.

The reference ships five rviz layouts (config/rviz/{hdl,hdl_nclt,hdl_rise,
mulran,debug}.rviz) selecting per-dataset cameras and point-cloud layers
(/ndt/globalmap, /debug/cloud_submap, /debug/raw_cloud_tr,
/cloud_filtered). The ROS-free equivalent: config/views/<name>.yaml
presets + this tool, which renders one colored PLY per enabled layer from
a predictions dump (predict.py --save-vis rows: x y z gt score) and the
map, plus a view.json camera block (distance/pitch/yaw/focal) any viewer
script (Open3D/CloudCompare) can apply.

Usage:
  python scripts/export_view.py --view blt --pred vis/000123.npy \
      --map $DATA/maps/base_map.asc.npy --out /tmp/view_blt
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np
import yaml

from scripts.export_ply import score_colors, write_ply


def _layer_points(name, pred, map_pts, eps):
    if name == "map":
        return map_pts, None
    if pred is None:
        return None, None
    xyz, scores = pred[:, :3], pred[:, 4]
    if name == "raw":
        return xyz, scores
    if name == "filtered":
        keep = scores <= eps
        return xyz[keep], scores[keep]
    if name == "submap":
        # Without a dumped submap cloud, the submap layer is the scan's
        # map-supported fraction (gt == stable) — the overlap the engine
        # feeds the model (streaming never materializes a submap cloud;
        # docs/DESIGN.md §5).
        keep = pred[:, 3] <= eps
        return xyz[keep], None
    raise ValueError(name)


@click.command()
@click.option("--view", type=str, required=True,
              help="preset name under config/views/ (blt|nclt|rise|mulran|debug)")
@click.option("--pred", type=str, default=None,
              help="predictions npy (N, 5) from predict.py --save-vis")
@click.option("--map", "map_path", type=str, default=None)
@click.option("--out", type=str, required=True, help="output directory")
def main(view, pred, map_path, out):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    vpath = os.path.join(here, "config", "views", f"{view}.yaml")
    with open(vpath) as f:
        preset = yaml.safe_load(f)
    eps = float(preset.get("epsilon", 0.84))
    pred_arr = np.load(pred) if pred else None
    map_pts = None
    if map_path:
        m = np.load(map_path) if map_path.endswith(".npy") else np.loadtxt(map_path)
        map_pts = m[:, :3].astype(np.float32)

    os.makedirs(out, exist_ok=True)
    written = []
    for name, spec in preset["layers"].items():
        if not spec.get("enabled", True):
            continue
        xyz, scores = _layer_points(name, pred_arr, map_pts, eps)
        if xyz is None or len(xyz) == 0:
            continue
        if spec.get("color") == "score" and scores is not None:
            rgb = score_colors(scores, eps)
        else:
            c = spec.get("color")
            c = c if isinstance(c, (list, tuple)) else (160, 160, 160)
            rgb = np.tile(np.asarray(c, np.uint8), (len(xyz), 1))
        path = os.path.join(out, f"{name}.ply")
        write_ply(path, xyz.astype(np.float32), rgb)
        written.append({"layer": name, "file": f"{name}.ply",
                        "points": int(len(xyz)),
                        "point_size": spec.get("point_size", 0.1)})
    with open(os.path.join(out, "view.json"), "w") as f:
        json.dump({"camera": preset["camera"], "epsilon": eps,
                   "layers": written}, f, indent=2)
    print(f"{out}: {[w['layer'] for w in written]} + view.json")


if __name__ == "__main__":
    main()
