"""Sequence evaluation: per-scan Loss/R2/dIoU/Precision/Recall/F1.

Equivalent of the reference's predict flow
(/root/reference/scripts/predict.py:40-83 + models.py:84-111): batch size
1, per-scan metrics binarized at eps, means printed as a summary table.
Optionally dumps per-scan prediction .npy files like SPSNet.__save_vis
(models.py:113-152)."""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sps_tpu import pipeline
from sps_tpu.config import Config
from sps_tpu.data.blt import BLTDataModule
from sps_tpu.models.spsnet import SPSModel
from sps_tpu.utils.metrics import classification_metrics, masked_mse, masked_r2


@partial(jax.jit, static_argnames=("cfg",))
def predict_step(variables, batch, map_points, map_vm=None, *, cfg: Config):
    """Forward one scan (batch size 1) -> scores + metrics."""
    pb, aux = pipeline.assemble_batch(
        batch["xyz"], batch["label"], batch["valid"], map_points, cfg, None,
        map_vm=map_vm,
    )
    model = SPSModel(cfg.sps_config(batch_size=1))
    scores, maux = model.apply(variables, pb, train=False)
    scan_mask = pb.valid & (pb.t == pipeline.SCAN_T)
    metrics = {
        "Loss": masked_mse(scores, pb.label, scan_mask),
        "R2": masked_r2(scores, pb.label, scan_mask),
        **{
            {"dIoU": "dIoU", "precision": "Precision", "recall": "Recall", "f1": "F1"}.get(
                k, k
            ): v
            for k, v in classification_metrics(
                scores, pb.label, scan_mask, cfg.threshold
            ).items()
            if k in ("dIoU", "precision", "recall", "f1")
        },
        "overflow": jnp.any(maux["overflow"]),
    }
    return scores, scan_mask, metrics


def predict_sequence(
    cfg: Config, variables, save_vis: bool = False
) -> dict[str, float]:
    """Run the test split; returns mean metrics and prints the table."""
    cfg_b1 = cfg
    data = BLTDataModule(cfg_b1, test=True)
    map_points = jnp.asarray(data.map_points)
    map_vm = None
    if cfg.dist_feature:
        from sps_tpu import register as reg

        map_vm = reg.build_voxel_map(
            np.asarray(data.map_points), voxel_size=4 * cfg.voxel_size
        )
    acc: dict[str, list[float]] = {}
    for batch in data.batches(data.test, 1, shuffle=False):
        hb = {k: jnp.asarray(v) for k, v in batch.items() if k != "indices"}
        scores, scan_mask, m = predict_step(
            variables, hb, map_points, map_vm, cfg=cfg_b1
        )
        for k, v in m.items():
            if k == "overflow":
                if bool(v):
                    print("WARNING: capacity overflow on scan", batch["indices"])
                continue
            acc.setdefault(k, []).append(float(v))
        if save_vis:
            _save_vis(cfg, batch, np.asarray(scores), np.asarray(scan_mask))
    means = {k: float(np.mean(v)) for k, v in acc.items()}
    print("\n########## Inference Metrics ##########")
    for name in ("Loss", "R2", "dIoU", "Precision", "Recall", "F1"):
        fill = "." * (12 - len(name))
        print(f"{name} {fill} {means[name]:.3f}")
    return means


def _save_vis(cfg: Config, batch, scores: np.ndarray, scan_mask: np.ndarray):
    seq = cfg.data.test[0]
    s_path = os.path.join(cfg.data.root, "predictions", seq, "scans")
    os.makedirs(s_path, exist_ok=True)
    ns = cfg.tpu.scan_points
    valid = batch["valid"][0]
    pts = batch["xyz"][0][valid]
    gt = batch["label"][0][valid]
    hat = scores[:ns][valid]
    idx = int(batch["indices"][0])
    np.save(
        os.path.join(s_path, f"{idx}_0.npy"),
        np.column_stack([pts, gt, hat]).astype(np.float32),
    )
