"""Training loop: optax Adam + stepped exponential LR decay, masked MSE.

Equivalent capability to the reference's Lightning stack
(/root/reference/scripts/train.py:37-66 + models.py:62-82,154-160):
  * Adam(lr, weight_decay) with StepLR(gamma per LR_EPOCH epochs) — the
    optax chain add_decayed_weights -> adam matches torch Adam's coupled
    L2, and a staircase exponential_decay matches StepLR.
  * loss = MSE over scan points only (models.py:65-67), R2 logged.
  * checkpoints: best-val + last (train.py:40-45) via orbax.
  * TensorBoard logging when tensorboardX is available, JSONL always.

The whole step — submap join, augmentation, forward, backward, update —
is one jitted function; the host only feeds padded scan arrays.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from sps_tpu import pipeline
from sps_tpu.config import Config
from sps_tpu.data.blt import BLTDataModule
from sps_tpu.models.spsnet import SPSModel
from sps_tpu.structs import PointBatch
from sps_tpu.utils import checkpoint as ckpt
from sps_tpu.utils.metrics import masked_mse, masked_r2


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def _dummy_point_batch(capacity: int) -> PointBatch:
    return PointBatch(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        batch=jnp.zeros((capacity,), jnp.int32),
        t=jnp.zeros((capacity,), jnp.int32),
        label=jnp.zeros((capacity,), jnp.float32),
        valid=jnp.zeros((capacity,), bool).at[:8].set(True),
    )


def create_state(cfg: Config, rng: jax.Array, steps_per_epoch: int) -> TrainState:
    model = SPSModel(cfg.sps_config())
    variables = jax.jit(model.init)(rng, _dummy_point_batch(cfg.point_capacity))
    schedule = optax.exponential_decay(
        init_value=cfg.train.lr,
        transition_steps=max(1, steps_per_epoch * cfg.train.lr_epoch),
        decay_rate=cfg.train.lr_decay,
        staircase=True,
    )
    tx = optax.chain(
        optax.add_decayed_weights(cfg.train.weight_decay),
        optax.adam(schedule),
    )
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )


def grad_step(
    state: TrainState,
    batch,
    map_points,
    rng,
    map_vm=None,
    *,
    cfg: Config,
    augment: bool,
    axis_name: str | None = None,
    sp_axis: str | None = None,
):
    """One optimizer step. With axis_name set (inside shard_map/pmap) the
    gradients, loss and batch_stats are pmean'd over the data-parallel
    axis, so every device applies identical updates.

    sp_axis: additionally shard each sample's brick/row axis over this
    mesh axis (parallel/spatial.py). The forward all-gathers activations
    per conv, so each device's backward holds only its block's weight-
    gradient contribution — those are SUMMED (not averaged) over sp."""
    pb, aux = pipeline.assemble_batch(
        batch["xyz"],
        batch["label"],
        batch["valid"],
        map_points,
        cfg,
        rng if augment else None,
        map_vm=map_vm,
    )
    apply_fn = state.apply_fn
    if sp_axis is not None:
        from sps_tpu.models.spsnet import SPSModel
        from sps_tpu.parallel import spatial as sp_mod

        # Same parameter tree as state.apply_fn's model; only the
        # collectives differ, so params/batch_stats load unchanged.
        apply_fn = SPSModel(sp_mod.sp_config(cfg.sps_config(), sp_axis)).apply

    def loss_fn(params):
        (scores, maux), mut = apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            pb,
            train=True,
            mutable=["batch_stats"],
        )
        scan_mask = pb.valid & (pb.t == pipeline.SCAN_T)
        if cfg.train.stable_weight != 1.0 or cfg.train.loss == "bce":
            # Weighted per-point loss: stable scan points (label < 0.5)
            # weigh `stable_weight` — penalizing false-unstable scores,
            # the error mode that over-cuts registration structure.
            # LOSS=bce swaps the squared error for binary cross-entropy
            # on the sigmoid scores (natural for binary labels; the
            # in-repo baselines train with BCE). stable_weight=1 +
            # LOSS=mse is exactly the reference loss (models.py:67-68).
            w = scan_mask.astype(scores.dtype) * jnp.where(
                pb.label < 0.5, cfg.train.stable_weight, 1.0
            )
            if cfg.train.loss == "bce":
                s = jnp.clip(scores, 1e-6, 1.0 - 1e-6)
                per = -(pb.label * jnp.log(s) + (1.0 - pb.label) * jnp.log(1.0 - s))
            else:
                per = (scores - pb.label) ** 2
            loss = jnp.sum(w * per) / jnp.maximum(jnp.sum(w), 1.0)
        else:
            loss = masked_mse(scores, pb.label, scan_mask)
        return loss, (mut, scores, scan_mask, maux)

    (loss, (mut, scores, scan_mask, maux)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    metrics = {
        "loss": loss,
        "r2": masked_r2(scores, pb.label, scan_mask),
        "overflow": jnp.any(maux["overflow"]),
        "submap_overflow": aux["submap_overflow"],
    }
    new_bs = mut["batch_stats"]
    if sp_axis is not None:
        grads = jax.lax.psum(grads, sp_axis)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        new_bs = jax.lax.pmean(new_bs, axis_name)
        metrics = {
            k: (jax.lax.pmean(v, axis_name) if v.dtype != bool else
                jax.lax.pmax(v.astype(jnp.int32), axis_name) > 0)
            for k, v in metrics.items()
        }
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=new_bs)
    return state, metrics


@partial(jax.jit, static_argnames=("cfg", "augment"), donate_argnums=(0,))
def train_step(state: TrainState, batch, map_points, rng, map_vm=None, *,
               cfg: Config, augment: bool):
    return grad_step(state, batch, map_points, rng, map_vm,
                     cfg=cfg, augment=augment)


@partial(jax.jit, static_argnames=("cfg",))
def eval_step(state: TrainState, batch, map_points, map_vm=None, *, cfg: Config):
    pb, _ = pipeline.assemble_batch(
        batch["xyz"], batch["label"], batch["valid"], map_points, cfg, None,
        map_vm=map_vm,
    )
    scores, _ = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats}, pb, train=False
    )
    scan_mask = pb.valid & (pb.t == pipeline.SCAN_T)
    return {
        "loss": masked_mse(scores, pb.label, scan_mask),
        "r2": masked_r2(scores, pb.label, scan_mask),
    }


class JSONLLogger:
    def __init__(self, log_dir: str, name: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self.tb = None
        try:
            from tensorboardX import SummaryWriter

            self.tb = SummaryWriter(os.path.join(log_dir, name))
        except Exception:
            pass

    def log(self, step: int, **kv):
        with open(self.path, "a") as f:
            f.write(json.dumps({"step": step, **kv}) + "\n")
        if self.tb is not None:
            for k, v in kv.items():
                if isinstance(v, (int, float)):
                    self.tb.add_scalar(k, v, step)


def fit(cfg: Config, log_dir: str = "./tb_logs", ckpt_dir: str = "./checkpoints",
        max_steps: int | None = None, seed: int = 0, resume: bool = False,
        devices: int = 1) -> str:
    """Train per config; returns the best checkpoint path.

    resume: continue from `<ckpt_dir>/last` (params, batch_stats, optimizer
    state, step and epoch counters) — the analog of Lightning
    `Trainer.fit(ckpt_path="last")`. The last checkpoint must have been
    written by this trainer (it persists opt_state; `full=True` saves).

    devices: >1 trains data-parallel over a `devices`-chip ICI mesh
    (parallel/mesh.py) — batch sharded, params/map replicated, grads and
    batch_stats pmean'd. batch_size must be divisible by devices.
    """
    data = BLTDataModule(cfg)
    map_points = jnp.asarray(data.map_points)
    map_vm = None
    if cfg.dist_feature:
        if devices > 1:
            raise ValueError(
                "dist_feature under dp training is not plumbed yet; "
                "train single-device or turn MODEL.DIST_FEATURE off"
            )
        from sps_tpu import register as reg

        # 4x voxel cells (0.4 m at the reference voxel size): the 27-cell
        # LUT search then resolves distances well past dist_cap.
        map_vm = reg.build_voxel_map(
            np.asarray(data.map_points), voxel_size=4 * cfg.voxel_size
        )
    steps_per_epoch = max(1, len(data.train) // cfg.train.batch_size)
    rng = jax.random.PRNGKey(seed)
    state = create_state(cfg, rng, steps_per_epoch)
    logger = JSONLLogger(log_dir, cfg.experiment_id)

    # Device-resident dataset: pad every scan once and keep the split in
    # HBM; each step slices its batch with an on-device gather. Removes
    # the per-step host->device scan upload from the loop (PCIe-cheap on
    # a real host, minutes-per-epoch through the axon tunnel) — the TPU
    # input-pipeline analog of tf.data's cache-on-device.
    def _device_split(split):
        ns = cfg.tpu.scan_points
        n = len(split.scans)
        xyz = np.zeros((n, ns, 3), np.float32)
        label = np.zeros((n, ns), np.float32)
        valid = np.zeros((n, ns), bool)
        for i, scan in enumerate(split.scans):
            k = min(len(scan), ns)
            if len(scan) > ns:
                raise ValueError(
                    f"scan {i} has {len(scan)} points > capacity {ns}"
                )
            xyz[i, :k], label[i, :k], valid[i, :k] = scan[:k, :3], scan[:k, 3], True
        return {
            "xyz": jnp.asarray(xyz),
            "label": jnp.asarray(label),
            "valid": jnp.asarray(valid),
        }

    dev_bytes = sum(len(s.scans) for s in (data.train, data.val)) * (
        cfg.tpu.scan_points * 17
    )
    device_data = devices == 1 and dev_bytes < (2 << 30)
    if device_data:
        train_dev = _device_split(data.train)
        val_dev = _device_split(data.val)

    dp_step = None
    if devices > 1:
        if devices > len(jax.devices()):
            raise ValueError(
                f"--devices {devices} > {len(jax.devices())} available "
                f"({[str(d) for d in jax.devices()]}); a smaller mesh would "
                "silently change parallelism"
            )
        if cfg.train.batch_size % devices:
            raise ValueError(
                f"batch_size {cfg.train.batch_size} not divisible by devices {devices}"
            )
        from sps_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh(devices)
        dp_step = pmesh.make_dp_train_step(cfg, mesh, augment=cfg.train.augmentation)

    best_val = float("inf")
    best_path = os.path.join(os.path.abspath(ckpt_dir), "best")
    last_path = os.path.join(os.path.abspath(ckpt_dir), "last")
    step = 0
    start_epoch = 0
    if resume:
        if not os.path.isdir(last_path):
            raise FileNotFoundError(
                f"--resume given but no last checkpoint at {last_path} "
                "(check --ckpt-dir); refusing to silently train from scratch"
            )
        have = ckpt.keys(last_path)
        if "opt_state" not in have:
            raise ValueError(
                f"{last_path} has no optimizer state; it predates resumable "
                "checkpoints and cannot seed --resume"
            )
        tmpl = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": jnp.asarray(state.step),
            "epoch": jnp.asarray(0),
        }
        # Older resumable checkpoints lack best_val/mid_epoch.
        if "best_val" in have:
            tmpl["best_val"] = jnp.asarray(0.0)
        if "mid_epoch" in have:
            tmpl["mid_epoch"] = jnp.asarray(False)
        out = ckpt.restore(last_path, template=tmpl)
        state = state.replace(
            params=out["params"],
            batch_stats=out["batch_stats"],
            opt_state=out["opt_state"],
            step=int(out["step"]),
        )
        step = int(out["step"])
        best_val = float(out.get("best_val", jnp.inf))
        mid_epoch = bool(out.get("mid_epoch", False))
        # An end-of-epoch save resumes at the next epoch; a mid-epoch
        # (max_steps) save re-enters the interrupted epoch — its already-
        # seen batches replay (the epoch's shuffle is seed-deterministic),
        # which we accept rather than silently skipping unseen data.
        start_epoch = int(out["epoch"]) + (0 if mid_epoch else 1)
        print(
            f"resumed from {last_path}: epoch {start_epoch}, step {step}, "
            f"best_val {best_val:.4f}"
            + (" (mid-epoch save: interrupted epoch replays)" if mid_epoch else ""),
            flush=True,
        )
    def _epoch_batches(epoch):
        """Yield device batch dicts: device-resident gathers when the
        split lives in HBM, else host-padded + per-step upload (the
        multi-chip path, where the batch must shard over dp)."""
        bsz = cfg.train.batch_size
        if device_data:
            n = train_dev["xyz"].shape[0]
            idx = np.arange(n)
            if cfg.data.shuffle:
                np.random.default_rng(seed + epoch).shuffle(idx)
            for i in range(0, n, bsz):
                sel = jnp.asarray(idx[i : i + bsz])
                if len(idx[i : i + bsz]) < bsz:  # pad the tail batch
                    sel = jnp.concatenate(
                        [sel, jnp.zeros((bsz - sel.shape[0],), sel.dtype)]
                    )
                    yield {
                        k: v[sel]
                        .at[len(idx[i : i + bsz]):]
                        .set(0 if k != "valid" else False)
                        for k, v in train_dev.items()
                    }
                else:
                    yield {k: v[sel] for k, v in train_dev.items()}
            return
        # Host path: batch i+1 pads on a worker thread during step i.
        from sps_tpu.data.blt import prefetched

        for batch in prefetched(
            data.batches(data.train, bsz, cfg.data.shuffle, seed=seed + epoch)
        ):
            yield {k: jnp.asarray(v) for k, v in batch.items() if k != "indices"}

    t0 = time.time()
    for epoch in range(start_epoch, cfg.train.max_epoch):
        for hb in _epoch_batches(epoch):
            rng, sk = jax.random.split(rng)
            if dp_step is not None:
                state, m = dp_step(state, hb, map_points, jax.random.split(sk, devices))
            else:
                state, m = train_step(
                    state, hb, map_points, sk, map_vm,
                    cfg=cfg, augment=cfg.train.augmentation,
                )
            step += 1
            if step % 10 == 1 or max_steps:
                mm = {k: float(v) for k, v in m.items()}
                logger.log(step, epoch=epoch, **{f"train_{k}": v for k, v in mm.items()})
                print(
                    f"epoch {epoch} step {step} loss {mm['loss']:.4f} "
                    f"r2 {mm['r2']:.4f} ({(time.time()-t0)/step:.2f}s/it)",
                    flush=True,
                )
            if max_steps and step >= max_steps:
                ckpt.save(last_path, state, cfg, epoch=epoch, full=True,
                          best_val=best_val, mid_epoch=True)
                return last_path
        # Validation.
        vals = []
        if device_data:
            n = val_dev["xyz"].shape[0]
            bsz = cfg.train.batch_size
            for i in range(0, n - bsz + 1, bsz):  # drop ragged tail
                sel = jnp.arange(i, i + bsz)
                hb = {k: v[sel] for k, v in val_dev.items()}
                vals.append(eval_step(state, hb, map_points, map_vm, cfg=cfg))
            if not vals:  # split smaller than one batch: pad
                hb = {
                    k: jnp.concatenate([v, jnp.zeros_like(v)] * bsz, 0)[:bsz]
                    for k, v in val_dev.items()
                }
                vals.append(eval_step(state, hb, map_points, map_vm, cfg=cfg))
        else:
            for batch in data.batches(data.val, cfg.train.batch_size, False):
                hb = {k: jnp.asarray(v) for k, v in batch.items() if k != "indices"}
                vals.append(eval_step(state, hb, map_points, map_vm, cfg=cfg))
        vloss = float(jnp.mean(jnp.stack([v["loss"] for v in vals])))
        vr2 = float(jnp.mean(jnp.stack([v["r2"] for v in vals])))
        logger.log(step, epoch=epoch, val_loss=vloss, val_r2=vr2)
        print(f"epoch {epoch} VAL loss {vloss:.4f} r2 {vr2:.4f}", flush=True)
        if vloss < best_val:
            best_val = vloss
            ckpt.save(best_path, state, cfg)
        ckpt.save(last_path, state, cfg, epoch=epoch, full=True,
                  best_val=best_val)
    return best_path
