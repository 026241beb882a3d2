"""Checkpoint save/restore (orbax) + hyperparameter sidecar.

Replaces Lightning's ModelCheckpoint (/root/reference/scripts/train.py:40-45).
Checkpoints carry params + batch_stats + opt_state and a JSON sidecar with
the config (the reference freezes hyper_parameters into ckpts via
save_hyperparameters, models.py:36; consumers read them back, e.g.
mask.py:54)."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _cfg_to_dict(cfg) -> dict:
    def enc(o):
        if dataclasses.is_dataclass(o):
            return {f.name: enc(getattr(o, f.name)) for f in dataclasses.fields(o)}
        if isinstance(o, (tuple, list)):
            return [enc(x) for x in o]
        if hasattr(o, "dtype") and not isinstance(o, (int, float, str, bool)):
            return str(o)
        return o

    return enc(cfg)


def save(path: str, state, cfg=None, epoch: int | None = None,
         full: bool = False, best_val: float | None = None,
         mid_epoch: bool = False) -> None:
    """full=True additionally persists opt_state (+ epoch, best_val so far,
    and whether the save interrupted an epoch), making the checkpoint
    resumable — the analog of Lightning's save_last=True checkpoints,
    which carry optimizer state AND best_model_score for
    `fit(ckpt_path=...)`."""
    path = os.path.abspath(path)
    item = {"params": state.params, "batch_stats": state.batch_stats}
    if getattr(state, "opt_state", None) is not None:
        item["step"] = jax.numpy.asarray(state.step)
    if full:
        item["opt_state"] = state.opt_state
        item["epoch"] = jax.numpy.asarray(-1 if epoch is None else epoch)
        item["best_val"] = jax.numpy.asarray(
            float("inf") if best_val is None else float(best_val)
        )
        item["mid_epoch"] = jax.numpy.asarray(bool(mid_epoch))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, item, force=True)
    if cfg is not None:
        with open(path + ".config.json", "w") as f:
            json.dump(_cfg_to_dict(cfg), f, indent=2)


def keys(path: str) -> set[str]:
    """Top-level keys present in a checkpoint, read from orbax metadata
    (no full restore — a resumable checkpoint is ~4x params size)."""
    path = os.path.abspath(path)
    try:
        meta = ocp.PyTreeCheckpointer().metadata(path)
        tree = getattr(meta, "tree", meta)
        return set(tree.keys())
    except Exception:
        # Metadata unavailable (older orbax layout): fall back to a raw
        # restore just to learn the structure.
        out = ocp.PyTreeCheckpointer().restore(path)
        return set(out.keys())


def _norm_path(p) -> str:
    """Normalize a jax key path to a '/'-joined name string so dict
    (restored) vs NamedTuple/tuple (template) spellings compare."""
    parts = []
    for k in p:
        for attr in ("key", "name", "idx"):
            if hasattr(k, attr):
                parts.append(str(getattr(k, attr)))
                break
        else:
            parts.append(str(k))
    return "/".join(parts)


def _reassociate(out, template, path: str):
    """Rebind restored leaves into the template's structure BY PATH, not
    blindly by position: equal leaf counts with different key structure
    would otherwise silently assign parameters to wrong names (ADVICE
    r4). If path normalization cannot align the two trees (e.g. the
    serialization renamed tuple slots), fall back to positional WITH a
    per-leaf shape check, turning silent mis-assignment into an error."""
    flat_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    flat_r = jax.tree_util.tree_flatten_with_path(out)[0]
    restored = {_norm_path(p): v for p, v in flat_r}
    if len(restored) == len(flat_r) and all(
        _norm_path(p) in restored for p, _ in flat_t
    ):
        leaves = [restored[_norm_path(p)] for p, _ in flat_t]
    else:
        leaves = [v for _, v in flat_r]
        for (p, t), v in zip(flat_t, leaves):
            ts = getattr(t, "shape", None)
            vs = getattr(v, "shape", None)
            if ts is not None and vs is not None and ts != vs:
                raise ValueError(
                    f"checkpoint at {path}: leaf {_norm_path(p)} shape "
                    f"{vs} != template {ts} (key structure drift)")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def restore(path: str, template=None) -> dict[str, Any]:
    """template: an item pytree whose structure the restore should follow
    (needed for opt_state, whose optax NamedTuple structure is lost in a
    raw restore). Extra template keys absent from the checkpoint are not
    tolerated — check key presence with a raw restore first."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    try:
        out = ckptr.restore(path) if template is None else ckptr.restore(path, item=template)
    except ValueError:
        # Checkpoint saved on a different device topology (e.g. the single
        # TPU chip) being restored elsewhere (e.g. the 8-virtual-device CPU
        # test mesh): the recorded shardings don't resolve. Restore as host
        # numpy arrays instead; callers device_put as needed.
        import jax
        import numpy as np

        tree = ckptr.metadata(path).item_metadata.tree
        args = jax.tree.map(lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        out = ckptr.restore(path, restore_args=args)
        if template is not None:
            out = _reassociate(out, template, path)
    cfg_path = path + ".config.json"
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            out["config"] = json.load(f)
    return out
