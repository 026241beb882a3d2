#!/usr/bin/env python3
"""Train the baseline filters (MOS4D / MapMOS / LTS) on the synthetic
dense dataset so the localization comparison table ranks filters by
BEHAVIOR, not by random init.

The reference ships these baselines as pretrained artifacts
(10_scans.ckpt / mapmos.ckpt / best_model.pth — SURVEY.md §2a #11-13)
that are not downloadable here; this gives ours the equivalent role with
a brief supervised run on the synthetic stability labels:

  * MOS4D  — buffer of N consecutive scans, per-point BCE on the moving
    logit (channel 2, mos4d.py:32). The synthetic clutter is static
    within a sequence, so MOS4D sees no motion signal — it can only
    learn shape priors, which is the honest reproduction of why
    scan-buffer MOS underperforms map-aware filtering on long-term
    change (the paper's comparison).
  * MapMOS — scan + local map crop with normalized-index features,
    per-point BCE on scan points; CAN learn lack-of-map-support.
  * LTS    — range-image windows through the offset-attention
    transformer, MSE on per-point stability scores (the reference trains
    with continuous stability labels).

Writes orbax checkpoints to <out>/{mos4d,mapmos,lts}; consumed by
scripts/loc_experiment.py --baseline-weights.
"""

import dataclasses
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
# Persistent XLA compile cache (TPU backends; tests opt out on CPU
# — see tests/conftest.py): repeat invocations skip the multi-minute
# compile of the per-scan/train programs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_HERE, ".jax_cache"))

import click
import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


@dataclasses.dataclass
class _State:
    params: dict
    batch_stats: dict
    opt_state: object = None
    step: int = 0


def _bce(logits, labels, mask):
    import jax.numpy as jnp
    import optax

    per = optax.sigmoid_binary_cross_entropy(logits, labels)
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _subsample(rng, scan, n):
    if len(scan) <= n:
        return scan
    return scan[rng.choice(len(scan), n, replace=False)]


def train_mos4d(cfg, scans, poses, labels_available, steps, n_scans, ns, out, seed):
    import jax
    import jax.numpy as jnp
    import optax

    from sps_tpu.models.mos4d import MOS4DConfig, MOS4DNet
    from sps_tpu.structs import PointBatch
    from sps_tpu.utils import checkpoint as ckpt

    caps = cfg.sps_config(batch_size=1).caps
    mcfg = MOS4DConfig(voxel_size=cfg.voxel_size, n_scans=n_scans, caps=caps)
    model = MOS4DNet(mcfg)
    nt = n_scans * ns
    rng = np.random.default_rng(seed)

    def sample():
        s0 = rng.integers(0, len(scans) - n_scans)
        xyz = np.zeros((nt, 3), np.float32)
        t = np.zeros((nt,), np.int32)
        lab = np.zeros((nt,), np.float32)
        valid = np.zeros((nt,), bool)
        for i in range(n_scans):
            sc = _subsample(rng, scans[s0 + i], ns)
            w = sc[:, :3] @ poses[s0 + i][:3, :3].T + poses[s0 + i][:3, 3]
            k = len(sc)
            o = i * ns
            xyz[o : o + k], t[o : o + k] = w, i
            lab[o : o + k], valid[o : o + k] = sc[:, 3], True
        return xyz, t, lab, valid

    # jit the init: un-jitted flax init executes each op EAGERLY, and on
    # the axon runtime every eager dispatch is a network round trip
    # (measured: a raw MOS4D init "hangs" ~an hour).
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(seed),
        PointBatch(
            xyz=jnp.zeros((nt, 3)), batch=jnp.zeros((nt,), jnp.int32),
            t=jnp.zeros((nt,), jnp.int32), label=jnp.zeros((nt,)),
            valid=jnp.zeros((nt,), bool).at[:8].set(True),
        ),
    )
    tx = optax.adam(1e-3)
    opt = tx.init(variables["params"])

    @jax.jit
    def step_fn(params, bstats, opt, xyz, t, lab, valid):
        def loss_fn(p):
            (logits, aux), mut = model.apply(
                {"params": p, "batch_stats": bstats},
                PointBatch(xyz=xyz, batch=jnp.zeros_like(t), t=t,
                           label=lab, valid=valid),
                train=True, mutable=["batch_stats"],
            )
            return _bce(logits, lab, valid.astype(jnp.float32)), mut

        (loss, mut), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), mut["batch_stats"], opt, loss

    params, bstats = variables["params"], variables["batch_stats"]
    for i in range(steps):
        xyz, t, lab, valid = sample()
        params, bstats, opt, loss = step_fn(
            params, bstats, opt, jnp.asarray(xyz), jnp.asarray(t),
            jnp.asarray(lab), jnp.asarray(valid))
        if i % 25 == 0 or i == steps - 1:
            log(f"[mos4d] step {i} loss {float(loss):.4f}")
    ckpt.save(os.path.join(out, "mos4d"), _State(params, bstats), cfg)


def train_mapmos(cfg, scans, poses, map_points, steps, ns, nm, out, seed):
    import jax
    import jax.numpy as jnp
    import optax

    from sps_tpu.models.mapmos import MapMOSConfig, MapMOSNet
    from sps_tpu.structs import PointBatch
    from sps_tpu.utils import checkpoint as ckpt

    caps = cfg.sps_config(batch_size=1).caps
    mcfg = MapMOSConfig(voxel_size=cfg.voxel_size, caps=caps)
    model = MapMOSNet(mcfg)
    nt = ns + nm
    rng = np.random.default_rng(seed + 1)

    def sample(i=None):
        si = rng.integers(0, len(scans)) if i is None else i
        sc = _subsample(rng, scans[si], ns)
        w = sc[:, :3] @ poses[si][:3, :3].T + poses[si][:3, 3]
        center = poses[si][:3, 3]
        d = np.linalg.norm(map_points - center[None], axis=1)
        local = map_points[d < 30.0]
        local = _subsample(rng, local, nm)
        xyz = np.zeros((nt, 3), np.float32)
        t = np.zeros((nt,), np.int32)
        lab = np.zeros((nt,), np.float32)
        valid = np.zeros((nt,), bool)
        sup = np.zeros((nt,), np.float32)  # supervise scan points only
        k = len(sc)
        xyz[:k], t[:k], lab[:k], valid[:k], sup[:k] = w, 1, sc[:, 3], True, 1.0
        m = len(local)
        xyz[ns : ns + m], valid[ns : ns + m] = local, True
        idx = np.where(np.arange(nt) < ns, float(si), -1.0).astype(np.float32)
        return xyz, t, lab, valid, sup, idx

    xyz0, t0, lab0, valid0, sup0, idx0 = sample(0)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(seed),
        PointBatch(xyz=jnp.asarray(xyz0), batch=jnp.zeros((nt,), jnp.int32),
                   t=jnp.asarray(t0), label=jnp.asarray(lab0),
                   valid=jnp.asarray(valid0)),
        jnp.asarray(idx0),
    )
    tx = optax.adam(1e-3)
    opt = tx.init(variables["params"])

    @jax.jit
    def step_fn(params, bstats, opt, xyz, t, lab, valid, sup, idx):
        def loss_fn(p):
            (logits, aux), mut = model.apply(
                {"params": p, "batch_stats": bstats},
                PointBatch(xyz=xyz, batch=jnp.zeros_like(t), t=t,
                           label=lab, valid=valid),
                idx, train=True, mutable=["batch_stats"],
            )
            return _bce(logits, lab, sup), mut

        (loss, mut), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), mut["batch_stats"], opt, loss

    params, bstats = variables["params"], variables["batch_stats"]
    for i in range(steps):
        xyz, t, lab, valid, sup, idx = sample()
        params, bstats, opt, loss = step_fn(
            params, bstats, opt, jnp.asarray(xyz), jnp.asarray(t),
            jnp.asarray(lab), jnp.asarray(valid), jnp.asarray(sup),
            jnp.asarray(idx))
        if i % 25 == 0 or i == steps - 1:
            log(f"[mapmos] step {i} loss {float(loss):.4f}")
    ckpt.save(os.path.join(out, "mapmos"), _State(params, bstats), cfg)


def train_lts(cfg, scans, steps, out, seed):
    import jax
    import jax.numpy as jnp
    import optax

    from sps_tpu.data import range_image as ri
    from sps_tpu.models.lts import SPCTReg
    from sps_tpu.utils import checkpoint as ckpt

    model = SPCTReg()
    rng = np.random.default_rng(seed + 2)

    def sample():
        sc = scans[rng.integers(0, len(scans))]
        img = ri.project(sc[:, :4], "vlp-16")
        wins, labels = ri.windows(img, "vlp-16")
        return wins.astype(np.float32), labels.astype(np.float32)

    w0, l0 = sample()
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), jnp.asarray(w0))
    tx = optax.adam(5e-4)
    opt = tx.init(variables["params"])

    @jax.jit
    def step_fn(params, bstats, opt, wins, labels, key):
        def loss_fn(p):
            scores, mut = model.apply(
                {"params": p, "batch_stats": bstats}, wins, train=True,
                mutable=["batch_stats"], rngs={"dropout": key},
            )
            occ = (jnp.abs(wins).sum(-1) > 0).astype(jnp.float32)
            loss = jnp.sum(occ * (scores - labels) ** 2) / jnp.maximum(
                jnp.sum(occ), 1.0)
            return loss, mut

        (loss, mut), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), mut["batch_stats"], opt, loss

    params, bstats = variables["params"], variables["batch_stats"]
    key = jax.random.PRNGKey(seed + 3)
    for i in range(steps):
        wins, labels = sample()
        key, sk = jax.random.split(key)
        params, bstats, opt, loss = step_fn(
            params, bstats, opt, jnp.asarray(wins), jnp.asarray(labels), sk)
        if i % 25 == 0 or i == steps - 1:
            log(f"[lts] step {i} loss {float(loss):.4f}")
    ckpt.save(os.path.join(out, "lts"), _State(params, bstats), cfg)


@click.command()
@click.option("--config", "-c", type=str, default="./config/config_loc.yaml")
@click.option("--data", type=str, default=None)
@click.option("--out", type=str, default="./checkpoints/baselines")
@click.option("--models", type=str, default="mos4d,mapmos,lts")
@click.option("--steps", type=int, default=200)
@click.option("--n-scans", type=int, default=4, help="MOS4D buffer length")
@click.option("--points-per-scan", type=int, default=16384)
@click.option("--map-points", "nm", type=int, default=32768)
@click.option("--seed", type=int, default=0)
def main(config, data, out, models, steps, n_scans, points_per_scan, nm, seed):
    from sps_tpu import config as cfg_mod
    from sps_tpu.data import blt

    cfg = cfg_mod.load(config, data_root=data)
    scans, poses = blt.load_sequences_raw(cfg.data.root, cfg.data.train)
    map_pts = blt.load_map(cfg.data.root, cfg.data.map_file)
    os.makedirs(out, exist_ok=True)
    todo = [m.strip() for m in models.split(",")]
    if "mos4d" in todo:
        train_mos4d(cfg, scans, poses, True, steps, n_scans,
                    points_per_scan, out, seed)
    if "mapmos" in todo:
        train_mapmos(cfg, scans, poses, map_pts, steps, points_per_scan,
                     nm, out, seed)
    if "lts" in todo:
        train_lts(cfg, scans, steps, out, seed)
    log(f"baseline checkpoints in {out}")


if __name__ == "__main__":
    main()
