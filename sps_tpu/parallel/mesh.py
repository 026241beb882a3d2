"""Multi-chip SPMD: data-parallel training over a jax.sharding.Mesh.

The reference is single-process single-GPU
(/root/reference/scripts/train.py:54-56; SURVEY.md §2c: no distributed
strategy at all). The TPU-native scale-out path is explicit SPMD with
shard_map over an ICI mesh:

  * axis "dp": the scan batch is sharded; each chip runs the full
    per-sample pipeline (radius join -> voxelize -> topology -> MinkUNet
    -> loss) on its local shard — the sparse topology is per-sample, so
    data parallelism needs no cross-chip communication until the gradient
    pmean, which XLA lowers to an ICI all-reduce.
  * params, optimizer state, and the point-cloud map are replicated.
  * batch_stats are pmean'd like gradients so devices never diverge.

  * axis "sp" (optional second mesh dim): each sample's brick/row axis is
    additionally block-partitioned across devices — spatial sharding, the
    point-cloud analog of sequence parallelism (parallel/spatial.py).
    Single-scan compute fits one chip's HBM at BLT/NCLT scale; sp is the
    seam for city-scale maps and dense multi-scan batches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

try:  # moved in newer jax
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover
    from jax.shard_map import shard_map  # type: ignore


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_dp_train_step(cfg, mesh: Mesh, augment: bool = True):
    """Build a jitted data-parallel train step.

    Host batch arrays are (B, ...) with B divisible by mesh size; they are
    sharded over "dp". Returns step(state, batch, map_points, rngs) where
    rngs is one PRNG key per device (jax.random.split(key, B)).

    If the mesh also has an "sp" axis, each dp row's samples are
    additionally spatially sharded over it (parallel/spatial.py): the
    brick/row axis of every pyramid level is block-partitioned, convs
    all-gather activations over sp, and weight gradients are psum'd over
    sp before the dp pmean.
    """
    from sps_tpu import train as tr

    sp_axis = "sp" if "sp" in mesh.axis_names else None

    def local(state, batch, map_points, rngs):
        rng = rngs[0]
        return tr.grad_step(
            state, batch, map_points, rng, cfg=cfg, augment=augment,
            axis_name="dp", sp_axis=sp_axis,
        )

    smapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("dp"), P(), P("dp")),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(smapped, donate_argnums=(0,))


def dryrun(n_devices: int) -> None:
    """One tiny training step on an n_devices mesh — 2-D dp x sp (data
    parallel over samples, spatial parallel over each sample's brick axis)
    when n_devices allows, else pure dp."""
    import dataclasses

    import sps_tpu.config as cfg_mod
    from sps_tpu import train as tr
    from sps_tpu.config import Config, DataConfig, TrainConfig, TPUConfig

    cfg = Config(
        data=DataConfig(root="/tmp"),
        train=TrainConfig(batch_size=1, lr=1e-3),
        # The flagship single-chip configuration (atlas engine, brick side
        # 8, halo convs, row levels from L3) at tiny capacities, so the
        # dry-run exercises the real sharded training path end to end.
        tpu=TPUConfig(
            scan_points=256,
            submap_points=256,
            cell_capacity=1024,
            voxels=(1024, 512, 256, 256, 256),
            bricks=(512, 256, 256, 256, 256),
            engine="atlas",
            brick_side=8,
            atlas_extent=(24, 24, 24),
            conv_mode="halo",
            row_from=3,
        ),
    )
    if n_devices >= 4 and n_devices % 2 == 0:
        # 2-D mesh: data parallel x spatial parallel (the workload's two
        # meaningful axes — there is no sequence dim, and channels are far
        # too narrow for tensor parallelism; see docs/DESIGN.md).
        n_dp, n_sp = 2, n_devices // 2
        mesh = Mesh(
            np.asarray(jax.devices()[:n_devices]).reshape(n_dp, n_sp),
            ("dp", "sp"),
        )
    else:
        n_dp = n_devices
        mesh = make_mesh(n_devices)
    rng = jax.random.PRNGKey(0)
    state = tr.create_state(cfg, rng, steps_per_epoch=1)

    b = n_dp  # one sample per dp row
    rnp = np.random.default_rng(0)
    ns = cfg.tpu.scan_points
    batch = {
        "xyz": jnp.asarray(rnp.uniform(-5, 5, (b, ns, 3)).astype(np.float32)),
        "label": jnp.asarray(rnp.uniform(0, 1, (b, ns)).astype(np.float32)),
        "valid": jnp.ones((b, ns), bool),
    }
    map_points = jnp.asarray(rnp.uniform(-5, 5, (4096, 3)).astype(np.float32))
    rngs = jax.random.split(jax.random.PRNGKey(1), b)

    # Place inputs with explicit shardings so XLA sees the dp layout.
    sb = NamedSharding(mesh, P("dp"))
    srep = NamedSharding(mesh, P())
    batch = {k: jax.device_put(v, sb) for k, v in batch.items()}
    map_points = jax.device_put(map_points, srep)
    state = jax.device_put(state, srep)
    rngs = jax.device_put(rngs, sb)

    step = make_dp_train_step(cfg, mesh, augment=True)
    state, metrics = step(state, batch, map_points, rngs)
    jax.block_until_ready(metrics)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), "non-finite loss in multichip dryrun"
    axes = "x".join(f"{k}={v}" for k, v in zip(mesh.axis_names, mesh.devices.shape))
    print(f"dryrun_multichip: {n_devices} devices ({axes}), loss={loss:.4f} ok")

    # Serving path: one sp-sharded StreamingFilter scan over the full
    # device set (the multi-chip serving configuration — each chip owns a
    # block of every level's brick/row axis; parallel/spatial.py). This
    # certifies the SERVE program alongside the train step above.
    from sps_tpu.stream.engine import StreamingFilter

    sp_mesh = Mesh(np.asarray(jax.devices()[:n_devices]), ("sp",))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    filt = StreamingFilter(
        cfg, variables, np.asarray(map_points), mesh=sp_mesh
    )
    scores, keep, sstats = filt(
        np.asarray(batch["xyz"][0]),
        np.asarray(batch["valid"][0]),
        np.asarray(batch["label"][0]),
        np.eye(4, dtype=np.float32),
    )
    jax.block_until_ready(scores)
    ssum = float(jnp.sum(scores))
    assert np.isfinite(ssum), "non-finite scores in sp streaming dryrun"
    print(
        f"dryrun_multichip: sp StreamingFilter scan (sp={n_devices}), "
        f"kept={int(sstats['n_kept'])} ok"
    )
