"""End-to-end smoke: synthetic dataset -> train steps -> checkpoint ->
predict with per-scan metrics (the reference's train.py + predict.py flow,
SURVEY.md §3.1-3.2)."""

import os

import numpy as np
import pytest

import sps_tpu.config as cfg_mod
from sps_tpu.data import synthetic


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("blt"))
    synthetic.generate(
        root,
        scans_per_seq=3,
        seed=0,
        extent=10.0,
        n_rays=260,
        ground_points=4000,
        n_stable=8,
    )
    return root


@pytest.fixture(scope="module")
def cfg(dataset):
    return cfg_mod.load(
        os.path.join(os.path.dirname(__file__), "..", "config", "config_small.yaml"),
        data_root=dataset,
    )


def test_dataset_layout_and_loading(dataset, cfg):
    from sps_tpu.data.blt import BLTDataModule

    dm = BLTDataModule(cfg)
    assert len(dm.train.scans) == 6 and len(dm.val.scans) == 3
    assert dm.map_points.shape[1] == 3
    # Scans carry a mix of stable and unstable labels.
    labels = np.concatenate([s[:, 3] for s in dm.train.scans])
    assert (labels == 0).any() and (labels == 1).any()
    b = next(iter(dm.batches(dm.train, 2, shuffle=True)))
    assert b["xyz"].shape == (2, cfg.tpu.scan_points, 3)
    assert b["valid"].any()


def test_train_eval_roundtrip(dataset, cfg, tmp_path):
    import jax.numpy as jnp

    from sps_tpu import train as tr
    from sps_tpu import eval as ev
    from sps_tpu.utils import checkpoint as ckpt

    path = tr.fit(
        cfg,
        log_dir=str(tmp_path / "logs"),
        ckpt_dir=str(tmp_path / "ckpt"),
        max_steps=3,
    )
    restored = ckpt.restore(path)
    variables = {
        "params": restored["params"],
        "batch_stats": restored["batch_stats"],
    }
    means = ev.predict_sequence(cfg, variables)
    for k in ("Loss", "R2", "dIoU", "Precision", "Recall", "F1"):
        assert np.isfinite(means[k]), k
    assert 0 <= means["Loss"] <= 1.0
    # Log file written.
    assert os.path.exists(tmp_path / "logs" / "SMOKE.jsonl")


def test_train_resume(dataset, cfg, tmp_path):
    """fit(resume=True) continues from the last checkpoint: optimizer
    state round-trips and the step counter picks up where it stopped
    (Lightning Trainer.fit(ckpt_path=...) parity)."""
    import jax

    from sps_tpu import train as tr
    from sps_tpu.utils import checkpoint as ckpt

    kw = dict(log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpt"))
    first = tr.fit(cfg, max_steps=2, **kw)
    raw = ckpt.restore(first)
    assert int(raw["step"]) == 2 and "opt_state" in raw

    second = tr.fit(cfg, max_steps=4, resume=True, **kw)
    raw2 = ckpt.restore(second)
    assert int(raw2["step"]) == 4
    # Adam second moments are strictly accumulated, never reset: resumed
    # training must keep them (a fresh run at step 2 differs).
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(raw2["opt_state"])
              if hasattr(x, "shape")]
    assert any(np.any(l != 0) for l in leaves)


def test_remat_grads_match(dataset, cfg):
    """remat=True (jax.checkpoint around residual blocks) must change
    memory, not math: gradients match the unremat'd step exactly."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sps_tpu import train as tr

    cfg_r = dataclasses.replace(
        cfg, tpu=dataclasses.replace(cfg.tpu, remat=True)
    )
    rng = jax.random.PRNGKey(0)
    state_a = tr.create_state(cfg, rng, steps_per_epoch=1)
    state_b = tr.create_state(cfg_r, rng, steps_per_epoch=1)

    import numpy as np

    rnp = np.random.default_rng(0)
    ns = cfg.tpu.scan_points
    b = cfg.train.batch_size
    batch = {
        "xyz": jnp.asarray(rnp.uniform(-4, 4, (b, ns, 3)).astype(np.float32)),
        "label": jnp.asarray(rnp.uniform(0, 1, (b, ns)).astype(np.float32)),
        "valid": jnp.ones((b, ns), bool),
    }
    mp = jnp.asarray(rnp.uniform(-4, 4, (2048, 3)).astype(np.float32))
    sk = jax.random.PRNGKey(1)
    _, ma = tr.train_step(state_a, batch, mp, sk, cfg=cfg, augment=False)
    _, mb = tr.train_step(state_b, batch, mp, sk, cfg=cfg_r, augment=False)
    np.testing.assert_allclose(
        float(ma["loss"]), float(mb["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(float(ma["r2"]), float(mb["r2"]), rtol=1e-6)
