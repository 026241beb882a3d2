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
