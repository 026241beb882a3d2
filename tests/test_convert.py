"""Checkpoint converter: flax <-> torch-layout round trips.

We cannot run MinkowskiEngine here, so parity with a real 420_601.ckpt is
validated structurally: the converter must round-trip exactly (flax ->
torch layout -> flax), cover every parameter, and produce a model whose
forward runs. Kernel-order permutations are exercised both ways.
"""

import functools

import numpy as np
import jax

from sps_tpu import convert
from sps_tpu import train as tr
from sps_tpu import config as cfg_mod


def _cfg():
    # Gather engine: the converter is engine-independent (all engines share
    # one parameter tree), and the gather graph compiles ~an order of
    # magnitude faster on one CPU core than brick/region — this file lives
    # in the FAST_TESTS tier (Makefile) and must stay minutes, not tens.
    return cfg_mod.Config(
        data=cfg_mod.DataConfig(root="/tmp"),
        train=cfg_mod.TrainConfig(batch_size=1),
        tpu=cfg_mod.TPUConfig(
            scan_points=256, submap_points=256, cell_capacity=1024,
            voxels=(1024, 512, 256, 128, 64), engine="gather",
        ),
    )


@functools.lru_cache(maxsize=1)
def _state():
    # One model init shared by every test in this file (it was the whole
    # cost of the file: three full-forward XLA compiles).
    return tr.create_state(_cfg(), jax.random.PRNGKey(0), 1)


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def test_roundtrip_flax_torch_flax():
    state = _state()
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    sd = convert.state_dict_from_variables(variables)
    # All keys follow the reference layout.
    assert "model.MinkUNet.conv0p1s1.kernel" in sd
    assert "model.MinkUNet.block2.0.downsample.0.kernel" in sd
    assert "model.MinkUNet.final.bias" in sd
    assert sd["model.MinkUNet.conv0p1s1.kernel"].shape == (125, 1, 8)
    assert sd["model.MinkUNet.block1.0.conv1.kernel"].shape == (81, 8, 8)
    assert sd["model.MinkUNet.conv1p1s2.kernel"].shape == (8, 8, 8)
    assert sd["model.MinkUNet.final.kernel"].shape == (8, 1)

    back = convert.variables_from_state_dict(sd)
    a = _flatten(variables)
    b = _flatten(back)
    assert set(a) == set(b), (set(a) - set(b), set(b) - set(a))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_converted_variables_run_forward():
    cfg = _cfg()
    state = _state()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    sd = convert.state_dict_from_variables(variables)
    back = convert.variables_from_state_dict(sd)

    from sps_tpu.models.spsnet import SPSModel
    from sps_tpu.structs import pad_point_batch

    rng = np.random.default_rng(0)
    n = 100
    pb = pad_point_batch(
        rng.uniform(-3, 3, (n, 3)).astype(np.float32),
        np.zeros(n, np.int32),
        rng.integers(0, 2, n),
        rng.uniform(0, 1, n),
        cfg.point_capacity,
    )
    model = SPSModel(cfg.sps_config())
    s1, _ = model.apply(variables, pb)
    s2, _ = model.apply(back, pb)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_mos4d_mapmos_prefix_strip():
    state = _state()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    sd = convert.state_dict_from_variables(variables, prefix="mos.MinkUNet.")
    back = convert.variables_from_state_dict(sd, strip_prefix="mos.MinkUNet.")
    a, b = _flatten(variables), _flatten(back)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
