"""Converter pin against a REAL torch checkpoint file.

tests/fixtures/me_golden.ckpt is a Lightning-format torch checkpoint whose
state_dict key names and tensor shapes were transcribed directly from the
reference module tree (scripts/make_torch_golden.py documents the spec:
ME conv kernels (K_total, Cin, Cout), 1x1 as (Cin, Cout), `<n>.bn.*`
batch-norm keys, `downsample.{0,1}` Sequential, `model.MinkUNet.` prefix —
reference load paths predict.py:56-58, util.py:29-46). This closes the gap
tests/test_me_order.py cannot cover: real tensor layouts flowing from a
real torch .ckpt file through torch.load -> convert -> forward.

The expected scores are a regression pin: they were produced by the
converted model at fixture-generation time, so any change to the key map,
kernel-order permutation, or BN packing that alters the loaded weights
breaks this test.
"""

import os

import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")

from sps_tpu import convert
from sps_tpu.models.minkunet import MinkUNetConfig
from sps_tpu.models.spsnet import SPSConfig, SPSModel
from sps_tpu.structs import Capacities, pad_point_batch

FDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _cfg():
    caps = Capacities(points=2048, voxels=(1024, 512, 512, 256, 128),
                      bricks=(1024, 512, 256, 256, 256))
    return SPSConfig(
        voxel_size=0.25, caps=caps,
        unet=MinkUNetConfig(in_channels=1, out_channels=1, init_dim=4,
                            planes=(4, 8, 8, 8, 8, 8, 8, 4), num_time=2),
        engine="gather",
    )


def test_golden_ckpt_converts_and_matches_pinned_scores():
    cfg = _cfg()
    path = os.path.join(FDIR, "me_golden.ckpt")
    variables = convert.torch_ckpt_to_variables(path, cfg)

    z = np.load(os.path.join(FDIR, "me_golden_expected.npz"))
    pb = pad_point_batch(z["xyz"], z["batch"], z["t"], z["label"],
                         cfg.caps.points)
    model = SPSModel(cfg)
    scores, aux = jax.jit(lambda v, b: model.apply(v, b))(variables, pb)
    assert not bool(np.asarray(aux["overflow"]).any())
    np.testing.assert_allclose(
        np.asarray(scores), z["scores"], rtol=1e-4, atol=1e-5)


def test_golden_ckpt_every_tensor_consumed():
    """Structural completeness: every state_dict tensor (except
    num_batches_tracked, which flax has no analog of) must land in the
    converted tree with its values intact somewhere."""
    path = os.path.join(FDIR, "me_golden.ckpt")
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v for k, v in ckpt["state_dict"].items()
          if "num_batches_tracked" not in k}
    variables = convert.torch_ckpt_to_variables(path, _cfg())

    import flax

    flat = {}
    for col in ("params", "batch_stats"):
        flat.update(flax.traverse_util.flatten_dict(variables[col]))
    got = sorted(np.asarray(v).size for v in flat.values())
    want = sorted(v.numel() for v in sd.values())
    assert got == want, (len(got), len(want))

    # Round trip back to torch layout reproduces the original tensors.
    back = convert.state_dict_from_variables(variables)
    assert set(back) == set(sd)
    for k, v in sd.items():
        np.testing.assert_allclose(back[k], v.numpy(), rtol=0, atol=0,
                                   err_msg=k)
