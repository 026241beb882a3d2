#!/usr/bin/env python3
"""Generate the torch golden-checkpoint fixture for the converter.

MinkowskiEngine cannot run here (CUDA-only build), so the converter's
handling of REAL torch checkpoints is pinned by a fabricated-but-faithful
Lightning checkpoint: every key name and tensor shape below is transcribed
directly from the reference's module tree (NOT derived from our own
exporter), torch.save'd in the exact on-disk format the reference ships
(`{"state_dict": {...}, "hyper_parameters": {...}}`, key prefix
`model.MinkUNet.` — /root/reference/scripts/predict.py:56-58,
src/sps/datasets/util.py:29-46):

  * MinkowskiConvolution kernel_size=(k,k,k,kt): kernel (k^3*kt, Cin, Cout)
  * kernel_size=1: kernel (Cin, Cout); `final` adds bias (Cout,)
  * MinkowskiBatchNorm `<n>.bn.{weight,bias,running_mean,running_var,
    num_batches_tracked}`
  * BasicBlock downsample Sequential: `downsample.0.kernel`,
    `downsample.1.bn.*` when inplanes != planes
    (ME resnet_block.BasicBlock; declared at reference minkunet.py:29)

Topology: the tiny MinkUNet14 variant used across tests (init_dim=4,
PLANES=(4,8,8,8,8,8,8,4)) — same wiring as the reference's CustomMinkUNet
(customminkunet.py:10-12), smaller widths.

Writes tests/fixtures/me_golden.ckpt plus me_golden_expected.npz (a seeded
point batch and the per-point scores of the converted model, gather
engine). Regenerate only when the fixture format itself changes; the test
(tests/test_torch_golden.py) is a regression pin on the converter.

Run on CPU: env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/make_torch_golden.py
"""

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

import numpy as np

D0 = 4
PL = (4, 8, 8, 8, 8, 8, 8, 4)
IN_CH, OUT_CH = 1, 1


def me_state_dict_spec():
    """[(key, shape)] for the tiny CustomMinkUNet, transcribed from the
    reference topology (minkunet.py:52-159). Bias only on `final`."""
    spec = []

    def conv(name, k_total, cin, cout):
        spec.append((f"{name}.kernel", (k_total, cin, cout) if k_total > 1 else (cin, cout)))

    def bn(name, c):
        for suffix, shape in (
            ("bn.weight", (c,)), ("bn.bias", (c,)),
            ("bn.running_mean", (c,)), ("bn.running_var", (c,)),
            ("bn.num_batches_tracked", ()),
        ):
            spec.append((f"{name}.{suffix}", shape))

    def block(name, cin, planes):
        conv(f"{name}.conv1", 81, cin, planes)   # (3,3,3,3) -> 81 offsets
        bn(f"{name}.norm1", planes)
        conv(f"{name}.conv2", 81, planes, planes)
        bn(f"{name}.norm2", planes)
        if cin != planes:
            conv(f"{name}.downsample.0", 1, cin, planes)
            bn(f"{name}.downsample.1", planes)

    conv("conv0p1s1", 125, IN_CH, D0)            # (5,5,5,1)
    bn("bn0", D0)
    conv("conv1p1s2", 8, D0, D0)                 # (2,2,2,1) stride 2
    bn("bn1", D0)
    block("block1.0", D0, PL[0])
    conv("conv2p2s2", 8, PL[0], PL[0])
    bn("bn2", PL[0])
    block("block2.0", PL[0], PL[1])
    conv("conv3p4s2", 8, PL[1], PL[1])
    bn("bn3", PL[1])
    block("block3.0", PL[1], PL[2])
    conv("conv4p8s2", 8, PL[2], PL[2])
    bn("bn4", PL[2])
    block("block4.0", PL[2], PL[3])
    conv("convtr4p16s2", 8, PL[3], PL[4])
    bn("bntr4", PL[4])
    block("block5.0", PL[4] + PL[2], PL[4])
    conv("convtr5p8s2", 8, PL[4], PL[5])
    bn("bntr5", PL[5])
    block("block6.0", PL[5] + PL[1], PL[5])
    conv("convtr6p4s2", 8, PL[5], PL[6])
    bn("bntr6", PL[6])
    block("block7.0", PL[6] + PL[0], PL[6])
    conv("convtr7p2s2", 8, PL[6], PL[7])
    bn("bntr7", PL[7])
    block("block8.0", PL[7] + D0, PL[7])
    conv("final", 1, PL[7], OUT_CH)
    spec.append(("final.bias", (OUT_CH,)))
    return spec


def main():
    import torch

    rng = np.random.default_rng(42)
    sd = {}
    for key, shape in me_state_dict_spec():
        if key.endswith("num_batches_tracked"):
            sd[f"model.MinkUNet.{key}"] = torch.tensor(100, dtype=torch.int64)
            continue
        if "running_var" in key:
            arr = rng.uniform(0.5, 1.5, shape)
        elif "running_mean" in key:
            arr = rng.normal(0.0, 0.3, shape)
        else:
            arr = rng.normal(0.0, 0.4, shape)
        sd[f"model.MinkUNet.{key}"] = torch.from_numpy(
            arr.astype(np.float32))

    ckpt = {
        "state_dict": sd,
        "hyper_parameters": {"hparams": {"MODEL": {"VOXEL_SIZE": 0.25}}},
        "epoch": 1,
        "global_step": 100,
    }
    fdir = os.path.join(_HERE, "tests", "fixtures")
    os.makedirs(fdir, exist_ok=True)
    path = os.path.join(fdir, "me_golden.ckpt")
    torch.save(ckpt, path)
    print(f"wrote {path} ({os.path.getsize(path)/1024:.0f} KiB, {len(sd)} keys)")

    # Expected outputs: converted model forward (gather engine, CPU).
    import jax

    from sps_tpu import convert
    from sps_tpu.models.minkunet import MinkUNetConfig
    from sps_tpu.models.spsnet import SPSConfig, SPSModel
    from sps_tpu.structs import Capacities, pad_point_batch

    caps = Capacities(points=2048, voxels=(1024, 512, 512, 256, 128),
                     bricks=(1024, 512, 256, 256, 256))
    cfg = SPSConfig(
        voxel_size=0.25, caps=caps,
        unet=MinkUNetConfig(in_channels=IN_CH, out_channels=OUT_CH,
                            init_dim=D0, planes=PL, num_time=2),
        engine="gather",
    )
    variables = convert.torch_ckpt_to_variables(path, cfg)
    prng = np.random.default_rng(7)
    n = 400
    xyz = prng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    batch = prng.integers(0, 2, size=n)
    t = prng.integers(0, 2, size=n)
    label = prng.uniform(0, 1, size=n).astype(np.float32)
    pb = pad_point_batch(xyz, batch, t, label, caps.points)
    model = SPSModel(cfg)
    scores, aux = jax.jit(lambda v, b: model.apply(v, b))(variables, pb)
    assert not bool(np.asarray(aux["overflow"]).any())
    out = os.path.join(fdir, "me_golden_expected.npz")
    np.savez(out, xyz=xyz, batch=batch, t=t, label=label,
             scores=np.asarray(scores))
    print(f"wrote {out}; score range "
          f"[{float(np.min(np.asarray(scores))):.4f}, "
          f"{float(np.max(np.asarray(scores))):.4f}]")


if __name__ == "__main__":
    main()
