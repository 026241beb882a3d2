"""Torch-checkpoint -> flax variables converter (and back).

Converts the reference's released Lightning checkpoints (e.g. 420_601.ckpt,
Readme.md:107) into this framework's parameter pytree for weight-parity
evaluation. Handles the reference's three key layouts:

  * SPS full module: ``model.MinkUNet.<layer>`` (predict.py:56-58)
  * SPS node remap:  same, stripped to ``<layer>`` (util.py:29-46)
  * MOS4D / MapMOS: ``model.MinkUNet.*`` / ``mos.MinkUNet.*``
    (mos4d_node.py:65-69, mapmos_node.py:48-53)

Layout differences handled:
  * ME stores conv kernels as (K_total, Cin, Cout) with kernel offsets
    enumerated dimension-0-fastest (x fastest, t slowest) over the
    hypercube; we store (K_space, K_time, Cin, Cout) with x-SLOWEST
    spatial order (sps_tpu.ops.topology.kernel_offsets). The permutation
    is computed, not assumed, from both enumerations. ME's x-fastest
    order is pinned by a torch/ME-free oracle (tests/test_me_order.py):
    an independent transcription of ME's RegionIterator (region.hpp
    carry iteration, dim 0 fastest) plus a semantic closure through the
    brute-force 4D conv; me_x_fastest=False remains as an escape hatch
    but is asserted NOT to be ME's order.
  * 1x1 convs: ME stores (Cin, Cout); ours (1, 1, Cin, Cout).
  * MinkowskiBatchNorm: bn.{weight,bias,running_mean,running_var} ->
    {scale,bias} params + {mean,var} batch_stats.
  * BasicBlock downsample Sequential: downsample.0 (conv), downsample.1
    (bn) -> downsample_conv / downsample_norm.
"""

from __future__ import annotations

import itertools

import numpy as np

from sps_tpu.ops.topology import kernel_offsets


def _me_offsets(size: int, dims: int) -> np.ndarray:
    """ME hypercube offsets, dimension-0-fastest. Odd sizes centered,
    size 2 uses {0, 1} (ME convention for even kernels)."""
    if size % 2 == 1:
        r = size // 2
        rng = range(-r, r + 1)
    else:
        rng = range(0, size)
    # dim 0 fastest == reversed product order.
    offs = [tuple(reversed(t)) for t in itertools.product(*([list(rng)] * dims))]
    # product with last dim fastest; reversing each tuple then keeping
    # enumeration order makes dim 0 fastest.
    return np.asarray(offs, np.int32)


def _perm_spatial(size: int, me_x_fastest: bool = True) -> np.ndarray:
    """perm[k_ours] = k_me for a purely spatial kernel (time kernel 1)."""
    ours = kernel_offsets(size) if size % 2 == 1 else np.asarray(
        list(itertools.product((0, 1), repeat=3)), np.int32
    )
    me = _me_offsets(size, 3)
    if not me_x_fastest:
        me = ours
    lut = {tuple(o): i for i, o in enumerate(me)}
    return np.asarray([lut[tuple(o)] for o in ours], np.int64)


def _split_4d(w: np.ndarray, size: int, kt: int, me_x_fastest: bool = True) -> np.ndarray:
    """ME (K_total, Cin, Cout) 4D kernel -> ours (K_space, K_time, Cin, Cout)."""
    k_total = w.shape[0]
    assert k_total == size**3 * kt, (w.shape, size, kt)
    ours_sp = kernel_offsets(size)
    rt = kt // 2
    me = _me_offsets_4d(size, kt, me_x_fastest)
    lut = {tuple(o): i for i, o in enumerate(me)}
    out = np.zeros((size**3, kt, w.shape[1], w.shape[2]), w.dtype)
    for ks, (dx, dy, dz) in enumerate(ours_sp):
        for dt in range(-rt, rt + 1):
            out[ks, dt + rt] = w[lut[(dx, dy, dz, dt)]]
    return out


def _me_offsets_4d(size: int, kt: int, me_x_fastest: bool = True) -> np.ndarray:
    rs = size // 2
    rng_s = list(range(-rs, rs + 1)) if size % 2 == 1 else list(range(size))
    rt = kt // 2
    rng_t = list(range(-rt, rt + 1)) if kt % 2 == 1 else list(range(kt))
    if me_x_fastest:
        offs = [
            (x, y, z, t)
            for t in rng_t
            for z in rng_s
            for y in rng_s
            for x in rng_s
        ]
    else:
        offs = [
            (x, y, z, t)
            for x in rng_s
            for y in rng_s
            for z in rng_s
            for t in rng_t
        ]
    return np.asarray(offs, np.int32)


def _conv(sd, prefix, size, kt, me_x_fastest=True):
    w = np.asarray(sd[prefix + ".kernel"])
    if w.ndim == 2:  # 1x1 kernel
        out = {"kernel": w[None, None]}
    elif kt == 1:
        perm = _perm_spatial(size, me_x_fastest)
        out = {"kernel": w[perm][:, None]}
    else:
        out = {"kernel": _split_4d(w, size, kt, me_x_fastest)}
    if prefix + ".bias" in sd:
        b = np.asarray(sd[prefix + ".bias"]).reshape(-1)
        out["bias"] = b
    return out


def _bn(sd, prefix):
    params = {
        "scale": np.asarray(sd[prefix + ".bn.weight"]),
        "bias": np.asarray(sd[prefix + ".bn.bias"]),
    }
    stats = {
        "mean": np.asarray(sd[prefix + ".bn.running_mean"]),
        "var": np.asarray(sd[prefix + ".bn.running_var"]),
    }
    return params, stats


def variables_from_state_dict(
    sd: dict,
    *,
    layers=(1,) * 8,
    first_kernel: int = 5,
    block_kernel: int = 3,
    strip_prefix: str = "model.MinkUNet.",
    me_x_fastest: bool = True,
    model_scope: str = "MinkUNet",
) -> dict:
    """Build {'params': ..., 'batch_stats': ...} from a torch state dict
    (tensors or numpy arrays; torch not required if already numpy)."""
    sd = {
        (k[len(strip_prefix):] if strip_prefix and k.startswith(strip_prefix) else k): (
            v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        )
        for k, v in sd.items()
    }
    sd = {k: v for k, v in sd.items() if "num_batches_tracked" not in k}

    params: dict = {}
    stats: dict = {}

    def put_conv(name, size, kt, src=None):
        params[name] = _conv(sd, src or name, size, kt, me_x_fastest)

    def put_bn(name, src=None):
        p, s = _bn(sd, src or name)
        params[name] = p
        stats[name] = s

    put_conv("conv0p1s1", first_kernel, 1)
    put_bn("bn0")
    for i in (1, 2, 3, 4):
        put_conv(f"conv{i}p{2**(i-1)}s2", 2, 1)
        put_bn(f"bn{i}")
    for i in (4, 5, 6, 7):
        put_conv(f"convtr{i}p{2**(8-i)}s2", 2, 1)
        put_bn(f"bntr{i}")

    for bi in range(1, 9):
        for li in range(layers[bi - 1]):
            src = f"block{bi}.{li}"
            dst = f"block{bi}_{li}"
            blk_p: dict = {}
            blk_s: dict = {}
            blk_p["conv1"] = _conv(sd, f"{src}.conv1", block_kernel, block_kernel, me_x_fastest)
            blk_p["conv2"] = _conv(sd, f"{src}.conv2", block_kernel, block_kernel, me_x_fastest)
            p, s = _bn(sd, f"{src}.norm1")
            blk_p["norm1"], blk_s["norm1"] = p, s
            p, s = _bn(sd, f"{src}.norm2")
            blk_p["norm2"], blk_s["norm2"] = p, s
            if f"{src}.downsample.0.kernel" in sd:
                blk_p["downsample_conv"] = _conv(sd, f"{src}.downsample.0", 1, 1, me_x_fastest)
                p, s = _bn(sd, f"{src}.downsample.1")
                blk_p["downsample_norm"], blk_s["downsample_norm"] = p, s
            params[dst] = blk_p
            stats[dst] = blk_s

    params["final"] = _conv(sd, "final", 1, 1, me_x_fastest)

    import jax.numpy as jnp

    tree = lambda d: {k: tree(v) if isinstance(v, dict) else jnp.asarray(v) for k, v in d.items()}
    return {
        "params": {model_scope: tree(params)},
        "batch_stats": {model_scope: tree(stats)},
    }


def torch_ckpt_to_variables(path: str, sps_cfg, me_x_fastest: bool = True) -> dict:
    """Load a reference .ckpt file (Lightning, torch) and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    sd = {k: v for k, v in sd.items() if "MOSLoss" not in k}
    u = sps_cfg.unet
    return variables_from_state_dict(
        sd,
        layers=u.layers,
        first_kernel=u.first_kernel,
        block_kernel=u.block_kernel,
        me_x_fastest=me_x_fastest,
    )


def state_dict_from_variables(variables, *, layers=(1,) * 8,
                              first_kernel: int = 5, block_kernel: int = 3,
                              prefix: str = "model.MinkUNet.",
                              me_x_fastest: bool = True,
                              model_scope: str = "MinkUNet") -> dict:
    """Inverse mapping (flax -> torch layout), for round-trip testing and
    for exporting trained weights to reference-format checkpoints."""
    p = variables["params"][model_scope]
    s = variables["batch_stats"][model_scope]
    sd: dict = {}

    def put_conv(dst, node, size, kt):
        w = np.asarray(node["kernel"])
        if w.shape[0] == 1 and w.shape[1] == 1:
            sd[dst + ".kernel"] = w[0, 0]
        elif kt == 1:
            perm = _perm_spatial(size, me_x_fastest)
            inv = np.argsort(perm)
            sd[dst + ".kernel"] = w[:, 0][inv]
        else:
            me = _me_offsets_4d(size, kt, me_x_fastest)
            ours_sp = kernel_offsets(size)
            lut = {tuple(o): i for i, o in enumerate(ours_sp)}
            rt = kt // 2
            out = np.zeros((len(me),) + w.shape[2:], w.dtype)
            for i, (dx, dy, dz, dt) in enumerate(me):
                out[i] = w[lut[(dx, dy, dz)], dt + rt]
            sd[dst + ".kernel"] = out
        if "bias" in node:
            sd[dst + ".bias"] = np.asarray(node["bias"])

    def put_bn(dst, pnode, snode):
        sd[dst + ".bn.weight"] = np.asarray(pnode["scale"])
        sd[dst + ".bn.bias"] = np.asarray(pnode["bias"])
        sd[dst + ".bn.running_mean"] = np.asarray(snode["mean"])
        sd[dst + ".bn.running_var"] = np.asarray(snode["var"])

    put_conv("conv0p1s1", p["conv0p1s1"], first_kernel, 1)
    put_bn("bn0", p["bn0"], s["bn0"])
    for i in (1, 2, 3, 4):
        put_conv(f"conv{i}p{2**(i-1)}s2", p[f"conv{i}p{2**(i-1)}s2"], 2, 1)
        put_bn(f"bn{i}", p[f"bn{i}"], s[f"bn{i}"])
    for i in (4, 5, 6, 7):
        put_conv(f"convtr{i}p{2**(8-i)}s2", p[f"convtr{i}p{2**(8-i)}s2"], 2, 1)
        put_bn(f"bntr{i}", p[f"bntr{i}"], s[f"bntr{i}"])
    for bi in range(1, 9):
        for li in range(layers[bi - 1]):
            src = f"block{bi}_{li}"
            dst = f"block{bi}.{li}"
            put_conv(f"{dst}.conv1", p[src]["conv1"], block_kernel, block_kernel)
            put_conv(f"{dst}.conv2", p[src]["conv2"], block_kernel, block_kernel)
            put_bn(f"{dst}.norm1", p[src]["norm1"], s[src]["norm1"])
            put_bn(f"{dst}.norm2", p[src]["norm2"], s[src]["norm2"])
            if "downsample_conv" in p[src]:
                put_conv(f"{dst}.downsample.0", p[src]["downsample_conv"], 1, 1)
                put_bn(f"{dst}.downsample.1", p[src]["downsample_norm"], s[src]["downsample_norm"])
    put_conv("final", p["final"], 1, 1)
    return {prefix + k: v for k, v in sd.items()}
