"""Brute-force numpy reference for 4D sparse convolution semantics.

Implements exactly what MinkowskiEngine provides to the reference model
(dict-of-coordinates, no hashing tricks) so the TPU engine can be verified
against an independent implementation:

  out[u] = sum_{off} W[off] . in[u + off]   over existing 4D rows,

with ME's stride rules for (2,2,2,1)-strided conv and transpose conv.
Coordinates are (b, x, y, z, t) tuples; features dict tuple -> (C,) array.
"""

from __future__ import annotations

import itertools

import numpy as np


def conv4d(feats: dict, w: np.ndarray, size: int, kt: int) -> dict:
    """Stride-1 4D conv. w: (size**3, kt, Cin, Cout), x-slowest offset order
    (matching sps_tpu.ops.topology.kernel_offsets)."""
    r, rt = size // 2, kt // 2
    offs3 = list(itertools.product(range(-r, r + 1), repeat=3))
    cout = w.shape[-1]
    out = {}
    for u in feats:
        acc = np.zeros(cout, w.dtype)
        b, x, y, z, t = u
        for ki, (dx, dy, dz) in enumerate(offs3):
            for dt in range(-rt, rt + 1):
                v = (b, x + dx, y + dy, z + dz, t + dt)
                if v in feats:
                    acc = acc + feats[v] @ w[ki, dt + rt]
        out[u] = acc
    return out


def conv4d_down(feats: dict, w: np.ndarray) -> dict:
    """Kernel (2,2,2,1) stride (2,2,2,1). Output coords: unique floor-div-2
    spatial coords (per batch, per t). w: (8, Cin, Cout) in DOWN_OFFSETS
    (x-slowest (0,1)^3) order."""
    offs = list(itertools.product((0, 1), repeat=3))
    cout = w.shape[-1]
    outcoords = {(b, x >> 1, y >> 1, z >> 1, t) for (b, x, y, z, t) in feats}
    out = {}
    for u in outcoords:
        b, cx, cy, cz, t = u
        acc = np.zeros(cout, w.dtype)
        for ki, (dx, dy, dz) in enumerate(offs):
            v = (b, 2 * cx + dx, 2 * cy + dy, 2 * cz + dz, t)
            if v in feats:
                acc = acc + feats[v] @ w[ki]
        out[u] = acc
    return out


def conv4d_up(feats: dict, out_coords: set, w: np.ndarray) -> dict:
    """Transpose conv kernel (2,2,2,1) stride (2,2,2,1): out coords given
    (the finer level's set, in fine units); each fine u pulls from coarse
    floor(u/2) with the parity-selected weight."""
    offs = list(itertools.product((0, 1), repeat=3))
    cout = w.shape[-1]
    out = {}
    for u in out_coords:
        b, x, y, z, t = u
        c = (b, x >> 1, y >> 1, z >> 1, t)
        ki = offs.index((x & 1, y & 1, z & 1))
        acc = np.zeros(cout, w.dtype)
        if c in feats:
            acc = feats[c] @ w[ki]
        out[u] = acc
    return out


def batchnorm4d(feats: dict, gamma, beta, eps=1e-5, mean=None, var=None) -> dict:
    """Per-channel BN over all existing rows (ME MinkowskiBatchNorm)."""
    xs = np.stack(list(feats.values()))
    if mean is None:
        mean = xs.mean(axis=0)
        var = xs.var(axis=0)
    return {
        k: gamma * (v - mean) / np.sqrt(var + eps) + beta for k, v in feats.items()
    }


def relu4d(feats: dict) -> dict:
    return {k: np.maximum(v, 0) for k, v in feats.items()}


def cat4d(a: dict, b: dict) -> dict:
    assert set(a) == set(b)
    return {k: np.concatenate([a[k], b[k]]) for k in a}


def add4d(a: dict, b: dict) -> dict:
    assert set(a) == set(b)
    return {k: a[k] + b[k] for k in a}


def grid_to_dict(coords, occ, feats, num_voxels):
    """Convert the TPU packed representation to the dict form.

    coords (V,4) [b,xyz]; occ (V,T); feats (V, T*C) -> dict of 5-tuples.
    """
    v, t = occ.shape
    c = feats.shape[1] // t
    x = feats.reshape(v, t, c)
    out = {}
    for i in range(int(num_voxels)):
        for tt in range(t):
            if occ[i, tt] > 0:
                b, xx, yy, zz = (int(q) for q in coords[i])
                out[(b, xx, yy, zz, tt)] = np.asarray(x[i, tt])
    return out


def dict_allclose(a: dict, b: dict, rtol=1e-4, atol=1e-4):
    assert set(a) == set(b), (
        f"coordinate sets differ: {len(a)} vs {len(b)}; "
        f"only-a={list(set(a) - set(b))[:5]} only-b={list(set(b) - set(a))[:5]}"
    )
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=rtol, atol=atol, err_msg=str(k))
