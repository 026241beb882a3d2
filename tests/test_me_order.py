"""Torch/ME-free oracle pinning the ME kernel-offset enumeration order.

The converter (sps_tpu/convert.py) must place ME's flat (K_total, Cin,
Cout) kernels into our (K_space, K_time, Cin, Cout) layout; getting the
offset ORDER wrong silently scrambles every converted checkpoint. ME is
not installable here, so the order is pinned two independent ways:

1. `me_region_iterator` below transcribes MinkowskiEngine's documented
   kernel-region iteration (cpu/gpu `RegionIterator::operator++` in ME's
   region.hpp: increment coordinate 0 by its dilation; on overflow reset
   to the lower bound and carry into the next coordinate — i.e.
   dimension 0 / x varies FASTEST, time slowest; bounds
   lb = -((k-1)//2), ub = lb + k - 1, which yields {0, 1} for even
   kernels). The reference model consumes exactly this enumeration via
   MinkowskiConvolution (reference
   src/sps/models/MinkowskiEngine/minkunet.py:55-158).
2. A semantic closure: a random ME-layout kernel applied per ME
   semantics (out[u] = sum_i f[u + off_i] @ W_me[i] with the oracle's
   offsets) must equal our brute-force conv (tests/sparse_ref.py, our
   x-slowest order) run on the CONVERTED kernel. A wrong permutation
   scrambles slots and the outputs diverge (asserted below).
"""

import itertools

import numpy as np
import pytest

from sps_tpu import convert
from sps_tpu.ops.topology import kernel_offsets
from tests import sparse_ref


def me_region_iterator(kernel_sizes):
    """Independent transcription of ME's hypercube RegionIterator.

    Yields offset tuples in ME enumeration order: start at the lower
    bound, and on each ++ increment dim 0 first, carrying into higher
    dims (dim 0 fastest). lb = -((k-1)//2) covers ME's odd (centered)
    and even ({0..k-1}) kernel conventions with one formula.
    """
    lb = [-((k - 1) // 2) for k in kernel_sizes]
    ub = [l + k - 1 for l, k in zip(lb, kernel_sizes)]
    point = list(lb)
    while True:
        yield tuple(point)
        d = 0
        while d < len(point):
            point[d] += 1
            if point[d] <= ub[d]:
                break
            point[d] = lb[d]
            d += 1
        if d == len(point):
            return


@pytest.mark.parametrize("size,kt", [(5, 1), (3, 3), (2, 1), (3, 1)])
def test_me_offsets_match_region_iterator(size, kt):
    oracle = np.asarray(list(me_region_iterator((size,) * 3 + (kt,))), np.int32)
    ours = convert._me_offsets_4d(size, kt, me_x_fastest=True)
    np.testing.assert_array_equal(ours, oracle)


def test_flipped_order_disagrees_with_oracle():
    """me_x_fastest=False is NOT ME's order (guards the flag's meaning)."""
    oracle = np.asarray(list(me_region_iterator((3, 3, 3, 3))), np.int32)
    flipped = convert._me_offsets_4d(3, 3, me_x_fastest=False)
    assert (flipped != oracle).any()


def test_spatial_perm_against_oracle():
    """_perm_spatial maps our slot k to the ME flat index of the same
    offset, per the independent iterator."""
    for size in (5, 3):
        ours = kernel_offsets(size)
        me = list(me_region_iterator((size,) * 3))
        perm = convert._perm_spatial(size, me_x_fastest=True)
        for k_ours, off in enumerate(ours):
            assert me[perm[k_ours]] == tuple(off)


def _random_sparse(rng, n, cin, spread=4, nt=2):
    feats = {}
    while len(feats) < n:
        u = (0, *rng.integers(-spread, spread + 1, 3), int(rng.integers(0, nt)))
        feats[tuple(int(c) for c in u)] = rng.standard_normal(cin).astype(np.float64)
    return feats


@pytest.mark.parametrize("size,kt", [(3, 3), (5, 1)])
def test_converted_kernel_semantic_closure(size, kt):
    """ME-semantics conv with the flat ME kernel == our-order brute-force
    conv with the CONVERTED kernel, on an asymmetric random sparse set."""
    rng = np.random.default_rng(0)
    cin, cout = 3, 2
    k_total = size**3 * kt
    w_me = rng.standard_normal((k_total, cin, cout))
    feats = _random_sparse(rng, 40, cin, nt=max(kt, 2))

    # ME semantics, straight from the oracle iterator.
    me_offs = list(me_region_iterator((size,) * 3 + (kt,)))
    ref = {}
    for u in feats:
        acc = np.zeros(cout)
        for i, off in enumerate(me_offs):
            v = tuple(np.add(u, (0, *off[:3], off[3])))
            if v in feats:
                acc = acc + feats[v] @ w_me[i]
        ref[u] = acc

    # Converted kernel through our brute-force reference (our order).
    if kt == 1:
        perm = convert._perm_spatial(size, me_x_fastest=True)
        w_ours = w_me[perm][:, None]
    else:
        w_ours = convert._split_4d(w_me, size, kt, me_x_fastest=True)
    got = sparse_ref.conv4d(feats, w_ours, size, kt)
    sparse_ref.dict_allclose(ref, got, rtol=1e-9, atol=1e-9)  # asserts

    # And the WRONG permutation must not pass (the test has teeth).
    if kt == 1:
        perm_bad = convert._perm_spatial(size, me_x_fastest=False)
        w_bad = w_me[perm_bad][:, None]
    else:
        w_bad = convert._split_4d(w_me, size, kt, me_x_fastest=False)
    got_bad = sparse_ref.conv4d(feats, w_bad, size, kt)
    with pytest.raises(AssertionError):
        sparse_ref.dict_allclose(ref, got_bad, rtol=1e-3, atol=1e-3)
