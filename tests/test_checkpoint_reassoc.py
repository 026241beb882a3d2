"""Path-based leaf reassociation in the sharding-mismatch restore
fallback (utils/checkpoint._reassociate, ADVICE r4): restored dict trees
must bind into a template by KEY PATH, not position, and structure drift
must error instead of silently mis-assigning parameters."""

import collections

import numpy as np
import pytest

from sps_tpu.utils.checkpoint import _norm_path, _reassociate


def test_reassociate_by_path_reorders():
    # Same leaf count, different dict iteration order: positional binding
    # would swap a/b; path binding must not.
    out = {"b": np.full((2,), 2.0), "a": np.full((3,), 1.0)}
    template = {"a": np.zeros((3,)), "b": np.zeros((2,))}
    r = _reassociate(out, template, "p")
    assert r["a"].shape == (3,) and float(r["a"][0]) == 1.0
    assert r["b"].shape == (2,) and float(r["b"][0]) == 2.0


def test_reassociate_namedtuple_template_by_field_name():
    # Orbax serializes NamedTuples as dicts keyed by field name; the
    # normalized path must align them with the NamedTuple template.
    NT = collections.namedtuple("NT", ["mu", "nu"])
    out = {"opt": {"nu": np.full((1,), 9.0), "mu": np.full((4,), 7.0)}}
    template = {"opt": NT(mu=np.zeros((4,)), nu=np.zeros((1,)))}
    r = _reassociate(out, template, "p")
    assert isinstance(r["opt"], NT)
    assert float(r["opt"].mu[0]) == 7.0 and float(r["opt"].nu[0]) == 9.0


def test_reassociate_missing_key_shape_drift_errors():
    # Key structure drift + shape mismatch: the positional fallback must
    # raise, not silently bind wrong leaves.
    out = {"x": np.zeros((3,)), "z": np.zeros((2,))}
    template = {"x": np.zeros((2,)), "y": np.zeros((3,))}
    with pytest.raises(ValueError, match="shape"):
        _reassociate(out, template, "p")


def test_reassociate_positional_fallback_same_shapes_ok():
    # When paths cannot align but every leaf shape agrees positionally,
    # the legacy positional binding still works (old-layout tolerance).
    out = {"0": np.full((2,), 1.0), "1": np.full((2,), 2.0)}
    template = (np.zeros((2,)), np.zeros((2,)))
    r = _reassociate(out, template, "p")
    assert isinstance(r, tuple) and len(r) == 2


def test_norm_path_dict_and_tuple():
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path({"a": (1, 2)})
    names = sorted(_norm_path(p) for p, _ in flat)
    assert names == ["a/0", "a/1"]
