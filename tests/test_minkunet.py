"""Full-network parity: flax MinkUNet vs. numpy dict-based 4D reference.

Composes the brute-force ops in tests/sparse_ref.py into the reference's
MinkUNet14 topology (minkunet.py:161-219) with the *same weights* as the
flax model, and checks per-(voxel, t) agreement end to end — including the
SPSModel point->score path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from sps_tpu.models.minkunet import MinkUNetConfig
from sps_tpu.models.spsnet import SPSConfig, SPSModel, build_pyramid
from sps_tpu.structs import Capacities, pad_point_batch
from sps_tpu.ops import voxelize as vox
from tests import sparse_ref as ref

T = 2
CAPS = Capacities(
    points=2048,
    voxels=(1024, 512, 512, 256, 128),
    bricks=(1024, 512, 256, 256, 256),
)
CFG = SPSConfig(
    voxel_size=0.25,
    caps=CAPS,
    unet=MinkUNetConfig(
        in_channels=1,
        out_channels=1,
        init_dim=4,
        planes=(4, 8, 8, 8, 8, 8, 8, 4),
        num_time=T,
    ),
    engine="gather",
)


def _np(x):
    return np.asarray(x)


def _bn_ref(d, p, bs):
    return ref.batchnorm4d(
        d, _np(p["scale"]), _np(p["bias"]), mean=_np(bs["mean"]), var=_np(bs["var"])
    )


def _conv_ref(d, p, size, kt):
    return ref.conv4d(d, _np(p["kernel"]), size, kt)


def _block_ref(d, p, bs, cin, planes):
    out = _conv_ref(d, p["conv1"], 3, 3)
    out = _bn_ref(out, p["norm1"], bs["norm1"])
    out = ref.relu4d(out)
    out = _conv_ref(out, p["conv2"], 3, 3)
    out = _bn_ref(out, p["norm2"], bs["norm2"])
    if cin != planes:
        res = {k: v @ _np(p["downsample_conv"]["kernel"])[0, 0] for k, v in d.items()}
        res = _bn_ref(res, p["downsample_norm"], bs["downsample_norm"])
    else:
        res = d
    return ref.relu4d(ref.add4d(out, res))


def ref_forward(variables, d_in, cfg):
    p = variables["params"]["MinkUNet"]
    bs = variables["batch_stats"]["MinkUNet"]
    u = cfg.unet
    pl = u.planes
    d0i = u.init_dim

    def down_ref(d, name, bnname):
        out = ref.conv4d_down(d, _np(p[name]["kernel"])[:, 0])
        out = _bn_ref(out, p[bnname], bs[bnname])
        return ref.relu4d(out)

    def up_ref(d, name, bnname, out_coords):
        out = ref.conv4d_up(d, out_coords, _np(p[name]["kernel"])[:, 0])
        out = _bn_ref(out, p[bnname], bs[bnname])
        return ref.relu4d(out)

    x = _conv_ref(d_in, p["conv0p1s1"], u.first_kernel, 1)
    x = _bn_ref(x, p["bn0"], bs["bn0"])
    out_p1 = ref.relu4d(x)

    x = down_ref(out_p1, "conv1p1s2", "bn1")
    x = _block_ref(x, p["block1_0"], bs["block1_0"], d0i, pl[0])
    out_b1 = x
    x = down_ref(x, "conv2p2s2", "bn2")
    x = _block_ref(x, p["block2_0"], bs["block2_0"], pl[0], pl[1])
    out_b2 = x
    x = down_ref(x, "conv3p4s2", "bn3")
    x = _block_ref(x, p["block3_0"], bs["block3_0"], pl[1], pl[2])
    out_b3 = x
    x = down_ref(x, "conv4p8s2", "bn4")
    x = _block_ref(x, p["block4_0"], bs["block4_0"], pl[2], pl[3])

    x = up_ref(x, "convtr4p16s2", "bntr4", set(out_b3.keys()))
    x = ref.cat4d(x, out_b3)
    x = _block_ref(x, p["block5_0"], bs["block5_0"], pl[4] + pl[2], pl[4])
    x = up_ref(x, "convtr5p8s2", "bntr5", set(out_b2.keys()))
    x = ref.cat4d(x, out_b2)
    x = _block_ref(x, p["block6_0"], bs["block6_0"], pl[5] + pl[1], pl[5])
    x = up_ref(x, "convtr6p4s2", "bntr6", set(out_b1.keys()))
    x = ref.cat4d(x, out_b1)
    x = _block_ref(x, p["block7_0"], bs["block7_0"], pl[6] + pl[0], pl[6])
    x = up_ref(x, "convtr7p2s2", "bntr7", set(out_p1.keys()))
    x = ref.cat4d(x, out_p1)
    x = _block_ref(x, p["block8_0"], bs["block8_0"], pl[7] + d0i, pl[7])

    wf = _np(p["final"]["kernel"])[0, 0]
    bf = _np(p["final"]["bias"])
    return {k: v @ wf + bf for k, v in x.items()}


def _batch(rng, n=400):
    xyz = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    batch = rng.integers(0, 2, size=n)
    t = rng.integers(0, T, size=n)
    label = rng.uniform(0, 1, size=n).astype(np.float32)
    return pad_point_batch(xyz, batch, t, label, CAPS.points)


def test_spsmodel_matches_dense_reference():
    rng = np.random.default_rng(0)
    pb = _batch(rng)
    model = SPSModel(CFG)
    variables = model.init(jax.random.PRNGKey(0), pb)
    # Randomize running BN stats so eval-mode normalization is exercised.
    variables = jax.tree.map(lambda x: x, variables)
    import flax

    flat = flax.traverse_util.flatten_dict(variables["batch_stats"])
    k = jax.random.PRNGKey(1)
    newbs = {}
    for key, val in flat.items():
        k, sk = jax.random.split(k)
        if key[-1] == "mean":
            newbs[key] = 0.3 * jax.random.normal(sk, val.shape)
        else:
            newbs[key] = 0.5 + jax.random.uniform(sk, val.shape)
    variables = dict(variables, batch_stats=flax.traverse_util.unflatten_dict(newbs))

    scores, aux = jax.jit(lambda v, b: model.apply(v, b))(variables, pb)
    assert not bool(np.asarray(aux["overflow"]).any())

    # Build the reference input dict (constant 0.5 feature).
    levels, p2v, _ = build_pyramid(pb, CFG)
    grid = levels[0].grid
    feats0 = 0.5 * np.repeat(_np(grid.occ), CFG.unet.in_channels, axis=-1)
    d_in = ref.grid_to_dict(_np(grid.coords), _np(grid.occ), feats0, grid.num_voxels)

    d_out = ref_forward(variables, d_in, CFG)

    # Compare per-point devoxelized scores.
    coords = _np(vox.quantize(pb.xyz, CFG.voxel_size))
    want = np.zeros(len(coords))
    valid = _np(pb.valid)
    for i in range(len(coords)):
        if valid[i]:
            key = (int(pb.batch[i]), *coords[i], int(pb.t[i]))
            want[i] = 1.0 / (1.0 + np.exp(-d_out[key][0]))
    got = _np(scores)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_brick_engine_matches_gather_engine():
    """The two backends must produce identical per-point scores from the
    same parameters (trees are identical by construction)."""
    import dataclasses

    rng = np.random.default_rng(7)
    pb = _batch(rng, 500)
    cfg_b = dataclasses.replace(CFG, engine="brick")
    model_g = SPSModel(CFG)
    model_b = SPSModel(cfg_b)
    variables = model_g.init(jax.random.PRNGKey(0), pb)
    sg, auxg = jax.jit(lambda v, b: model_g.apply(v, b))(variables, pb)
    sb, auxb = jax.jit(lambda v, b: model_b.apply(v, b))(variables, pb)
    assert not bool(np.asarray(auxg["overflow"]).any())
    assert not bool(np.asarray(auxb["overflow"]).any())
    np.testing.assert_allclose(np.asarray(sb), np.asarray(sg), rtol=2e-3, atol=2e-4)


def test_brick_side8_matches_gather_engine():
    """Brick side is a pure layout choice: bs=8 must score identically."""
    import dataclasses

    rng = np.random.default_rng(11)
    pb = _batch(rng, 500)
    cfg_b = dataclasses.replace(CFG, engine="brick", brick_side=8)
    model_g = SPSModel(CFG)
    model_b = SPSModel(cfg_b)
    variables = model_g.init(jax.random.PRNGKey(0), pb)
    sg, _ = jax.jit(lambda v, b: model_g.apply(v, b))(variables, pb)
    sb, auxb = jax.jit(lambda v, b: model_b.apply(v, b))(variables, pb)
    assert not bool(np.asarray(auxb["overflow"]).any())
    np.testing.assert_allclose(np.asarray(sb), np.asarray(sg), rtol=2e-3, atol=2e-4)


def test_atlas_engine_matches_gather_engine():
    """Dense-atlas topology must score identically to the hash engines."""
    import dataclasses

    rng = np.random.default_rng(13)
    pb = _batch(rng, 500)
    for side in (4, 8):
        cfg_a = dataclasses.replace(
            CFG,
            engine="atlas",
            brick_side=side,
            atlas_extent=(2, 32, 32, 32),
        )
        model_g = SPSModel(CFG)
        model_a = SPSModel(cfg_a)
        variables = model_g.init(jax.random.PRNGKey(0), pb)
        sg, _ = jax.jit(lambda v, b: model_g.apply(v, b))(variables, pb)
        sa, auxa = jax.jit(lambda v, b, m=model_a: m.apply(v, b))(variables, pb)
        assert not bool(np.asarray(auxa["overflow"]).any()), f"side={side}"
        np.testing.assert_allclose(
            np.asarray(sa), np.asarray(sg), rtol=2e-3, atol=2e-4
        )


def test_hybrid_row_levels_match_gather_engine():
    """Hybrid pyramid (bricks at fine levels, compact voxel rows at deep
    levels) must score identically to the gather oracle."""
    import dataclasses

    rng = np.random.default_rng(17)
    pb = _batch(rng, 500)
    for row_from in (1, 2, 3):
        cfg_h = dataclasses.replace(
            CFG,
            engine="atlas",
            brick_side=4,
            atlas_extent=(2, 32, 32, 32),
            row_from=row_from,
        )
        model_g = SPSModel(CFG)
        model_h = SPSModel(cfg_h)
        variables = model_g.init(jax.random.PRNGKey(0), pb)
        sg, _ = jax.jit(lambda v, b: model_g.apply(v, b))(variables, pb)
        sh, auxh = jax.jit(lambda v, b, m=model_h: m.apply(v, b))(variables, pb)
        assert not bool(np.asarray(auxh["overflow"]).any()), f"row_from={row_from}"
        np.testing.assert_allclose(
            np.asarray(sh), np.asarray(sg), rtol=2e-3, atol=2e-4,
            err_msg=f"row_from={row_from}",
        )


def test_aliased_row_levels_match_gather_engine():
    """The side-8 aliased deep levels (atlas.alias_row_levels: level-(k+3)
    voxels ARE level-k bricks, so L3/L4 topology is reused verbatim from
    L0/L1 instead of being built) must score identically to the gather
    oracle. This is the flagship streaming configuration."""
    import dataclasses

    rng = np.random.default_rng(29)
    pb = _batch(rng, 500)
    for row_from in (3, 4):
        cfg_h = dataclasses.replace(
            CFG,
            engine="atlas",
            brick_side=8,
            atlas_extent=(2, 24, 24, 24),
            row_from=row_from,
        )
        model_g = SPSModel(CFG)
        model_h = SPSModel(cfg_h)
        variables = model_g.init(jax.random.PRNGKey(0), pb)
        sg, _ = jax.jit(lambda v, b: model_g.apply(v, b))(variables, pb)
        sh, auxh = jax.jit(lambda v, b, m=model_h: m.apply(v, b))(variables, pb)
        assert not bool(np.asarray(auxh["overflow"]).any()), f"row_from={row_from}"
        np.testing.assert_allclose(
            np.asarray(sh), np.asarray(sg), rtol=2e-3, atol=2e-4,
            err_msg=f"aliased row_from={row_from}",
        )

def test_zband_conv_mode_matches_gather_engine():
    """z-folded brick layout (conv_mode="zband") must score identically:
    it is the same convolution, folded so minor dims stay lane-aligned."""
    import dataclasses

    rng = np.random.default_rng(19)
    pb = _batch(rng, 500)
    # (zband_levels=1: fold L0 only, deeper bricks on the halo path;
    #  zband_levels=3: every brick level folded)
    for side, row_from, zl in ((4, 2, 1), (8, 3, 3)):
        cfg_z = dataclasses.replace(
            CFG,
            engine="atlas",
            brick_side=side,
            atlas_extent=(2, 32, 32, 32),
            row_from=row_from,
            unet=dataclasses.replace(
                CFG.unet, conv_mode="zband", zband_levels=zl
            ),
        )
        model_g = SPSModel(CFG)
        model_z = SPSModel(cfg_z)
        variables = model_g.init(jax.random.PRNGKey(0), pb)
        sg, _ = jax.jit(lambda v, b: model_g.apply(v, b))(variables, pb)
        sz, auxz = jax.jit(lambda v, b, m=model_z: m.apply(v, b))(variables, pb)
        assert not bool(np.asarray(auxz["overflow"]).any()), f"side={side}"
        np.testing.assert_allclose(
            np.asarray(sz), np.asarray(sg), rtol=2e-3, atol=2e-4,
            err_msg=f"side={side} row_from={row_from}",
        )


def test_train_mode_updates_batch_stats():
    rng = np.random.default_rng(1)
    pb = _batch(rng, 200)
    model = SPSModel(CFG)
    variables = model.init(jax.random.PRNGKey(0), pb)
    (scores, aux), mutated = model.apply(
        variables, pb, train=True, mutable=["batch_stats"]
    )
    before = variables["batch_stats"]["MinkUNet"]["bn0"]["mean"]
    after = mutated["batch_stats"]["MinkUNet"]["bn0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    assert np.isfinite(np.asarray(scores)).all()


def test_padded_points_score_zero():
    rng = np.random.default_rng(2)
    pb = _batch(rng, 100)
    model = SPSModel(CFG)
    variables = model.init(jax.random.PRNGKey(0), pb)
    scores, _ = model.apply(variables, pb)
    s = np.asarray(scores)
    assert (s[~np.asarray(pb.valid)] == 0).all()
    assert (s[np.asarray(pb.valid)] > 0).all()


def test_stem_zband_matches_halo_stem():
    """stem_zband folds ONLY the k=5 stem into the zband layout (the
    tiny-channel regime where the fold pays; DESIGN.md §8). Scores must
    match the plain halo stem bitwise-close on the same parameters."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sps_tpu.models.minkunet import MinkUNet, MinkUNetConfig
    from sps_tpu.ops import atlas as atl

    rng = np.random.default_rng(0)
    n = 400
    coords = rng.integers(-20, 20, size=(n, 3)).astype(np.int32)
    t = rng.integers(0, 2, size=n).astype(np.int32)
    bc = (256, 128, 128, 128, 128)
    grid, _ = atl.voxelize_bricks(
        jnp.asarray(coords), jnp.zeros(n, jnp.int32), jnp.asarray(t),
        jnp.ones(n, bool), num_time=2, brick_capacity=bc[0], brick_side=8,
        extent=(1, 8, 8, 8),
    )
    levels = atl.alias_row_levels(
        atl.build_levels(grid, num_levels=3, capacities=bc[:3]), 5
    )
    feats = (0.5 * levels[0].grid.occ).astype(jnp.bfloat16)
    cfg_a = MinkUNetConfig(num_time=2, dtype=jnp.bfloat16, conv_mode="halo")
    cfg_b = dataclasses.replace(cfg_a, stem_zband=True)
    m_a, m_b = MinkUNet(cfg_a), MinkUNet(cfg_b)
    v = m_a.init(jax.random.PRNGKey(0), feats, levels, False)
    out_a = np.asarray(m_a.apply(v, feats, levels, False), np.float32)
    out_b = np.asarray(m_b.apply(v, feats, levels, False), np.float32)
    np.testing.assert_allclose(out_a, out_b, atol=1e-2)
