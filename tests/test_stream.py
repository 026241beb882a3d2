"""Streaming engine equivalence with the reference's online pipeline.

The reference's online node materializes a submap cloud of dequantized
overlap voxels and feeds scan+submap through the model
(util.py:85-114 prune + util.py:163-184 infer). Our streaming engine skips
the submap cloud entirely and sets the map-occupancy bit on the scan's
voxel grid. These must produce IDENTICAL scan scores: this test feeds the
materialized form through the offline SPSModel path and compares.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

import sps_tpu.config as cfg_mod
from sps_tpu.models.spsnet import SPSModel
from sps_tpu.stream.engine import StreamingFilter, build_map_table
from sps_tpu.structs import PointBatch
from sps_tpu import train as tr


def _small_cfg():
    return cfg_mod.Config(
        data=cfg_mod.DataConfig(root="/tmp"),
        train=cfg_mod.TrainConfig(batch_size=1),
        voxel_size=0.2,
        tpu=cfg_mod.TPUConfig(
            scan_points=1024,
            submap_points=1024,
            cell_capacity=4096,
            voxels=(4096, 2048, 1024, 512, 256),
            bricks=(1024, 512, 256, 256, 256),
        ),
    )


def test_streaming_matches_materialized_submap():
    cfg = _small_cfg()
    rng = np.random.default_rng(0)
    state = tr.create_state(cfg, jax.random.PRNGKey(0), 1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    n = 700
    scan = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    # Map shares ~half the space with the scan.
    mappts = np.concatenate(
        [scan[: n // 2] + rng.normal(0, 0.02, (n // 2, 3)).astype(np.float32),
         rng.uniform(5, 9, (2000, 3)).astype(np.float32)]
    )
    ns = cfg.tpu.scan_points
    sx = np.zeros((ns, 3), np.float32)
    sv = np.zeros((ns,), bool)
    sl = np.zeros((ns,), np.float32)
    sx[:n], sv[:n] = scan, True

    filt = StreamingFilter(cfg, variables, mappts)
    scores_stream, keep, stats = filt(sx, sv, sl, np.eye(4, dtype=np.float32))
    scores_stream = np.asarray(scores_stream)[:n]

    # Materialized form (reference online semantics): overlap voxels,
    # dequantized, fed as t=0 points alongside the scan.
    vs = cfg.voxel_size
    scan_vox = {tuple(v) for v in np.floor(scan / vs).astype(np.int64)}
    map_vox = {tuple(v) for v in np.floor(mappts / vs).astype(np.int64)}
    overlap = sorted(scan_vox & map_vox)
    centers = (np.asarray(overlap, np.float32) + 0.5) * vs
    assert 50 < len(centers) < cfg.tpu.submap_points

    total = ns + cfg.tpu.submap_points
    xyz = np.zeros((total, 3), np.float32)
    t = np.zeros((total,), np.int32)
    lab = np.zeros((total,), np.float32)
    valid = np.zeros((total,), bool)
    xyz[:n], t[:n], valid[:n] = scan, 1, True
    k = len(centers)
    xyz[ns : ns + k], t[ns : ns + k], valid[ns : ns + k] = centers, 0, True
    pb = PointBatch(
        xyz=jnp.asarray(xyz),
        batch=jnp.zeros((total,), jnp.int32),
        t=jnp.asarray(t),
        label=jnp.asarray(lab),
        valid=jnp.asarray(valid),
    )
    model = SPSModel(cfg.sps_config(1))
    scores_ref, aux = model.apply(variables, pb)
    assert not bool(np.asarray(aux["overflow"]).any())
    scores_ref = np.asarray(scores_ref)[:n]

    np.testing.assert_allclose(scores_stream, scores_ref, rtol=1e-4, atol=1e-5)
    # Filter semantics: keep scores <= eps (sps_node.py:148).
    np.testing.assert_array_equal(
        np.asarray(keep)[:n], scores_stream <= cfg.threshold
    )
    # Submap voxel count agrees with the brute-force overlap.
    assert int(stats["n_submap_voxels"]) == len(overlap)


def test_map_table_counts():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-2, 2, (5000, 3)).astype(np.float32)
    table, nvox = build_map_table(pts, 0.5)
    want = len({tuple(v) for v in np.floor(pts / 0.5).astype(np.int64)})
    assert nvox == want


def test_replay_sequence_streams_via_native_replayer(tmp_path):
    """End-to-end replay driver: scans stream through the native Replayer
    (sensor-frame + per-scan pose, the reference node's inputs), filtered
    clouds export, and the per-scan log/stat rows materialize."""
    from sps_tpu.data import synthetic
    from sps_tpu.stream import replay

    root = str(tmp_path / "data")
    synthetic.generate(root, sequences=("s0",), scans_per_seq=3, n_rays=120,
                       ground_points=1500, n_stable=4)
    cfg = dataclasses.replace(
        _small_cfg(),
        data=cfg_mod.DataConfig(root=root),
        tpu=dataclasses.replace(
            _small_cfg().tpu, scan_points=4096, submap_points=4096
        ),
    )
    state = tr.create_state(cfg, jax.random.PRNGKey(0), 1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out_dir = str(tmp_path / "filtered")
    rows = []
    stats = replay.replay_sequence(
        cfg, variables, "s0", out_dir=out_dir, log=rows.append
    )
    assert len(stats.rows) == 3 and len(rows) == 3
    s = stats.summary()
    assert s["scans_per_sec"] > 0
    import os as _os

    files = sorted(_os.listdir(out_dir))
    assert files == ["000000.npy", "000001.npy", "000002.npy"]
    kept = np.load(_os.path.join(out_dir, files[0]))
    assert kept.ndim == 2 and kept.shape[1] == 4
    # Kept count matches the engine's report for that scan.
    assert len(kept) == stats.rows[0]["n_kept"]


def test_nclt_config_scales_blt():
    """config_nclt.yaml (BASELINE.md measurement config #3) must dominate
    the BLT config: same per-scan capacities, strictly larger map-side
    extents/caps, so a model/filter built for BLT runs at NCLT scale by a
    config swap (headroom itself is validated on hardware by
    scripts/check_nclt_headroom.py)."""
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    blt = cfg_mod.load(os.path.join(here, "config", "config.yaml"), data_root="/tmp")
    nclt = cfg_mod.load(os.path.join(here, "config", "config_nclt.yaml"), data_root="/tmp")
    assert nclt.tpu.scan_points == blt.tpu.scan_points
    assert all(n >= b for n, b in zip(nclt.tpu.bricks, blt.tpu.bricks))
    assert all(n >= b for n, b in zip(nclt.tpu.atlas_extent, blt.tpu.atlas_extent))
    ext = nclt.tpu.atlas_extent
    # >= 220 m of horizontal coverage at 0.1 m voxels, side-8 bricks.
    assert ext[0] * 8 * nclt.voxel_size >= 220.0
