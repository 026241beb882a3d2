#!/usr/bin/env python3
"""Compile-only layout-copy census of the streaming per-scan program.

DESIGN.md §7 attributes the zband end-to-end regression (~235 ms vs
108 ms despite a 2.6x faster conv kernel) to XLA layout copies at the
Pallas custom-call boundaries and fold churn. This script produces the
evidence without occupying the chip: it lowers + compiles the exact
StreamingFilter per-scan program (BLT scale, abstract inputs only — no
execution, no uploads) for any conv mode and parses the optimized HLO:

  * every `copy` instruction (the layout-change op) with its shape,
    byte size, and the op it feeds / consumes;
  * per-opcode instruction counts and byte totals (fusion, conv,
    custom-call = the Pallas kernels, gather, ...);
  * compiled.cost_analysis() totals when the backend reports them.

Usage:
    python scripts/analyze_layout_copies.py --conv-mode halo
    python scripts/analyze_layout_copies.py --conv-mode zband --zband-levels 2
"""

import argparse
import dataclasses
import json
import os
import re
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


_DT_BYTES = {
    "f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8,
}


def shape_bytes(stype: str) -> int:
    """Logical bytes of an HLO shape string like 'bf16[9216,10,10,320]'."""
    m = re.match(r"(\w+)\[([\d,]*)\]", stype)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DT_BYTES.get(dt, 4)


def build_lowered(conv_mode: str, zband_levels: int, engine: str | None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sps_tpu import config as cfg_mod
    from sps_tpu.models.spsnet import SPSModel
    from sps_tpu.ops import atlas as atl
    from sps_tpu.ops import brick as bk
    from sps_tpu.ops import voxelize as vox
    from sps_tpu.utils import metrics as met
    from sps_tpu.utils.geometry import transform_points  # noqa: F401

    cfg = cfg_mod.load(os.path.join(_HERE, "config", "config.yaml"),
                       data_root="/tmp")
    over = {"conv_mode": conv_mode, "zband_levels": zband_levels}
    if engine:
        over["engine"] = engine
    cfg = dataclasses.replace(cfg, tpu=dataclasses.replace(cfg.tpu, **over))
    assert cfg.tpu.engine == "atlas", "census covers the shipping atlas engine"

    scfg = cfg.sps_config(batch_size=1)
    model = SPSModel(scfg)
    vsize = cfg.voxel_size
    bcap = scfg.caps.bricks[0]
    ns = cfg.tpu.scan_points

    # Map atlas extent from the bench world's bounding box (static per
    # deployment; ±50 m world -> the same extent bench.py compiles with).
    bside = cfg.tpu.brick_side
    shift = int(np.log2(bside))
    bc_min = np.floor(np.array([-50.0, -50.0, -1.0]) / vsize).astype(np.int64) >> shift
    bc_max = np.floor(np.array([50.0, 50.0, 14.0]) / vsize).astype(np.int64) >> shift
    ext = tuple(int(x) for x in (bc_max - bc_min + 2))
    m = 1_500_000
    mcap = 1 << int(np.ceil(np.log2(max(2 * m // (bside * bside), 1024))))

    def build_map(points):
        coords = vox.quantize(points, vsize)
        grid, _ = atl.voxelize_bricks(
            coords,
            jnp.zeros((m,), jnp.int32),
            jnp.zeros((m,), jnp.int32),
            jnp.ones((m,), bool),
            num_time=1,
            brick_capacity=mcap,
            brick_side=bside,
            extent=(1,) + ext,
        )
        return grid

    map_grid_shape = jax.eval_shape(
        build_map, jax.ShapeDtypeStruct((m, 3), jnp.float32)
    )

    # The same per-scan fn StreamingFilter._make_atlas_fn builds (batch 1).
    def fn(variables, map_grid, scan_xyz, valid, labels, poses, eps):
        nb, n = scan_xyz.shape[:2]
        xyz = (
            jnp.einsum("bij,bnj->bni", poses[:, :3, :3], scan_xyz)
            + poses[:, None, :3, 3]
        )
        vflat = valid.reshape(nb * n)
        coords = vox.quantize(xyz.reshape(nb * n, 3), vsize)
        batch_idx = jnp.repeat(jnp.arange(nb, dtype=jnp.int32), n)
        grid, p2s = atl.voxelize_bricks(
            coords, batch_idx, jnp.ones((nb * n,), jnp.int32), vflat,
            num_time=2, brick_capacity=bcap, brick_side=scfg.brick_side,
            extent=scfg.atlas_extent,
        )
        bvalid = jnp.arange(bcap) < grid.num_bricks
        batch0 = jnp.where(bvalid, 0, -1)
        mrow = atl.atlas_rows(map_grid, batch0, grid.coords[:, 1:])
        mocc = bk.take_rows(map_grid.occ, mrow)[..., 0]
        overlap = grid.occ[..., 1] * mocc
        occ = grid.occ.at[..., 0].set(overlap)
        grid2 = grid._replace(occ=occ)
        scores, aux = model.apply(
            variables, grid=grid2, p2v=p2s,
            t_idx=jnp.ones((nb * n,), jnp.int32), valid=vflat,
        )
        keep = (scores <= eps) & vflat
        stats = {
            "loss": met.masked_mse(scores, labels.reshape(-1), vflat),
            "r2": met.masked_r2(scores, labels.reshape(-1), vflat),
            "overflow": jnp.any(aux["overflow"]),
        }
        return scores.reshape(nb, n), keep.reshape(nb, n), stats

    # Abstract variables: init traced, never executed.
    def init_fn():
        grid = jax.eval_shape(
            lambda: atl.voxelize_bricks(
                jnp.zeros((ns, 3), jnp.int32),
                jnp.zeros((ns,), jnp.int32),
                jnp.ones((ns,), jnp.int32),
                jnp.ones((ns,), bool),
                num_time=2, brick_capacity=bcap, brick_side=scfg.brick_side,
                extent=scfg.atlas_extent,
            )
        )
        return grid

    grid_shape, p2s_shape = init_fn()

    import jax.random as jr

    var_shapes = jax.eval_shape(
        lambda k: model.init(
            k,
            grid=jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), grid_shape
            ),
            p2v=jnp.zeros(p2s_shape.shape, p2s_shape.dtype),
            t_idx=jnp.ones((ns,), jnp.int32),
            valid=jnp.ones((ns,), bool),
        ),
        jr.PRNGKey(0),
    )

    import jax.numpy as jnp2  # noqa: F401

    args = (
        var_shapes,
        map_grid_shape,
        jax.ShapeDtypeStruct((1, ns, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, ns), bool),
        jax.ShapeDtypeStruct((1, ns), jnp.float32),
        jax.ShapeDtypeStruct((1, 4, 4), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
    )
    log(f"lowering conv_mode={conv_mode} zband_levels={zband_levels}")
    return jax.jit(fn).lower(*args)


def census(hlo: str):
    """Parse optimized HLO: copies with sizes, per-opcode byte totals.

    Tuple-shaped instructions (multi-output fusions, sort, ...) are
    counted with the SUM of their component array shapes so per-opcode
    byte totals don't systematically undercount; any result shape the
    parser still can't read is tallied in `skipped` so the undercount is
    visible in the report rather than silent."""
    copies = []
    opcode_count: dict[str, int] = {}
    opcode_bytes: dict[str, int] = {}
    skipped = 0
    # An array shape incl. its layout suffix: bf16[8,128]{1,0:T(8,128)}.
    # Component commas live inside [] or {}, so ", " splits tuple parts.
    arr = r"[\w]+\[[\d,]*\](?:\{[^}]*\})?"
    single = re.compile(r"\s*(?:ROOT )?%?[\w.\-]+ = (" + arr + r") (\w+)\(")
    tup = re.compile(r"\s*(?:ROOT )?%?[\w.\-]+ = \(((?:" + arr + r"(?:, )?)+)\) (\w+)\(")
    anyinst = re.compile(r"\s*(?:ROOT )?%?[\w.\-]+ = (.+?) ([\w\-]+)\(")
    for line in hlo.splitlines():
        m = single.match(line)
        if m:
            stype, op = m.group(1), m.group(2)
            b = shape_bytes(stype)
        else:
            mt = tup.match(line)
            if mt:
                op = mt.group(2)
                parts = re.findall(arr, mt.group(1))
                b = sum(shape_bytes(p) for p in parts)
                stype = mt.group(1)
            else:
                if anyinst.match(line):
                    skipped += 1
                continue
        opcode_count[op] = opcode_count.get(op, 0) + 1
        opcode_bytes[op] = opcode_bytes.get(op, 0) + b
        if op == "copy":
            copies.append({"shape": stype, "bytes": b})
    copies.sort(key=lambda c: -c["bytes"])
    return copies, opcode_count, opcode_bytes, skipped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conv-mode", default="halo")
    ap.add_argument("--zband-levels", type=int, default=1)
    ap.add_argument("--engine", default=None)
    ap.add_argument("--out", default=None, help="also save full HLO text here")
    args = ap.parse_args()

    lowered = build_lowered(args.conv_mode, args.zband_levels, args.engine)
    log("compiling (remote XLA; no chip execution)")
    t0 = time.time()
    compiled = lowered.compile()
    log(f"compiled in {time.time()-t0:.0f}s")
    hlo = compiled.as_text()
    if args.out:
        with open(args.out, "w") as f:
            f.write(hlo)
        log(f"HLO -> {args.out} ({len(hlo)/1e6:.1f} MB)")

    copies, count, bbytes, skipped = census(hlo)
    total_copy = sum(c["bytes"] for c in copies)
    print(json.dumps({
        "conv_mode": args.conv_mode,
        "zband_levels": args.zband_levels,
        "skipped_unparsed_results": skipped,
        "n_copies": len(copies),
        "copy_bytes_total": total_copy,
        "copy_bytes_gb": round(total_copy / 1e9, 3),
        "largest_copies": copies[:15],
        "opcode_count": dict(sorted(count.items(), key=lambda kv: -kv[1])),
        "opcode_bytes_mb": {
            k: round(v / 1e6, 1)
            for k, v in sorted(bbytes.items(), key=lambda kv: -kv[1])
        },
    }, indent=1))

    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        keep = {k: v for k, v in ca.items()
                if k in ("flops", "bytes accessed", "optimal_seconds")
                or k.startswith("bytes accessed")}
        print(json.dumps({"cost_analysis": keep}, indent=1))
    except Exception as e:  # pragma: no cover
        log(f"cost_analysis unavailable: {e}")


if __name__ == "__main__":
    main()
