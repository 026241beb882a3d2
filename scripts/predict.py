#!/usr/bin/env python3
"""Evaluate a checkpoint on a sequence (CLI-compatible with the
reference's scripts/predict.py: `-w ckpt -seq SEQ -c config.yaml`)."""

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
# Persistent XLA compile cache (TPU backends; tests opt out on CPU
# — see tests/conftest.py): repeat invocations skip the multi-minute
# compile of the per-scan/train programs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_HERE, ".jax_cache"))

import dataclasses

import click


@click.command()
@click.option("--weights", "-w", type=str, required=True,
              help="checkpoint directory (orbax) or torch .ckpt to convert")
@click.option("--sequence", "-seq", type=str, default=None,
              help="evaluate this sequence instead of the config test split")
@click.option("--config", "-c", type=str, default="./config/config.yaml")
@click.option("--data", type=str, default=None, help="Dataset root (defaults to $DATA)")
@click.option("--save-vis", is_flag=True, default=False)
def main(weights, sequence, config, data, save_vis):
    from sps_tpu import config as cfg_mod
    from sps_tpu import eval as eval_mod
    from sps_tpu.utils import checkpoint as ckpt

    cfg = cfg_mod.load(config, data_root=data)
    if sequence:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, test=(sequence,))
        )
    assert len(cfg.data.test) == 1, "Only one test SEQ is allowed at a time!"
    print("Test seq:", list(cfg.data.test))

    if weights.endswith(".ckpt"):
        from sps_tpu import convert

        variables = convert.torch_ckpt_to_variables(weights, cfg.sps_config(1))
    else:
        restored = ckpt.restore(weights)
        variables = {
            "params": restored["params"],
            "batch_stats": restored["batch_stats"],
        }
    eval_mod.predict_sequence(cfg, variables, save_vis=save_vis)


if __name__ == "__main__":
    main()
