#!/usr/bin/env python3
"""Train the SPS stability model (CLI-compatible with the reference's
scripts/train.py: `python scripts/train.py -c config/config.yaml`)."""

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
# Persistent XLA compile cache (TPU backends; tests opt out on CPU
# — see tests/conftest.py): repeat invocations skip the multi-minute
# compile of the per-scan/train programs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_HERE, ".jax_cache"))

import click


@click.command()
@click.option("--config", "-c", type=str, default="./config/config.yaml",
              help="Path to the config file (.yaml)")
@click.option("--data", type=str, default=None, help="Dataset root (defaults to $DATA)")
@click.option("--log-dir", type=str, default="./tb_logs")
@click.option("--ckpt-dir", type=str, default="./checkpoints")
@click.option("--max-steps", type=int, default=None, help="Stop early (smoke runs)")
@click.option("--seed", type=int, default=0)
@click.option("--resume", is_flag=True, default=False,
              help="Continue from <ckpt-dir>/last (params + optimizer state)")
@click.option("--devices", type=int, default=1,
              help="Data-parallel training over an N-chip mesh (batch sharded)")
def main(config, data, log_dir, ckpt_dir, max_steps, seed, resume, devices):
    from sps_tpu import config as cfg_mod
    from sps_tpu import train

    cfg = cfg_mod.load(config, data_root=data)
    best = train.fit(cfg, log_dir=log_dir, ckpt_dir=ckpt_dir, max_steps=max_steps,
                     seed=seed, resume=resume, devices=devices)
    print(f"best checkpoint: {best}")


if __name__ == "__main__":
    main()
