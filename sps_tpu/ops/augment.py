"""On-device point-cloud augmentation (jax.random).

Same four transforms the reference applies jointly to scan+submap during
training (/root/reference/src/sps/datasets/augmentation.py and
blt_dataset.py:273-278): random yaw rotation, small rpy perturbation,
per-axis random flips, and anisotropic random scaling. All four compose
into a single 3x3 matrix applied with one matmul, so augmentation is free
on-device instead of a host-side loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])


def _rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def augmentation_matrix(
    key: jax.Array,
    *,
    angle_sigma: float = 0.2,
    angle_clip: float = 0.5,
    scale_low: float = 0.8,
    scale_high: float = 1.2,
) -> jnp.ndarray:
    """Draw one composite 3x3 augmentation matrix.

    Composition order matches the reference (augmentation.py applied in
    sequence; points are row vectors, p' = p @ M):
    yaw -> rpy perturbation (Rz@Ry@Rx) -> flips -> scale.
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    yaw = jax.random.uniform(k1, (), minval=0.0, maxval=2 * jnp.pi)
    m = _rot_z(yaw)

    ang = jnp.clip(
        angle_sigma * jax.random.normal(k2, (3,)), -angle_clip, angle_clip
    )
    m = m @ (_rot_z(ang[2]) @ _rot_y(ang[1]) @ _rot_x(ang[0]))

    flips = jax.random.uniform(k3, (2,)) > 0.5
    fx = jnp.where(flips[0], -1.0, 1.0)
    fy = jnp.where(flips[1], -1.0, 1.0)
    m = m * jnp.array([fx, fy, 1.0])[None, :]

    scales = jax.random.uniform(k4, (3,), minval=scale_low, maxval=scale_high)
    m = m * scales[None, :]
    del k5
    return m


def augment(key: jax.Array, xyz: jnp.ndarray, **kw) -> jnp.ndarray:
    """Apply one shared augmentation to an (N, 3) cloud."""
    return xyz @ augmentation_matrix(key, **kw)
