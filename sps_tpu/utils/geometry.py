"""SE(3) geometry: homogeneous transforms, quaternions (pure JAX/numpy).

Replaces the reference's numpy/tf.transformations helpers at
/root/reference/src/sps/datasets/util.py:187-232. Works on both numpy and
jax arrays (host preprocessing and on-device streaming use the same code).
"""

from __future__ import annotations

import jax.numpy as jnp


def transform_points(points, tr):
    """Apply a 4x4 homogeneous transform to (N, 3) points (row vectors)."""
    xyz = points[..., :3]
    out = xyz @ tr[:3, :3].T + tr[:3, 3]
    w = xyz @ tr[3, :3].T + tr[3, 3]
    return out / w[..., None]


def inverse_transform_points(points, tr):
    return transform_points(points, jnp.linalg.inv(tr))


def quat_to_matrix(qx, qy, qz, qw):
    """Unit quaternion -> 3x3 rotation matrix."""
    n = qx * qx + qy * qy + qz * qz + qw * qw
    s = 2.0 / n
    wx, wy, wz = s * qw * qx, s * qw * qy, s * qw * qz
    xx, xy, xz = s * qx * qx, s * qx * qy, s * qx * qz
    yy, yz, zz = s * qy * qy, s * qy * qz, s * qz * qz
    return jnp.array(
        [
            [1.0 - (yy + zz), xy - wz, xz + wy],
            [xy + wz, 1.0 - (xx + zz), yz - wx],
            [xz - wy, yz + wx, 1.0 - (xx + yy)],
        ]
    )


def pose_to_matrix(x, y, z, qx, qy, qz, qw):
    """Translation + quaternion -> 4x4 transform (the reference's
    to_tr_matrix from an Odometry message, util.py:209-232)."""
    tr = jnp.eye(4)
    tr = tr.at[:3, :3].set(quat_to_matrix(qx, qy, qz, qw))
    tr = tr.at[:3, 3].set(jnp.array([x, y, z]))
    return tr
