"""sps_tpu — TPU-native Stable Points Segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SPS
("Generalizable Stable Points Segmentation for 3D LiDAR Scan-to-Map
Long-Term Localization", RA-L 2024): per-point stability scoring of LiDAR
scans against a prebuilt map via a 4D sparse-convolutional MinkUNet, used to
filter unstable points before scan-to-map localization.

Key architectural departures from the CUDA/torch reference
(reference layout at /root/reference, cited per-module):

* The reference's 4D sparse tensors (x, y, z, t) with t in {scan=1, map=0}
  are re-designed as **3D sparse voxel grids with the time axis packed into
  channel blocks** (t is never strided and only mixed by 3^4 kernels), so a
  4D sparse conv becomes a 3D sparse conv with block-Toeplitz channel
  matrices: 81 kernel offsets -> 27, half the rows, 4x denser matmuls on
  the MXU.
* MinkowskiEngine's dynamic coordinate manager is replaced by a
  fixed-capacity open-addressing voxel hash table with fully static shapes,
  so the whole pipeline compiles once under jit.
* Sparse convolution is formulated gather-only in the forward pass
  (out[i] = sum_k F[nbr_k(i)] @ W_k); transpose conv is a single
  parity-selected gather. No scatter on the hot path.
* Training/eval use optax/orbax; the online ROS pipeline is replaced by a
  host-side replay driver feeding a single jitted per-scan function.
"""

__version__ = "0.1.0"
