"""multiply-tpu: TPU-native multi-person 3D human reconstruction from monocular video.

A from-scratch JAX/XLA/Pallas framework with the capabilities of eth-ait/MultiPly
(CVPR'24): per-person canonical SDF+appearance fields (VolSDF) deformed by SMPL
linear blend skinning, NeRF++ background, layer-wise masked multi-person volume
compositing, progressive SAM-prompted instance-mask self-refinement, and
depth-order / interpenetration losses — persons vmapped, rays sharded over a
device mesh, hot paths in Pallas.
"""

__version__ = "0.1.0"
