"""bundlesdf_tpu — a TPU-native (JAX/XLA/Pallas) framework for near-real-time
6-DoF pose tracking of unknown objects from monocular RGBD with simultaneous
neural 3D reconstruction (Neural Object Field: truncated-SDF + color).

Re-designed from scratch for TPU; capabilities mirror the reference BundleSDF
(see SURVEY.md).  Compute path is pure JAX/XLA/Pallas: all CUDA kernels of the
reference (cuda_ransac.cu, Solver/*, CUDAImageUtil.cu, mycuda/*, kaolin SPC)
map to jitted XLA programs, vmapped batch kernels, or Pallas kernels; the
runtime around them (keyframe pool scheduling, IO, meshing) is host Python/C++.

Subpackages
-----------
- ``utils``     SE(3)/geometry/metrics/mesh foundations
- ``ops``       jitted image ops, RANSAC, hash-grid encoder, occupancy grid
- ``models``    feature matcher + neural-object-field networks
- ``tracking``  frame preprocessing, keyframe pool, pose-graph bundle adjustment
- ``nof``       Neural Object Field training/rendering/meshing
- ``parallel``  device-mesh sharding (DP rays, sharded BA reduction)
- ``io``        dataset readers, scene-bound estimation
- ``pipeline``  the online tracking + reconstruction orchestrator
"""

__version__ = "0.1.0"
