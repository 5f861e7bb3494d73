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

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache (opt-out via BSDF_NO_COMPILE_CACHE).

    The online pipeline's big programs (the scanned NOF train loop, BA,
    LoFTR) cost minutes of XLA compile on first use; caching them on disk
    makes every later process launch (global refine reruns, benchmarks,
    repeat videos) skip straight to execution.  Mirrors how the reference
    amortizes via long-lived worker processes (bundlesdf.py run_nerf loop) —
    here the process can be short-lived because the executable is cached.
    """
    if _os.environ.get("BSDF_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "bundlesdf_tpu_xla"),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()
