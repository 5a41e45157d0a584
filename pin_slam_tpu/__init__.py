"""pin_slam_tpu — TPU-native (JAX/XLA/Pallas) neural-point implicit SLAM framework.

A from-scratch re-design of the capabilities of PIN-SLAM (point-based implicit
neural LiDAR/RGB-D SLAM) for TPU hardware:

- fixed-capacity, statically-shaped neural-point map with a spatial voxel hash
  (``pin_slam_tpu.models.neural_points``)
- fused hash-probe -> kNN -> IDW feature query (JAX reference impl + Pallas kernel)
- tiny MLP SDF/semantic/color decoders as pure pytrees
  (``pin_slam_tpu.models.decoder``)
- sampled-along-ray SDF supervision and BCE/eikonal losses
  (``pin_slam_tpu.ops.sampler``, ``pin_slam_tpu.ops.losses``)
- jitted correspondence-free point-to-implicit Gauss-Newton/LM registration
  with the full while_loop on device (``pin_slam_tpu.slam.tracker``)
- incremental mapping with a device-resident replay pool
  (``pin_slam_tpu.slam.mapper``)
- scan-context loop closure, host-side pose-graph optimization, elastic map
  deformation (``pin_slam_tpu.slam.loop_detector``, ``pin_slam_tpu.slam.pgo``)
- marching-cubes meshing from device-computed SDF grids
  (``pin_slam_tpu.slam.mesher``, ``pin_slam_tpu.ops.marching_cubes``)
- multi-chip scaling over a ``jax.sharding.Mesh``
  (``pin_slam_tpu.parallel``)

Reference feature set: kelly7707/PIN_SLAM (see SURVEY.md).
"""

__version__ = "0.1.0"

from pin_slam_tpu.config import Config  # noqa: F401
