"""points2surf_tpu — a TPU-native (JAX/XLA/Pallas) surface-reconstruction framework.

Re-implements the capabilities of Points2Surf (ECCV 2020, "Learning Implicit
Surfaces from Point Clouds", reference: ErlerPhilipp/points2surf) as a
TPU-first design:

* Patch extraction (kNN / ball query + normalization + sub-sampling) runs
  on-device as fused, fixed-shape XLA/Pallas programs instead of CPU
  kd-tree workers (reference: source/data_loader.py, the throughput
  ceiling of the original pipeline).
* The dual PointNet encoders + QSTN + SDF heads are jitted flax modules
  (reference: source/points_to_surf_model.py, source/sdf_nn.py).
* Training runs as a single pjit-ed step with the batch sharded over a
  `jax.sharding.Mesh` data axis (replacing torch.nn.DataParallel,
  reference: source/points_to_surf_train.py:413-414).
* Volumetric reconstruction (voxel splatting, sign propagation) runs on
  device; marching cubes runs on host (C++ extension with numpy fallback)
  fed by streamed SDF slabs (reference: source/sdf.py).
"""

__version__ = "0.1.0"
