"""rtpose_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework for 3D human pose
estimation and localization from 4D radar tensors (and LiDAR point clouds).

A from-scratch rebuild of the capability surface of ipl-uw/RT-POSE (ECCV 2024)
designed TPU-first:

* models are pure functions over pytrees (flax.linen) in channels-last layout,
* the whole train step (target assignment -> forward -> loss -> grad -> adam)
  compiles to a single XLA program,
* data parallelism is a 1-D ``jax.sharding.Mesh`` with pjit-inserted psums,
* hot host-side ops (radar-cube crop+normalize) have fused Pallas kernels and a
  native C++ loader,
* checkpointing is Orbax.

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
