"""hitl_slam_tpu: a TPU-native (JAX/XLA/Pallas) Human-in-the-Loop SLAM framework.

A ground-up redesign of the capabilities of ut-amrl/hitl-slam (Nashed & Biswas,
arXiv:1711.08566) for TPU hardware:

  - the Ceres nonlinear least-squares joint pose-graph solve becomes a batched
    Gauss-Newton/Levenberg-Marquardt solver with analytic Jacobians and a
    block-cyclic-reduction linear solve, fully on device
    (reference: HitL-SLAM/src/human_in_the_loop_slam/JointOptimization.cpp)
  - the EM sketch-fitting loop, explicit correction, and COP-SLAM covariance
    backprop are pure-jnp array programs (reference: EMinput.cpp,
    ApplyExplicitCorrection.cpp, Backprop.cpp)
  - scaling across chips uses jax.sharding.Mesh + shard_map with a
    SPIKE-partitioned block-tridiagonal solve (the reference is single-machine
    OpenMP; see SURVEY.md section 2.7)

Layout:
  core/      MapState pytree, constraint tables, correction data model
  ops/       pure-jnp + Pallas kernels (geometry, selection, seg-fit, raster)
  solver/    block-tridiagonal LM solver
  models/    hitl repair engine, enml batch localizer, ltvm curator
  parallel/  device-mesh sharding, multi-chip solve, replica vmap
  io/        .stfs.covars / correction-log / results formats, synthetic data
  gui/       draw-list schema + websocket bridge + headless renderer
  utils/     config (hot-reload), timing, logging
  native/    C++ runtime pieces (fast text parser) with Python fallbacks
"""

__version__ = "0.1.0"

import jax as _jax

# The solver's 3x3 block algebra and normal-equation products must run at
# full f32: TPU's default bf16 matmul precision stalls LM convergence (steps
# solved from a bf16-rounded Hessian stop decreasing the true cost). These
# matmuls are tiny — full precision costs nothing.
_jax.config.update("jax_default_matmul_precision", "float32")
