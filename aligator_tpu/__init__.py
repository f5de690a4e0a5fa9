"""aligator_tpu — a TPU-native trajectory-optimization framework.

A from-scratch JAX/XLA/Pallas re-imagination of the capabilities of the
reference `aligator` library (constrained trajectory optimization with
ProxDDP/FDDP solvers over a generalized Riccati linear-algebra core):
problems are pytrees of stacked per-stage arrays, models are pure functions,
solvers are `lax.scan`/`while_loop` programs that batch over thousands of
scenarios with `vmap` and shard over device meshes with `jax.sharding`.

Layers (bottom-up), mirroring the reference's architecture
(see SURVEY.md §1):

* :mod:`aligator_tpu.gar` — proximal LQ problems + Riccati solvers.
* :mod:`aligator_tpu.core` — manifolds, costs, dynamics, constraints, stage
  models, trajectory problems.
* :mod:`aligator_tpu.modelling` — concrete spaces, integrators, costs,
  residuals, rigid-body dynamics.
* :mod:`aligator_tpu.solvers` — ProxDDP and FDDP.
* :mod:`aligator_tpu.parallel` — mesh/sharding helpers for multi-chip scaling.
* :mod:`aligator_tpu.utils` — rollout, logging, plotting.
"""

__version__ = "0.1.0"

import jax as _jax

# Riccati recursions on μ-scaled (ill-conditioned) KKT blocks are not stable
# under the TPU's default bf16 matmul passes: at the bench shapes ~23% of
# fp32 solves go non-finite with the default precision and 0% with fp32
# accumulation (measured on v5e). The matrices in the hot path are tiny
# (nx ≤ ~40), so full-precision passes cost nothing; large NN-style matmuls
# are not this library's workload. Respect an explicit user setting.
if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "highest")

from . import gar

__all__ = ["gar", "__version__"]
