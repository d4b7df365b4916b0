"""vae_posterior_consistency_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
VAE-based missing-data imputation and active variable selection.

A ground-up rebuild of the capability surface of the reference research codebase
(stschia/VAE-posterior-consistency): VAE / EDDI-PointNet / MIWAE / notMIWAE /
flow-posterior model families, posterior-consistency regularization (`ml_reg` /
`kl_reg`), MCAR + MNAR missingness pipelines, EDDI-style information-reward active
learning, and an AIS+HMC marginal-likelihood estimator — re-architected TPU-first:

- All compute paths are pure functions under `jax.jit`; entire training runs compile
  to a single XLA program (`lax.scan` over epochs x batches, on-device PRNG masks).
- Monte-Carlo / importance samples are `vmap`-ed, never materialized by `.repeat`.
- Scale-out via `jax.sharding.Mesh` (+`shard_map`): data-parallel batch sharding with
  XLA `psum` gradient reduction over ICI, tensor-parallel sharding of wide MLP layers.
- Hot fused ops (reparameterize + KL + consistency penalty) have Pallas TPU kernels.

Public layering (mirrors the reference's four layers, see SURVEY.md):
  L1 substrate:  vae_posterior_consistency_tpu.{ops,utils,data}
  L2 model zoo:  vae_posterior_consistency_tpu.{nn,models}
  L3 engines:    vae_posterior_consistency_tpu.engine
  L4 CLI:        experiment_main/{imputation,imputation_mnar,active_learning}.py
"""

__version__ = "0.1.0"

from vae_posterior_consistency_tpu import ops  # noqa: F401
from vae_posterior_consistency_tpu import nn  # noqa: F401
