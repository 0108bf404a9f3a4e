"""hlax — TPU-native heterogeneous longitudinal VAE framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
MineOgre/HL-VAE (see SURVEY.md). Core subpackages:

  types    static type-layout compiler (grouped column layout)
  data     CSV ingestion, encodings, subject-major batching, data generator
  ops      normalization + heterogeneous likelihood heads (fused XLA)
  models   HLVAE encoder/decoder (flax.linen)
  gp       additive-kernel GP prior, sparse-GP KL bounds, posterior predict
  train    jitted train step, optax + natural-gradient updates, checkpointing
  eval     metrics battery, validation, test/imputation, image generation
  parallel device-mesh sharding helpers (pjit/shard_map)
  cli      config-file-compatible drivers
"""

__version__ = "0.1.0"
