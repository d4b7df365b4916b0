from vae_posterior_consistency_tpu.ops import masks, math  # noqa: F401
