from vae_posterior_consistency_tpu.data import loaders  # noqa: F401
