from vae_posterior_consistency_tpu.utils import logging  # noqa: F401
