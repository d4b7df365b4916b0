from vae_posterior_consistency_tpu.nn import core, flow  # noqa: F401
