from vae_posterior_consistency_tpu.parallel import mesh, train_parallel, sweep  # noqa: F401
