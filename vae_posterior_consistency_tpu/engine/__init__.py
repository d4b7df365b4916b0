from vae_posterior_consistency_tpu.engine import (  # noqa: F401
    artifacts,
    checkpoint,
    evaluate,
    train,
)
