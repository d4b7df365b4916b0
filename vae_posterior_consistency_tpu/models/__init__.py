from vae_posterior_consistency_tpu.models import registry  # noqa: F401
from vae_posterior_consistency_tpu.models.registry import get_model, ModelDef  # noqa: F401
