"""MNIST (784-dim image-table) pipeline smoke: EDDI widths, loader, train+eval
(reference: src/models/VAE.py:10-347 mnist classes; src/utils/loaders.py:249-316)."""

import numpy as np
import pytest

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.data import generate, loaders
from vae_posterior_consistency_tpu.engine import evaluate as E
from vae_posterior_consistency_tpu.engine import train as T
from vae_posterior_consistency_tpu.models import get_model


@pytest.fixture(scope="module")
def mnist_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("DataM")
    generate.generate_mnist(str(root), seed=5)
    return str(root)


def test_mnist_eddi_end_to_end(mnist_root):
    cfg = RunConfig(vae_type="reg_EDDI1", data_type="mnist", epoch=1,
                    batch_size=256, K=8, latent_dim=8, M=1)
    ds = loaders.data_loader_mnist(mnist_root, cfg.vae_type, 30, 256)
    assert ds.obs_dim == 784
    params, hist = T.train(ds, cfg, save=False)
    assert np.isfinite(hist).all()
    res = E.eval_vae(ds, cfg, params=params, save=False)
    assert 0 < res["test"]["rmse"] < 1.0


def test_mnist_encoder_widths():
    """MNIST variant uses the 500/500/200 PointNet trunk and 200/500/500
    decoder (reference: VAE.py:32-44) vs the UCI 100/50 nets."""
    cfg_m = RunConfig(vae_type="vanilla_EDDI1", data_type="mnist", K=8,
                      latent_dim=8)
    cfg_u = RunConfig(vae_type="vanilla_EDDI1", data_type="wine", K=8,
                      latent_dim=8)
    import jax

    m = get_model(cfg_m)
    pm = m.init(jax.random.PRNGKey(0), cfg_m, 784)
    pu = m.init(jax.random.PRNGKey(0), cfg_u, 12)
    assert pm["encoder"]["pnp2"]["layer0"]["w"].shape == (8, 500)
    assert pu["encoder"]["pnp2"]["layer0"]["w"].shape == (8, 100)
    assert pm["decoder"]["layer0"]["w"].shape == (8, 200)
    assert pu["decoder"]["layer0"]["w"].shape == (8, 50)
