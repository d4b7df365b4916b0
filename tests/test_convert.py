"""Reference-checkpoint converter: torch state_dicts -> framework pytrees.

Each test builds a small torch module with the reference's exact attribute
naming (reference: src/models/VAE.py:366-379, 687-708, 2342-2368, 3026-3041,
1882-1916), converts its state_dict, and checks the framework forward
reproduces the torch forward numerically (deterministic paths only).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from tools.convert_reference_checkpoint import convert_state_dict
from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.models import flow_vae, gauss, miwae

import jax.numpy as jnp  # noqa: E402

OBS, LAT, B = 7, 10, 5


def _rand_x_mask(seed=0):
    g = np.random.default_rng(seed)
    x = g.uniform(0, 1, (B, OBS)).astype(np.float32)
    mask = (g.random((B, OBS)) < 0.7).astype(np.float32)
    return x, mask


class _RefDense(nn.Module):
    """Reference Reg_VAE nets (src/models/VAE.py:366-376)."""

    def __init__(self):
        super().__init__()
        self.seq_encoder = nn.Sequential(
            nn.Linear(OBS, 100), nn.ReLU(), nn.Linear(100, 50), nn.ReLU(),
            nn.Linear(50, 2 * LAT))
        self.seq_decoder = nn.Sequential(
            nn.Linear(LAT, 50), nn.ReLU(), nn.Linear(50, 100), nn.ReLU(),
            nn.Linear(100, OBS), nn.Sigmoid())


def test_dense_gauss_roundtrip():
    ref = _RefDense()
    cfg = RunConfig(vae_type="vanilla_vae1", latent_dim=LAT)
    params = convert_state_dict(ref.state_dict(), cfg, OBS)

    x, mask = _rand_x_mask()
    with torch.no_grad():
        h = ref.seq_encoder(torch.from_numpy(x * mask))
        mean_t, logvar_t = h.chunk(2, dim=1)
        xr_t = ref.seq_decoder(mean_t)
    mean_j, logvar_j = gauss.encode(params, jnp.asarray(x), jnp.asarray(mask),
                                    cfg)
    xr_j, _ = gauss.decode(params, mean_j)
    np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(xr_j), xr_t.numpy(), atol=1e-5)


class _RefEDDI(nn.Module):
    """Reference Reg_EDDI nets (src/models/VAE.py:687-708), K=10."""

    K = 10

    def __init__(self):
        super().__init__()
        K = self.K
        self.pnp_encoder1 = nn.Sequential(nn.Linear(2 + K, K), nn.ReLU())
        self.pnp_encoder2 = nn.Sequential(
            nn.Linear(K, 100), nn.ReLU(), nn.Linear(100, 50), nn.ReLU(),
            nn.Linear(50, 2 * LAT))
        self.seq_decoder = nn.Sequential(
            nn.Linear(LAT, 50), nn.ReLU(), nn.Linear(50, 100), nn.ReLU(),
            nn.Linear(100, OBS), nn.Sigmoid())
        self.type_pars1 = nn.Parameter(torch.randn(OBS, K))
        self.type_bias1 = nn.Parameter(torch.randn(OBS, 1))

    def encode(self, x, mask):
        # per-feature embed [x_d, x_d*W_d, b_d] -> pnp1 -> masked sum-pool
        # (reference: src/models/VAE.py:719-741)
        xe = x.unsqueeze(-1)
        feats = torch.cat(
            [xe, xe * self.type_pars1.unsqueeze(0),
             self.type_bias1.unsqueeze(0).expand(x.shape[0], -1, -1)], dim=-1)
        emb = self.pnp_encoder1(feats)
        agg = (mask.unsqueeze(-1) * emb).sum(dim=1)
        return self.pnp_encoder2(agg).chunk(2, dim=1)


def test_eddi_pointnet_roundtrip():
    ref = _RefEDDI()
    cfg = RunConfig(vae_type="vanilla_EDDI1", latent_dim=LAT, K=_RefEDDI.K)
    params = convert_state_dict(ref.state_dict(), cfg, OBS)

    x, mask = _rand_x_mask(1)
    with torch.no_grad():
        mean_t, logvar_t = ref.encode(torch.from_numpy(x),
                                      torch.from_numpy(mask))
    mean_j, logvar_j = gauss.encode(params, jnp.asarray(x), jnp.asarray(mask),
                                    cfg)
    np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(),
                               atol=1e-5)


class _RefMIWAE(nn.Module):
    """Reference MIWAE nets (src/models/VAE.py:3026-3041)."""

    def __init__(self):
        super().__init__()
        self.seq_encoder = nn.Sequential(
            nn.Linear(OBS, 128), nn.ReLU(), nn.Linear(128, 128), nn.ReLU(),
            nn.Linear(128, 2 * LAT))
        self.seq_decoder = nn.Sequential(
            nn.Linear(LAT, 128), nn.ReLU(), nn.Linear(128, 128), nn.ReLU(),
            nn.Linear(128, 3 * OBS))


def test_miwae_roundtrip():
    ref = _RefMIWAE()
    cfg = RunConfig(vae_type="vanilla_MIWAE1", latent_dim=LAT)
    params = convert_state_dict(ref.state_dict(), cfg, OBS)

    x, mask = _rand_x_mask(2)
    with torch.no_grad():
        h = ref.seq_encoder(torch.from_numpy(x * mask))
        mean_t, pre_scale_t = h.chunk(2, dim=1)
        scale_t = torch.nn.functional.softplus(pre_scale_t)
    mean_j, scale_j = miwae.encode(params, jnp.asarray(x), jnp.asarray(mask),
                                   cfg)
    np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(scale_j), scale_t.numpy(), atol=1e-5)


class _RefNotMIWAE(nn.Module):
    """Reference notMIWAE_myversion nets (src/models/VAE.py:2706-2741)."""

    def __init__(self):
        super().__init__()
        self.seq_encoder = nn.Sequential(
            nn.Linear(OBS, 128), nn.ELU(), nn.Linear(128, 128), nn.ELU())
        self.q_mu = nn.Sequential(nn.Linear(128, LAT))
        self.q_logstd = nn.Sequential(nn.Linear(128, LAT))
        self.seq_decoder = nn.Sequential(
            nn.Linear(LAT, 128), nn.ELU(), nn.Linear(128, 128), nn.ELU())
        self.x_mean = nn.Sequential(nn.Linear(128, OBS), nn.Sigmoid())
        self.x_logvar = nn.Sequential(
            nn.Linear(128, OBS), nn.Hardtanh(min_val=-10.0, max_val=0.0))
        self.W = nn.Parameter(torch.randn(1, 1, OBS))
        self.b = nn.Parameter(torch.randn(1, 1, OBS))


def test_notmiwae_roundtrip():
    from vae_posterior_consistency_tpu.models import notmiwae

    ref = _RefNotMIWAE()
    cfg = RunConfig(vae_type="vanilla_notMIWAE1", latent_dim=LAT)
    params = convert_state_dict(ref.state_dict(), cfg, OBS)

    x, mask = _rand_x_mask(3)
    with torch.no_grad():
        h = ref.seq_encoder(torch.from_numpy(x * mask))
        mu_t = ref.q_mu(h)
        logstd_t = ref.q_logstd(h)
        hd = ref.seq_decoder(mu_t)
        xm_t = ref.x_mean(hd)
        xlv_t = ref.x_logvar(hd)
    mean_j, logvar_j = notmiwae.encode(params, jnp.asarray(x),
                                       jnp.asarray(mask), cfg)
    np.testing.assert_allclose(np.asarray(mean_j), mu_t.numpy(), atol=1e-5)
    del logvar_j, logstd_t
    from vae_posterior_consistency_tpu.models import layers

    xm_j, xlv_j = layers.notmiwae_decoder_apply(params["decoder"],
                                                jnp.asarray(mu_t.numpy()),
                                                variant="changed")
    np.testing.assert_allclose(np.asarray(xm_j), xm_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xlv_j), xlv_t.numpy(), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(params["W"]).shape, (1, 1, OBS))


class _RefFlow(nn.Module):
    """Reference VAEFlow nets (src/models/VAE.py:1882-1916), hid=64."""

    HID = 64

    def __init__(self):
        super().__init__()
        H = self.HID
        act = nn.ELU
        self.seq_encoder = nn.Sequential(
            nn.Linear(2 * OBS, H), act(), nn.Linear(H, H), act(),
            nn.Linear(H, 100))
        self.encoder_mean = nn.Linear(H, LAT)     # dead head (VAE.py:1892)
        self.encoder_logvar = nn.Linear(H, LAT)   # dead head (VAE.py:1893)
        self.seq_decoder = nn.Sequential(
            nn.Linear(LAT, H), act(), nn.Linear(H, H), act(),
            nn.Linear(H, H), act(), nn.Linear(H, H), act())
        self.decoder_mean = nn.Sequential(nn.Linear(H, OBS), nn.Sigmoid())
        self.decoder_logvar = nn.Sequential(nn.Linear(H, OBS))
        # dead spline params: pdf comes from the context (VAE.py:1793)
        self.flows = nn.ModuleList()
        for _ in range(3):
            m = nn.Module()
            m.unnormalized_pdf = nn.Parameter(torch.randn(LAT, 10))
            self.flows.append(m)


def test_flow_roundtrip():
    ref = _RefFlow()
    cfg = RunConfig(vae_type="vanilla_flow1", latent_dim=LAT,
                    hid_dim=_RefFlow.HID)
    params = convert_state_dict(ref.state_dict(), cfg, OBS)

    x, mask = _rand_x_mask(4)
    with torch.no_grad():
        ctx_t = ref.seq_encoder(
            torch.from_numpy(np.concatenate([x * mask, mask], axis=1)))
        z = torch.randn(B, LAT)
        hd = ref.seq_decoder(z)
        xm_t = ref.decoder_mean(hd)
    from vae_posterior_consistency_tpu.models import layers

    ctx_j = layers.flow_context_encoder_apply(params["encoder"],
                                              jnp.asarray(x),
                                              jnp.asarray(mask))
    xm_j, xlv_j = flow_vae.decode(params, jnp.asarray(z.numpy()))
    np.testing.assert_allclose(np.asarray(ctx_j), ctx_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xm_j), xm_t.numpy(), atol=1e-5)
    assert np.allclose(np.asarray(xlv_j), layers.FLOW_OBS_LOGVAR)


def test_shape_mismatch_raises():
    ref = _RefDense()
    cfg = RunConfig(vae_type="vanilla_vae1", latent_dim=LAT + 1)
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_state_dict(ref.state_dict(), cfg, OBS)


def test_notmiwae_linear_logits_mapping():
    """The reference's 'linear' missing-process Linear is `self.logits =
    nn.Sequential(nn.Linear(D, D))` (VAE.py:2176,2371,2552) -> state_dict key
    logits.0.*; it must land in params['logits_lin'] with the weight
    transposed, not silently stay at fresh init."""
    ref = _RefNotMIWAE()
    ref.logits = nn.Sequential(nn.Linear(OBS, OBS))
    cfg = RunConfig(vae_type="reg_notMIWAE1", latent_dim=LAT)
    params = convert_state_dict(ref.state_dict(), cfg, OBS)
    np.testing.assert_allclose(
        np.asarray(params["logits_lin"]["w"]),
        ref.logits[0].weight.detach().numpy().T, atol=1e-6)


def test_unconsumed_keys_raise():
    """A state_dict tensor no converter consumes must be a hard error, not a
    silent drop of trained weights."""
    ref = _RefDense()
    sd = dict(ref.state_dict())
    sd["mystery.0.weight"] = torch.randn(3, 3)
    cfg = RunConfig(vae_type="vanilla_vae1", latent_dim=LAT)
    with pytest.raises(ValueError, match="not consumed"):
        convert_state_dict(sd, cfg, OBS)


def test_reverse_export_roundtrip_dense():
    """ours -> reference state_dict loads strict=True into the reference
    naming and roundtrips values exactly."""
    from tools.convert_reference_checkpoint import export_state_dict

    ref = _RefDense()
    cfg = RunConfig(vae_type="vanilla_vae1", latent_dim=LAT)
    params = convert_state_dict(ref.state_dict(), cfg, OBS)
    sd = export_state_dict(params, cfg, OBS)
    ref2 = _RefDense()
    ref2.load_state_dict(sd, strict=True)
    for k, v in ref.state_dict().items():
        np.testing.assert_allclose(sd[k].numpy(), v.numpy(), atol=1e-6)


def test_reverse_export_roundtrip_notmiwae_reg():
    from tools.convert_reference_checkpoint import export_state_dict

    ref = _RefNotMIWAE()
    ref.logits = nn.Sequential(nn.Linear(OBS, OBS))
    cfg = RunConfig(vae_type="reg_notMIWAE1", latent_dim=LAT)
    params = convert_state_dict(ref.state_dict(), cfg, OBS)
    sd = export_state_dict(params, cfg, OBS)
    for k, v in ref.state_dict().items():
        np.testing.assert_allclose(sd[k].to(v.dtype).numpy(), v.numpy(),
                                   atol=1e-6, err_msg=k)


def test_reverse_export_flow_strict_load():
    """The flow export must include every registered reference param so
    strict load succeeds (dead heads at neutral defaults)."""
    from tools.convert_reference_checkpoint import export_state_dict

    ref = _RefFlow()
    ref.prior_mean = nn.Parameter(torch.zeros(LAT), requires_grad=False)
    ref.prior_std = nn.Parameter(torch.ones(LAT), requires_grad=False)
    cfg = RunConfig(vae_type="vanilla_flow1", latent_dim=LAT,
                    hid_dim=_RefFlow.HID)
    params = convert_state_dict(ref.state_dict(), cfg, OBS)
    sd = export_state_dict(params, cfg, OBS)
    ref2 = _RefFlow()
    ref2.prior_mean = nn.Parameter(torch.zeros(LAT), requires_grad=False)
    ref2.prior_std = nn.Parameter(torch.ones(LAT), requires_grad=False)
    ref2.load_state_dict(sd, strict=True)
    np.testing.assert_allclose(
        sd["seq_encoder.0.weight"].numpy(),
        ref.state_dict()["seq_encoder.0.weight"].numpy(), atol=1e-6)
