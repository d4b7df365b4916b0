"""Convert reference torch checkpoints into framework parameter pytrees.

Lets a user of the reference (`stschia/VAE-posterior-consistency`) bring an
already-trained model across: point this tool at a `state_dict` saved by the
reference's training loop (src/experiment_main/train.py:120-131) and it emits
the equivalent framework checkpoint, loadable by `engine/checkpoint.py` /
`model_loader`-style reload — no retraining needed.

Key mapping (torch module attribute names -> framework pytree, per family):

  gauss dense / dense_mask (reference: src/models/VAE.py:366-379, 526-537)
    seq_encoder.{0,2,4}        -> params['encoder'].layer{0,1,2}
    seq_decoder.{0,2,4}        -> params['decoder'].layer{0,1,2}
  gauss pointnet/EDDI (reference: VAE.py:27-52, 687-708)
    pnp_encoder1.0             -> params['encoder']['pnp1'].layer0
    pnp_encoder2.{0,2,..}      -> params['encoder']['pnp2'].layer{i}
    type_pars1 / type_bias1    -> params['encoder']['type_pars'/'type_bias']
    seq_decoder.{0,2,..}       -> params['decoder'].layer{i}
  miwae (reference: VAE.py:3026-3041)
    seq_encoder.{0,2,4}        -> params['encoder'].layer{0,1,2}
    seq_decoder.{0,2,4}        -> params['decoder'].layer{0,1,2}
  notmiwae, both variants (reference: VAE.py:2342-2368, 2706-2741, 2865-2931)
    seq_encoder.{0,2}          -> params['encoder']['trunk'].layer{0,1}
    q_mu.0 / q_logstd.0        -> params['encoder']['q_mu'/'q_logstd'].layer0
    seq_decoder.{0,2}          -> params['decoder']['trunk'].layer{0,1}
    x_mean.0                   -> params['decoder']['x_mean'].layer0
    x_logvar.0 | x_std.0       -> params['decoder']['x_logvar'].layer0
    W / b                      -> params['W'/'b']   (missing-process params)
  flow (reference: VAE.py:1882-1916)
    seq_encoder.{0,2,4}        -> params['encoder'].layer{0,1,2}
    seq_decoder.{0,2,4,6}      -> params['decoder']['trunk'].layer{0..3}
    decoder_mean.0             -> params['decoder']['mean'].layer0
    decoder_logvar.0           -> params['decoder']['logvar'].layer0

torch `nn.Linear.weight` is [out, in]; the framework's `dense` is y = x@W + b
with W [in, out], so every weight transposes. Parameters the reference
creates but never uses on any live path are skipped with a notice:
`encoder_mean`/`encoder_logvar` (flow, dead heads — VAE.py:1892-1893) and
`flows.{i}.unnormalized_pdf` (the spline PDF comes from the conditioning
context instead — VAE.py:1793), plus registered constants (`prior_mean`,
`prior_std`).

Usage:
  PYTHONPATH=. python3 tools/convert_reference_checkpoint.py \
      --checkpoint <reference .pt> --vae_type reg_vae1 [--data_type wine] \
      --out <framework checkpoint path>
If --out is omitted, the framework's reference-mangled checkpoint path for
this config is used (so the converted model is picked up by stage='test'
flows automatically).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _np(t):
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _linear(sd, prefix):
    """One torch nn.Linear -> framework dense params (weight transposed)."""
    return {"w": _np(sd[f"{prefix}.weight"]).T, "b": _np(sd[f"{prefix}.bias"])}


def _seq_mlp(sd, prefix):
    """A torch nn.Sequential of Linears (+activations) -> mlp_init-style tree.

    Sequential indices of the Linear modules (0, 2, 4, ...) are discovered from
    the present keys and renumbered densely as layer0, layer1, ...
    """
    idxs = sorted(
        int(k[len(prefix) + 1:].split(".")[0])
        for k in sd
        if k.startswith(prefix + ".") and k.endswith(".weight")
    )
    if not idxs:
        raise KeyError(f"no Linear weights under '{prefix}.*' in state_dict")
    return {f"layer{j}": _linear(sd, f"{prefix}.{i}")
            for j, i in enumerate(idxs)}


def _convert_gauss(sd, cfg):
    if "EDDI" in cfg.vae_type or "mnist" in cfg.vae_type:
        encoder = {
            "pnp1": _seq_mlp(sd, "pnp_encoder1"),
            "pnp2": _seq_mlp(sd, "pnp_encoder2"),
            "type_pars": _np(sd["type_pars1"]),
            "type_bias": _np(sd["type_bias1"]),
        }
    else:
        encoder = _seq_mlp(sd, "seq_encoder")
    return {"encoder": encoder, "decoder": _seq_mlp(sd, "seq_decoder")}


def _convert_miwae(sd, cfg):
    del cfg
    return {"encoder": _seq_mlp(sd, "seq_encoder"),
            "decoder": _seq_mlp(sd, "seq_decoder")}


def _convert_notmiwae(sd, cfg):
    del cfg
    # author variant parameterizes the observation std (softplus head named
    # x_std); the framework computes logvar = log(std^2) from the same Linear,
    # so the weights map to the x_logvar slot either way (VAE.py:2889, 2924-2928)
    x_logvar_prefix = "x_std" if "x_std.0.weight" in sd else "x_logvar"
    params = {
        "encoder": {
            "trunk": _seq_mlp(sd, "seq_encoder"),
            "q_mu": _seq_mlp(sd, "q_mu"),
            "q_logstd": _seq_mlp(sd, "q_logstd"),
        },
        "decoder": {
            "trunk": _seq_mlp(sd, "seq_decoder"),
            "x_mean": _seq_mlp(sd, "x_mean"),
            "x_logvar": _seq_mlp(sd, x_logvar_prefix),
        },
        "W": _np(sd["W"]),
        "b": _np(sd["b"]),
    }
    # the reference's 'linear' missing-process Linear lives in
    # `self.logits = nn.Sequential(nn.Linear(D, D))` (VAE.py:2176, 2371,
    # 2552) -> state_dict keys logits.0.weight / logits.0.bias
    if "logits.0.weight" in sd:
        params["logits_lin"] = _linear(sd, "logits.0")
    return params


def _convert_flow(sd, cfg):
    del cfg
    skipped = [k for k in sd
               if k.startswith(("encoder_mean", "encoder_logvar", "flows.",
                                "flow.", "prior_"))]
    if skipped:
        print(f"note: skipping {len(skipped)} dead reference params "
              f"(unused on any live path): {sorted(skipped)[:4]}...")
    return {
        "encoder": _seq_mlp(sd, "seq_encoder"),
        "decoder": {
            "trunk": _seq_mlp(sd, "seq_decoder"),
            "mean": _seq_mlp(sd, "decoder_mean"),
            "logvar": _seq_mlp(sd, "decoder_logvar"),
        },
    }


_CONVERTERS = {
    "gauss": _convert_gauss,
    "miwae": _convert_miwae,
    "notmiwae": _convert_notmiwae,
    "flow": _convert_flow,
}


def convert_state_dict(sd, cfg, obs_dim: int):
    """Reference torch state_dict -> framework param pytree (numpy leaves).

    Validates the result against a freshly-initialized template: same tree
    structure, same leaf shapes.
    """
    import jax

    from vae_posterior_consistency_tpu.models import get_model

    class _TrackedDict(dict):
        """Records which state_dict keys the converter actually consumed, so
        key-mapping gaps fail loudly instead of silently dropping weights."""

        def __init__(self, *a):
            super().__init__(*a)
            self.consumed = set()

        def __getitem__(self, k):
            self.consumed.add(k)
            return super().__getitem__(k)

    sd = _TrackedDict(sd)
    model = get_model(cfg)
    fn = _CONVERTERS[model.name]
    params = fn(sd, cfg)

    # registered-but-dead reference params that legitimately stay behind
    # (cited in the module docstring)
    dead_ok = ("encoder_mean", "encoder_logvar", "flows.", "flow.",
               "prior_") if model.name == "flow" else ("prior_",)
    unconsumed = [k for k in sd if k not in sd.consumed
                  and not k.startswith(dead_ok)]
    if unconsumed:
        raise ValueError(
            "reference state_dict tensors not consumed by the converter "
            f"(key-mapping gap, trained weights would be dropped): "
            f"{sorted(unconsumed)}"
        )

    template = model.init(jax.random.PRNGKey(0), cfg, obs_dim)
    t_leaves = jax.tree_util.tree_flatten_with_path(template)[0]
    p_flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    # converted checkpoints may legitimately omit never-trained leaves (e.g.
    # notmiwae logits_lin under selfmasking) — fill those from the template
    missing = [kp for kp, _ in t_leaves if kp not in p_flat]
    for kp, leaf in t_leaves:
        if kp in p_flat:
            got = np.shape(p_flat[kp])
            want = np.shape(leaf)
            if got != want:
                raise ValueError(
                    f"shape mismatch at {jax.tree_util.keystr(kp)}: "
                    f"converted {got} vs model {want}"
                )
    if missing:
        print(f"note: {len(missing)} leaves not in the reference checkpoint, "
              f"kept at fresh init: "
              f"{[jax.tree_util.keystr(k) for k in missing]}")

        def merge(kp, leaf):
            return p_flat.get(kp, leaf)

        params = jax.tree_util.tree_map_with_path(merge, template)
    extra = [k for k in p_flat if k not in dict(t_leaves)]
    if extra:
        raise ValueError(f"converted leaves unknown to the model: {extra}")
    return params


def _rev_linear(sd, prefix, leaf):
    import torch

    sd[f"{prefix}.weight"] = torch.from_numpy(
        np.asarray(leaf["w"], np.float32).T.copy())
    sd[f"{prefix}.bias"] = torch.from_numpy(
        np.asarray(leaf["b"], np.float32).copy())


def _rev_seq_mlp(sd, prefix, tree):
    # reference Sequentials interleave one activation per Linear, so Linear j
    # sits at Sequential index 2j in every class (VAE.py:366-376, 687-698,
    # 2342-2368, 3026-3041, 1882-1916)
    for j in range(len(tree)):
        _rev_linear(sd, f"{prefix}.{2 * j}", tree[f"layer{j}"])


def export_state_dict(params, cfg, obs_dim: int):
    """Framework param pytree -> reference-named torch state_dict (the inverse
    of convert_state_dict), loadable by the reference's own classes with
    strict=True. Dead-but-registered reference params (flow's encoder_mean /
    encoder_logvar / flows.*.unnormalized_pdf / prior buffers) are emitted at
    neutral defaults so strict loading succeeds."""
    import jax
    import torch

    from vae_posterior_consistency_tpu.models import get_model

    model = get_model(cfg)
    params = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    sd = {}
    if model.name == "gauss":
        enc = params["encoder"]
        if "pnp1" in enc:
            _rev_seq_mlp(sd, "pnp_encoder1", enc["pnp1"])
            _rev_seq_mlp(sd, "pnp_encoder2", enc["pnp2"])
            sd["type_pars1"] = torch.from_numpy(enc["type_pars"].copy())
            sd["type_bias1"] = torch.from_numpy(enc["type_bias"].copy())
        else:
            _rev_seq_mlp(sd, "seq_encoder", enc)
        _rev_seq_mlp(sd, "seq_decoder", params["decoder"])
    elif model.name == "miwae":
        _rev_seq_mlp(sd, "seq_encoder", params["encoder"])
        _rev_seq_mlp(sd, "seq_decoder", params["decoder"])
    elif model.name == "notmiwae":
        _rev_seq_mlp(sd, "seq_encoder", params["encoder"]["trunk"])
        _rev_seq_mlp(sd, "q_mu", params["encoder"]["q_mu"])
        _rev_seq_mlp(sd, "q_logstd", params["encoder"]["q_logstd"])
        _rev_seq_mlp(sd, "seq_decoder", params["decoder"]["trunk"])
        _rev_seq_mlp(sd, "x_mean", params["decoder"]["x_mean"])
        # author variant names its observation head x_std (VAE.py:2889)
        head = "x_std" if getattr(cfg, "not_miwae_type",
                                  "changed") == "author" else "x_logvar"
        _rev_seq_mlp(sd, head, params["decoder"]["x_logvar"])
        sd["W"] = torch.from_numpy(params["W"].copy())
        sd["b"] = torch.from_numpy(params["b"].copy())
        if cfg.info.regularized:
            # REG classes register logits regardless of missing_process
            # (VAE.py:2176, 2371, 2552), as float64 (.double())
            _rev_linear(sd, "logits.0", params["logits_lin"])
            sd["logits.0.weight"] = sd["logits.0.weight"].double()
            sd["logits.0.bias"] = sd["logits.0.bias"].double()
    elif model.name == "flow":
        _rev_seq_mlp(sd, "seq_encoder", params["encoder"])
        _rev_seq_mlp(sd, "seq_decoder", params["decoder"]["trunk"])
        _rev_seq_mlp(sd, "decoder_mean", params["decoder"]["mean"])
        _rev_seq_mlp(sd, "decoder_logvar", params["decoder"]["logvar"])
        # dead-but-registered params (VAE.py:1892-1893, 1822-1825, 1919-1920)
        L, H = cfg.latent_dim, cfg.hid_dim
        sd["encoder_mean.weight"] = torch.zeros(L, H)
        sd["encoder_mean.bias"] = torch.zeros(L)
        sd["encoder_logvar.weight"] = torch.zeros(L, H)
        sd["encoder_logvar.bias"] = torch.zeros(L)
        for i in range(3):
            sd[f"flows.{i}.unnormalized_pdf"] = torch.zeros(L, 10)
        sd["prior_mean"] = torch.zeros(L)
        sd["prior_std"] = torch.ones(L)
    else:  # pragma: no cover
        raise NotImplementedError(model.name)
    del obs_dim
    return sd


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="reference torch state_dict (.pt); with --reverse, "
                         "a framework checkpoint instead")
    ap.add_argument("--reverse", action="store_true",
                    help="export a framework checkpoint back to a reference "
                         "torch state_dict")
    ap.add_argument("--vae_type", required=True)
    ap.add_argument("--data_type", default="wine")
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--p_missingness", type=int, default=30)
    ap.add_argument("--reg_type", default="kl_reg")
    ap.add_argument("--missing_rate", type=int, default=30)
    ap.add_argument("--obs_dim", type=int, required=True)
    # architecture sizes must match how the reference checkpoint was trained
    ap.add_argument("--latent_dim", type=int, default=10)
    ap.add_argument("--K", type=int, default=10,
                    help="EDDI embedding width")
    ap.add_argument("--hid_dim", type=int, default=500,
                    help="flow trunk width")
    ap.add_argument("--not_miwae_type", default="changed",
                    choices=["changed", "author"])
    ap.add_argument("--out", default=None,
                    help="output path (default: framework-mangled path)")
    args = ap.parse_args()

    # conversion is pure host work — never touch (or wait on) an accelerator
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    import torch

    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.engine import checkpoint as ckpt

    cfg = RunConfig(vae_type=args.vae_type, data_type=args.data_type,
                    alpha=args.alpha, p_missingness=args.p_missingness,
                    reg_type=args.reg_type, missing_rate=args.missing_rate,
                    latent_dim=args.latent_dim, K=args.K,
                    hid_dim=args.hid_dim,
                    not_miwae_type=args.not_miwae_type)
    if args.reverse:
        from vae_posterior_consistency_tpu.models import get_model

        model = get_model(cfg)
        template = model.init(jax.random.PRNGKey(0), cfg, args.obs_dim)
        params = ckpt.load(template, args.checkpoint)
        sd = export_state_dict(params, cfg, args.obs_dim)
        out = args.out or (args.checkpoint + ".reference.pt")
        parent = os.path.dirname(out)
        if parent:
            os.makedirs(parent, exist_ok=True)
        torch.save(sd, out)
        print(f"exported framework checkpoint -> {out} "
              f"({len(sd)} reference-named torch tensors)")
        return
    sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = convert_state_dict(sd, cfg, args.obs_dim)
    out = args.out or ckpt.checkpoint_path(cfg)
    ckpt.save(params, out)  # save() creates parent dirs
    n = sum(int(np.size(x)) for x in jax.tree_util.tree_leaves(params))
    print(f"converted {len(sd)} torch tensors -> {out} ({n} parameters)")


if __name__ == "__main__":
    main()
