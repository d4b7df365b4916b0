"""The vae_type master-switch contract: substring-precedence dispatch,
split-digit extraction, suffix flags, and the registry's family routing —
the reference factory's behavior (src/utils/loaders.py:13-246) that every
engine, loader, and checkpoint path keys off. CLAUDE.md design invariant:
'keep the reference's substring-precedence order'."""

import pytest

from vae_posterior_consistency_tpu.config import RunConfig, parse_vae_type
from vae_posterior_consistency_tpu.models import get_model

#: every reference grid vae_type (+ the dead-variant spellings the parity
#: harness drives) -> (family, regularized, split_index)
EXPECTED = {
    "reg_vae1": ("reg_vae", True, "1"),
    "reg_vae2_mask_augm": ("reg_vae", True, "2"),
    "vanilla_vae3": ("vanilla_vae", False, "3"),
    "vanilla_vae1_mask_augm": ("vanilla_vae", False, "1"),
    "vanilla_vae2_with_drop": ("vanilla_vae", False, "2"),
    "vanilla_vae1_with_drop_mask_augm": ("vanilla_vae", False, "1"),
    "reg_EDDI1": ("reg_EDDI", True, "1"),
    "vanilla_EDDI2": ("vanilla_EDDI", False, "2"),
    "vanilla_EDDI3_with_drop": ("vanilla_EDDI", False, "3"),
    "reg_EDDI_mnist1": ("reg_EDDI", True, "1"),
    "vanilla_EDDI_mnist1": ("vanilla_EDDI", False, "1"),
    # `flow` BEATS `reg_vae`/`vanilla_vae` (loaders.py:19 checks flow first)
    "reg_flow1": ("reg_flow", True, "1"),
    "vanilla_flow2": ("vanilla_flow", False, "2"),
    "reg_notMIWAE1": ("reg_notMIWAE", True, "1"),
    "vanilla_notMIWAE1": ("vanilla_notMIWAE", False, "1"),
    "reg_MIWAE3": ("reg_MIWAE", True, "3"),
    "vanilla_MIWAE1": ("MIWAE", False, "1"),  # fallback family
}


def test_substring_precedence_and_flags():
    for vt, (family, reg, idx) in EXPECTED.items():
        info = parse_vae_type(vt)
        assert info.family == family, vt
        assert info.regularized is reg, vt
        assert info.split_index == idx, vt
        assert info.mask_augmented == ("mask_augm" in vt), vt
        assert info.with_drop == ("with_drop" in vt), vt
    # anything unrecognized falls back to MIWAE (loaders.py:234-245)
    assert parse_vae_type("mystery_model7").family == "MIWAE"
    # first digit wins (loaders.py:322), even with later digits present
    assert parse_vae_type("reg_vae12").split_index == "1"


def test_registry_family_routing():
    """get_model routes each family to the right implementation and flips
    uses_p_branch off for vanilla variants."""
    cases = {
        "reg_vae1": ("gauss", True),
        "vanilla_EDDI1": ("gauss", False),
        "reg_flow1": ("flow", True),
        "vanilla_flow1": ("flow", False),
        "reg_MIWAE1": ("miwae", True),
        "vanilla_MIWAE1": ("miwae", False),
        "reg_notMIWAE1": ("notmiwae", True),
        "vanilla_notMIWAE1": ("notmiwae", False),
    }
    for vt, (name, p_branch) in cases.items():
        model = get_model(RunConfig(vae_type=vt))
        assert model.name == name, vt
        assert model.uses_p_branch is p_branch, vt
    # MIWAE families use the 3-tuple llh_eval contract
    assert get_model(RunConfig(vae_type="reg_MIWAE1")).eval_kind == "miwae"
    assert get_model(RunConfig(vae_type="reg_vae1")).eval_kind == "vae"


def test_compute_dtype_validation_and_wrapper_equality():
    with pytest.raises(ValueError, match="compute_dtype"):
        get_model(RunConfig(vae_type="reg_vae1", compute_dtype="bf16"))
    # memoized dtype wrapper: repeated get_model calls return EQUAL defs
    # (the engine program caches compare models by equality)
    a = get_model(RunConfig(vae_type="reg_vae1", compute_dtype="bfloat16"))
    b = get_model(RunConfig(vae_type="reg_vae1", compute_dtype="bfloat16"))
    assert a == b
    assert a != get_model(RunConfig(vae_type="reg_vae1"))
