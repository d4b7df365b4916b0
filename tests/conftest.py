"""Test fixtures: force CPU with 8 virtual devices so mesh/sharding logic is
exercised without TPU hardware (SURVEY.md §4 test plan)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pin an experimental TPU platform plugin via JAX_PLATFORMS
# (which overrides the env var at import); force CPU through the config API —
# the reliable override for plugin-registered platforms.
jax.config.update("jax_platforms", "cpu")
# pin threefry so golden values stay bit-reproducible (production default is
# 'rbg' — see RunConfig.rng_impl)
jax.config.update("jax_default_prng_impl", "threefry2x32")
# persistent compile cache: the suite is compile-dominated on this 1-vCPU
# host (top tests spend ~80% of their time in XLA CPU compilation of the
# same programs every run); cache entries are keyed on jax version +
# backend + HLO, so staleness self-invalidates. Override via
# VPC_TEST_COMPILE_CACHE=
import os as _os  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get("VPC_TEST_COMPILE_CACHE", "/tmp/vpc_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_dataset(tmp_path_factory):
    """Generate the synth_small artifact set once per session."""
    root = tmp_path_factory.mktemp("Data")
    from vae_posterior_consistency_tpu.data import generate

    generate.generate_uci(str(root), "synth_small", seed=7)
    return str(root)


@pytest.fixture()
def batch():
    key = jax.random.PRNGKey(42)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.uniform(k1, (16, 7))
    mask = (jax.random.uniform(k2, (16, 7)) < 0.7).astype(jnp.float32)
    mask_p = mask * (jax.random.uniform(k3, (16, 7)) < 0.7).astype(jnp.float32)
    return x, mask, mask_p
