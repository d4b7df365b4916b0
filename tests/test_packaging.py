"""Pins the installed-layout packaging metadata (pyproject.toml) against the
on-disk repo layout.

The reference ships no packaging at all (SURVEY.md §0: no requirements file,
no build system); the framework's pyproject maps three top-level directories
into one importable package and exposes the reference's CLI drivers
(reference: src/experiment_main/*.py, run.sh:1-3) as console scripts. These
tests keep the metadata honest as the layout evolves — every listed package
must exist, every console-script target must resolve to a callable, and the
native C++ source must travel inside the wheel so the on-demand build
(data/native_io.py) works from site-packages.
"""

import importlib
import os
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def _pkg_dir(pyproject, pkg):
    """Resolve a dotted package name to its on-disk directory via the
    package-dir mapping (longest-prefix match, setuptools semantics)."""
    mapping = pyproject["tool"]["setuptools"]["package-dir"]
    parts = pkg.split(".")
    for n in range(len(parts), 0, -1):
        prefix = ".".join(parts[:n])
        if prefix in mapping:
            return os.path.join(REPO, mapping[prefix], *parts[n:])
    return os.path.join(REPO, *parts)


def test_listed_packages_exist(pyproject):
    for pkg in pyproject["tool"]["setuptools"]["packages"]:
        d = _pkg_dir(pyproject, pkg)
        assert os.path.isfile(os.path.join(d, "__init__.py")), (pkg, d)


def test_every_subpackage_is_listed(pyproject):
    """A new subdirectory with an __init__.py must be added to the packages
    list or the wheel silently drops it."""
    listed = set(pyproject["tool"]["setuptools"]["packages"])
    root = os.path.join(REPO, "vae_posterior_consistency_tpu")
    for entry in sorted(os.listdir(root)):
        sub = os.path.join(root, entry)
        if os.path.isfile(os.path.join(sub, "__init__.py")):
            assert f"vae_posterior_consistency_tpu.{entry}" in listed, entry


def test_console_scripts_resolve(pyproject):
    """Each console-script target imports and exposes a callable. In the repo
    checkout the experiment_main package is importable top-level; installed it
    is vae_posterior_consistency_tpu.experiment_main (same modules — the
    package-dir mapping)."""
    scripts = pyproject["project"]["scripts"]
    assert set(scripts) == {
        "vpc-impute", "vpc-impute-mnar", "vpc-active-learning", "vpc-ais",
    }
    for target in scripts.values():
        modpath, func = target.split(":")
        prefix = "vae_posterior_consistency_tpu.experiment_main."
        assert modpath.startswith(prefix), target
        mod = importlib.import_module(
            "experiment_main." + modpath[len(prefix):]
        )
        assert callable(getattr(mod, func))


def test_native_source_ships_in_wheel(pyproject):
    data = pyproject["tool"]["setuptools"]["package-data"]
    assert "*.cpp" in data["vae_posterior_consistency_tpu.native"]
    assert os.path.isfile(os.path.join(REPO, "native", "vpc_io.cpp"))
    assert os.path.isfile(os.path.join(REPO, "native", "__init__.py"))


def test_declared_deps_cover_hard_imports(pyproject):
    """jax/numpy/optax are unconditional imports in the package; torch and
    orbax must stay lazy (optional extras)."""
    deps = " ".join(pyproject["project"]["dependencies"])
    for need in ("jax", "numpy", "optax"):
        assert need in deps, need
    extras = pyproject["project"]["optional-dependencies"]
    assert "torch" in extras and "orbax" in extras


def test_native_so_location(tmp_path, monkeypatch):
    """Build target sits beside the source when writable, else under the
    user cache (installed site-packages are often read-only)."""
    from vae_posterior_consistency_tpu.data import native_io

    src = tmp_path / "native" / "vpc_io.cpp"
    src.parent.mkdir()
    src.write_text("// stub")
    assert native_io._resolve_so(str(src)) == str(
        tmp_path / "native" / "libvpc_io.so"
    )
    src.parent.chmod(0o555)
    try:
        ro = native_io._resolve_so(str(src))
    finally:
        src.parent.chmod(0o755)
    if os.access(str(src.parent), os.W_OK):  # running as root: W_OK anyway
        pytest.skip("cannot drop write access under this uid")
    assert ro.endswith(os.path.join(".cache", "vpc_io", "libvpc_io.so"))


def test_src_resolution_prefers_repo_layout():
    from vae_posterior_consistency_tpu.data import native_io

    assert native_io._SRC == os.path.join(REPO, "native", "vpc_io.cpp")
    # installed-layout candidate is the in-package copy
    assert native_io._SRC_CANDIDATES[1].endswith(
        os.path.join("vae_posterior_consistency_tpu", "native", "vpc_io.cpp")
    )
