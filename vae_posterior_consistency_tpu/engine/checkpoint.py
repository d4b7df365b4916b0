"""Parameter checkpointing with reference-compatible path mangling.

The reference reloads checkpoints by reconstructing the exact mangled filename
from the run hyper-parameters (reference: src/experiment_main/train.py:120-131
for save; src/utils/loaders.py:30-36 and 9 sibling blocks for load). We keep the
same `experiments/<experiment_type>/<data_type>/checkpoints/<family>/<name>.pt`
layout and names so artifacts interoperate; contents are a flat dict of numpy
arrays (the params pytree) serialized with torch.save.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from vae_posterior_consistency_tpu.config import RunConfig


def family_dir(vae_type: str) -> str:
    """Digit-stripped first-two-words family directory
    (reference: src/experiment_main/train.py:122-124)."""
    return "".join(
        c for c in "_".join(vae_type.split("_")[:2]) if not c.isdigit()
    )


def checkpoint_path(cfg: RunConfig, root: str = "experiments") -> str:
    """Exact reference checkpoint filename (src/experiment_main/train.py:120-131)."""
    base = os.path.join(
        root, cfg.experiment_type, cfg.data_type, "checkpoints",
        family_dir(cfg.vae_type),
    )
    if "vanilla" in cfg.vae_type:
        name = (
            f"checkpoint_{cfg.vae_type}_{cfg.missing_rate}_missing_rate_test.pt"
        )
    else:
        name = (
            f"checkpoint_{cfg.vae_type}_{cfg.alpha}_{cfg.p_missingness}_"
            f"{cfg.reg_type}_{cfg.missing_rate}_missing_rate_full_reg_test.pt"
        )
    return os.path.join(base, name)


def _flatten(params) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save(params, path: str) -> None:
    import torch

    parent = os.path.dirname(path)
    if parent:  # bare filenames save into cwd; makedirs('') would raise
        os.makedirs(parent, exist_ok=True)
    torch.save(_flatten(params), path)


def save_orbax(params, path: str) -> None:
    """Orbax backend: atomic, production-grade pytree checkpointing (the
    torch-pickle `save` keeps reference artifact-format parity; use this for
    durable training state)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), jax.device_get(params), force=True)


def load_orbax(template_params, path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    # re-attach the template's tree structure (orbax restores plain nests)
    leaves = jax.tree_util.tree_leaves(restored)
    treedef = jax.tree_util.tree_structure(template_params)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load(template_params, path: str):
    """Load into the structure of `template_params` (from a fresh `init`)."""
    import torch

    flat = torch.load(path, map_location="cpu", weights_only=False)
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(template_params)
    new_leaves = []
    for path_elems, leaf in leaves_paths:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path_elems
        )
        arr = np.asarray(flat[key])
        if arr.shape != leaf.shape:
            raise ValueError(
                f"checkpoint leaf {key!r} has shape {arr.shape}, expected {leaf.shape}"
            )
        # leaf.dtype, not np.asarray(leaf).dtype: asarray would device_get
        # every template leaf (3x model size x S replicas for a stacked
        # ensemble resume) just to read a dtype
        dtype = leaf.dtype if hasattr(leaf, "dtype") else np.asarray(leaf).dtype
        new_leaves.append(arr.astype(dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_many(pairs) -> None:
    """Write [(params, path)] checkpoints through a small thread pool.

    The ensemble suites' save bucket was a serial torch.save per replica
    (VERDICT r4 item 4); the pickle bytes are GIL-bound but the file
    flushes overlap. Callers pass HOST pytrees (one stacked device_get for
    the whole ensemble, sliced per replica on host) so no device
    dispatch/transfer round-trip is paid per replica. Joins before
    returning so suite `[timing]` lines still account for the writes."""
    pairs = list(pairs)
    if len(pairs) <= 1:
        for p, path in pairs:
            save(p, path)
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as pool:
        futs = [pool.submit(save, p, path) for p, path in pairs]
        for f in futs:
            f.result()


def _tag_hash(tag: str) -> np.int64:
    import zlib

    return np.int64(zlib.crc32(tag.encode("utf-8")))


def save_resume(params, opt_state, epoch: int, path: str,
                tag: str = "") -> None:
    """Write mid-training restart state — (params, optimizer state, epochs
    done) — in one atomic-enough `.resume.pt` file. ONE contract for every
    engine: the serial runner (engine/train.train), the stacked-pytree
    ensembles (parallel/sweep) and the sharded loop
    (parallel/train_parallel.train_sharded) all write this layout, so a run
    killed mid-flight resumes bit-identically regardless of which engine
    produced the file (the reference can only save at the END of training —
    src/experiment_main/train.py:120-131; restartability intent:
    src/utils/pytorchtools.py:51-58).

    `tag` is the run's sweep IDENTITY (the row VALUES — seeds/alphas/
    missing rates — not just their counts, which is all the filename
    encodes): its hash is stored and verified on load, so `-resume true`
    after changing sweep values fails loudly instead of silently
    continuing a mismatched half-trained state under the new labels.

    The write goes to `path + '.tmp'` first and renames into place: a crash
    DURING checkpointing must not destroy the previous good resume file."""
    import os

    import jax.numpy as jnp

    tmp = path + ".tmp"
    save({"params": params, "opt_state": opt_state,
          "epoch": jnp.asarray(epoch, jnp.int32),
          "tag": _tag_hash(tag)}, tmp)
    os.replace(tmp, path)


def load_resume(template_params, template_opt_state, path: str,
                tag: str = "", max_epochs: int | None = None):
    """Read a `save_resume` file back into (params, opt_state, epochs_done),
    shaped like the given templates. Raises RuntimeError with a recovery
    hint when the file's layout does not match this engine (e.g. written
    before the pytree-runner migration, or by a different config/shape), or
    when its identity tag differs from `tag` (same shapes, different sweep
    VALUES — e.g. `-alphas 0.5,1.0` resumed as `-alphas 1.0,2.0`), or when
    the file's epochs-done exceeds `max_epochs` (the filename encodes no
    epoch count, so without this guard a completed 3000-epoch run resumed
    under `-epoch 1000` would skip training entirely and publish the
    over-trained params under the smaller budget's labels)."""
    import pickle

    import numpy as _np

    template = {"params": template_params, "opt_state": template_opt_state,
                "epoch": _np.zeros((), _np.int32),
                "tag": _np.zeros((), _np.int64)}
    try:
        state = load(template, path)
    # only structural mismatches get the delete-the-file advice; genuine
    # I/O failures (OSError, MemoryError) propagate untouched — deleting a
    # good resume file over a transient read error would lose the run
    except (KeyError, ValueError, TypeError, pickle.UnpicklingError) as e:
        raise RuntimeError(
            f"cannot resume from {path}: its layout does not match this "
            "engine/config (files written before the pytree-runner "
            "migration stored a flat vector under a 'pflat' key; files "
            "written before round 5 carry no identity tag). Delete the "
            ".resume.pt to restart from scratch."
        ) from e
    if int(state["tag"]) != int(_tag_hash(tag)):
        raise RuntimeError(
            f"cannot resume from {path}: it was written by a run with "
            f"different sweep values than this one ({tag!r}). Delete the "
            ".resume.pt to restart from scratch, or rerun with the "
            "original sweep flags."
        )
    done = int(state["epoch"])
    if max_epochs is not None and done > max_epochs:
        raise RuntimeError(
            f"cannot resume from {path}: it has already trained {done} "
            f"epochs but this run asks for only {max_epochs}. Delete the "
            ".resume.pt to retrain from scratch at the smaller budget, or "
            "rerun with the original -epoch."
        )
    return state["params"], state["opt_state"], done


def seed_suffix(s: int) -> str:
    """Artifact suffix for seed replica s: '' for seed 0 (which keeps the
    reference artifact contract), '.seed{s}' for the extra replicas written
    by `-ensemble true -seeds N` runs."""
    return "" if s == 0 else f".seed{s}"


def load_seed_ensemble(cfg: RunConfig, model, obs_dim: int, n_seeds: int,
                       root: str = "experiments"):
    """Load the n_seeds seed-replica checkpoints of one config
    (checkpoint.pt + .seed{s} siblings from an `imputation.py -ensemble
    true -seeds N` run) stacked on a leading [S] axis — the params_ens
    layout every *_ensemble evaluator consumes. Raises FileNotFoundError
    with the missing path if a seed was never trained. The `.seed{s}`
    suffix contract lives HERE, next to the path mangling, so the
    ais_eval/active_learning entry points can't drift apart."""
    import jax.numpy as jnp

    template = model.init(jax.random.PRNGKey(0), cfg, obs_dim)
    base = checkpoint_path(cfg, root)
    replicas = [load(template, base + seed_suffix(s))
                for s in range(n_seeds)]
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *replicas)
