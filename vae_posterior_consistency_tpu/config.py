"""Run configuration: dataclasses + JSONL/argparse parity layer.

The reference drives every run from JSON-lines config files where each line maps
arg-name -> {type, default, help} and is bridged to argparse
(reference: src/utils/utils.py:177-189 `setup_parser`; entry scripts iterate the
JSONL records, reference: src/experiment_main/imputation.py:21-27). The `vae_type`
string is the master switch: model-family substring, an embedded digit selecting
the data split, and behavior suffixes `_mask_augm` / `_with_drop`
(reference: src/utils/loaders.py:19-246, 322; src/experiment_main/train.py:32-58).

This module reproduces that contract on top of typed dataclasses.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Any, Iterator


def str2bool(v: Any) -> bool:
    """Lenient bool parsing (reference: src/utils/utils.py:165-173)."""
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ("yes", "true", "t", "y", "1"):
        return True
    if s in ("no", "false", "f", "n", "0", ""):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def setup_parser(arguments: dict, title: str) -> argparse.ArgumentParser:
    """Build an argparse parser from a JSONL config record.

    Matches the reference contract (src/utils/utils.py:177-189): every key becomes
    a single-dash flag `-<name>` typed after its default, so CLI flags can override
    any config value.
    """
    parser = argparse.ArgumentParser(
        description=title, formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    for key, value in arguments.items():
        default = value["default"]
        typ = str2bool if isinstance(default, bool) else type(default)
        parser.add_argument(
            "-%s" % key, type=typ, help=value.get("help", ""), default=default
        )
    # framework extensions (not in the reference's JSONL schema):
    if "mesh" not in arguments:
        # device-mesh selection for the multi-chip engine. The reference is
        # hard-wired to one device (src/experiment_main/imputation.py:16).
        parser.add_argument(
            "-mesh", type=str, default="",
            help="device mesh: '' = single-chip engine, 'auto' = all devices "
                 "(dp x tp auto-factored), 'DP' or 'DP,TP' explicit",
        )
    if "ensemble" not in arguments:
        # grid-as-ensembles: train each family's 3 data splits as ONE vmapped
        # program (parallel/sweep.train_split_ensemble) instead of the
        # reference's serial record loop (imputation.py:21-22).
        parser.add_argument(
            "-ensemble", type=str2bool, default=False,
            help="train each family's split triple as one vmapped ensemble",
        )
    if "seeds" not in arguments:
        # ensemble-mode seed replication: train N seed replicas of every
        # config inside the SAME compiled split-ensemble program and report
        # mean +/- std per config (seed 0 keeps the reference artifact
        # contract; extra seeds save under checkpoint.seed{s} suffixes).
        parser.add_argument(
            "-seeds", type=int, default=1,
            help="seed replicas per config, run as one vmapped ensemble "
                 "program (error-barred metrics; on imputation.py requires "
                 "-ensemble true; active_learning.py/ais_eval.py load the "
                 ".seed{s} checkpoints those runs wrote)",
        )
    if "alphas" not in arguments:
        # regularization-strength sweep: overrides the entry points'
        # hard-coded ALPHA_SWEEP (the reference hard-codes `for alpha in
        # [1.0]`, src/experiment_main/imputation.py:24). On imputation.py
        # with -ensemble true, all alphas of a config train as ONE vmapped
        # replica program (parallel/sweep.train_alpha_ensemble).
        parser.add_argument(
            "-alphas", type=str, default="",
            help="comma-separated regularization strengths to sweep "
                 "(e.g. '0.5,1,2'); empty = the entry's default sweep",
        )
    if "missings" not in arguments:
        # p_missingness sweep: overrides the entry points' hard-coded
        # MISSING_SWEEP (the reference hard-codes `for missing in [30]`,
        # src/experiment_main/imputation.py:23). On imputation.py with
        # -ensemble true, all rates of a config train as ONE vmapped
        # replica program (parallel/sweep.train_sweep_ensemble), composing
        # with -alphas/-seeds/-mesh.
        parser.add_argument(
            "-missings", type=str, default="",
            help="comma-separated p_missingness rates to sweep "
                 "(e.g. '10,30,50'); empty = the entry's default sweep",
        )
    if "checkpoint_every" not in arguments:
        # mid-training restartability (the reference only saves at the END
        # of training, src/experiment_main/train.py:120-131). Applies to
        # the serial engine, the sharded engine, and every vmapped
        # ensemble program (the WHOLE stacked ensemble state checkpoints
        # as one atomic .resume.pt — engine/checkpoint.save_resume).
        parser.add_argument(
            "-checkpoint_every", type=int, default=0,
            help="write a mid-training .resume.pt every N epochs "
                 "(0 = end-of-training save only, the reference behavior)",
        )
    if "resume" not in arguments:
        parser.add_argument(
            "-resume", type=str2bool, default=False,
            help="restart from the .resume.pt written by a prior "
                 "-checkpoint_every run (bit-identical continuation)",
        )
    if "early_stop" not in arguments:
        # finally EARNS the config grid's `patience` field: the reference
        # ships patience=100 in every JSONL record and imports EarlyStopping
        # but never instantiates it (src/experiment_main/train.py:4,
        # src/utils/pytorchtools.py:5-58). Here the flag wires
        # utils.early_stopping into whichever engine the run uses — the
        # serial runner, the sharded loop, or a vmapped ensemble (per-replica
        # patience, EnsembleEarlyStopping). NOTE the cadence: patience counts
        # chunk-boundary validation CHECKS (one per chunk_epochs=200 epochs),
        # not epochs — at the reference's patience=100 x 3000-epoch defaults
        # it never triggers; pass e.g. -patience 3 for a real stop.
        parser.add_argument(
            "-early_stop", type=str2bool, default=False,
            help="enable patience-based early stopping (cfg.patience counts "
                 "chunk-boundary validation checks, one per ~200 epochs; "
                 "stops on plateau and keeps the best-check parameters)",
        )
    if "profile" not in arguments:
        # capture a jax.profiler trace of the run (view with
        # TensorBoard/Perfetto; utils/logging.profile_trace)
        parser.add_argument(
            "-profile", type=str, default="",
            help="write a jax.profiler trace of the run to this directory",
        )
    if title == "ais_eval" and "bdmc" not in arguments:
        # BDMC sandwich (engine/ais.bdmc): certify the AIS bridge by
        # bracketing log p on simulated data between the forward and
        # reverse bounds. The reference ships BDMC's schedule
        # (src/utils/AIS.py:65-77) but never the bidirectional bound.
        parser.add_argument(
            "-bdmc", type=str2bool, default=False,
            help="also run the BDMC lower/upper sandwich on simulated data "
                 "to certify the AIS schedule (forward + reverse AIS)",
        )
    return parser


def maybe_profile(args):
    """Context manager: a jax.profiler trace when `-profile DIR` was passed,
    else a no-op (the reference has no profiling story at all — SURVEY §5)."""
    import contextlib

    from vae_posterior_consistency_tpu.utils.logging import profile_trace

    spec = getattr(args, "profile", "") or ""
    if spec:
        print(f"[profile] tracing to {spec}", flush=True)
        return profile_trace(spec)
    return contextlib.nullcontext()


def iter_jsonl_configs(path: str) -> Iterator[dict]:
    """Yield per-run config records from a JSON-lines file, skipping blanks."""
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            yield json.loads(line)


# ---------------------------------------------------------------------------
# vae_type string contract
# ---------------------------------------------------------------------------

#: model-family precedence, mirroring the reference factory's substring dispatch
#: order (src/utils/loaders.py:19-245): `flow` wins over `reg_vae`, the final
#: fallback is MIWAE.
FAMILY_PRECEDENCE = (
    "flow",
    "reg_vae",
    "reg_notMIWAE",
    "reg_EDDI",
    "reg_MIWAE",
    "vanilla_vae",
    "vanilla_EDDI",
    "vanilla_notMIWAE",
    "MIWAE",  # fallback (also matches vanilla_MIWAE)
)


@dataclasses.dataclass(frozen=True)
class VaeTypeInfo:
    """Decomposition of a `vae_type` string into its dispatch coordinates."""

    raw: str
    family: str  # one of FAMILY_PRECEDENCE
    regularized: bool  # reg_* family (trains a p-branch)
    flow: bool
    split_index: str  # first digit found in the string ('' if none)
    mask_augmented: bool  # `_mask_augm` suffix -> mask-concat encoder input
    with_drop: bool  # `_with_drop` suffix -> EDDI dropout masks in training


def parse_vae_type(vae_type: str) -> VaeTypeInfo:
    """Parse the `vae_type` master-switch string.

    Dispatch-order parity with the reference factory (src/utils/loaders.py:19-245)
    and split-index extraction parity with its data loaders
    (src/utils/loaders.py:322: "first digit found in vae_type").
    """
    family = "MIWAE"
    for cand in FAMILY_PRECEDENCE:
        if cand in vae_type:
            if cand == "flow" and "reg_flow" in vae_type:
                family = "reg_flow"
            elif cand == "flow":
                family = "vanilla_flow"
            else:
                family = cand
            break
    digits = [c for c in vae_type if c.isdigit()]
    return VaeTypeInfo(
        raw=vae_type,
        family=family,
        regularized=family.startswith("reg"),
        flow="flow" in vae_type,
        split_index=digits[0] if digits else "",
        mask_augmented="mask_augm" in vae_type,
        with_drop="with_drop" in vae_type,
    )


# ---------------------------------------------------------------------------
# Typed run config
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class RunConfig:
    """One experiment run. Field names/defaults follow the reference JSONL schema
    (Data/imputation_args.json line 1)."""

    missing_rate: int = 50
    vae_type: str = "reg_vae1"
    experiment_type: str = "UCI_experiments_consistency_missingness"
    reg_type: str = "kl_reg"  # 'kl_reg' | 'ml_reg'
    data_type: str = "wine"
    epoch: int = 3000
    batch_size: int = 64
    patience: int = 100
    data_path: str = "Data"
    K: int = 10  # PointNet feature-map dim
    M: int = 1  # MC samples for imputation/eval
    latent_dim: int = 10
    hid_dim: int = 500
    train_k: int = 20  # IWAE samples during training
    valid_k: int = 5000  # IWAE samples during validation
    n_iwae: int = 50
    n_ais_iwae: int = 40
    # AIS bridge defaults pinned by the round-4 BDMC certification study
    # (RESULTS.md "AIS/BDMC schedule certification"): sigmoidal T=500 closes
    # the sandwich for Gaussian-decoder checkpoints (<0.01 nats measured;
    # the reference ships linear T=500, src/utils/AIS.py:83,98, and never
    # certifies it). The flow family's obs_logvar=-8 likelihood is a much
    # harder bridge — its measured sigmoidal gaps are ~2.5 nats at T=1000,
    # ~0.68 at T=2000, closing (~0.07) at T=4000 (round-5 follow-up in
    # RESULTS.md; ais_eval.py -bdmc true reports the actual gap). eval_ais
    # warns at runtime when a flow checkpoint runs below that floor
    # (engine/ais.default_schedule, FLOW_MIN_AIS_DIST).
    ais_schedule: str = "sigmoidal"
    n_ais_dist: int = 500
    num_estimates: int = 100
    beta_annealing: bool = False
    alpha_annealing: bool = True
    # sweep-level knobs (reference hard-codes these loops: imputation.py:23-24)
    alpha: float = 1.0
    p_missingness: int = 30
    beta: float = 1.0
    seed: int = 0
    data_transform: str = "minmax"  # 'minmax' | 'stand'
    not_miwae_type: str = "changed"  # 'changed' | 'author'
    #: PRNG implementation for this run. 'rbg' (XLA RngBitGenerator) is the
    #: production default — +32% train throughput at the flagship shape on
    #: TPU v5e, statistically identical training outcomes; 'threefry2x32'
    #: gives bit-reproducible cross-platform key streams (the test suite and
    #: golden values pin it).
    rng_impl: str = "rbg"
    # flow-posterior tail handling: 'clamp' (reference-effective; bounds the
    # latent support and trains markedly better — see nn/flow.py) | 'linear'
    # (true linear tails, the reference code's documented intent)
    flow_tails: str = "clamp"
    # opt-in learnable ActNorm affines between the flow's spline layers — the
    # layer the reference defines but leaves commented out of its Flow
    # (src/models/VAE.py:1627-1657, 1827); identity at init
    flow_actnorm: bool = False
    # notMIWAE bound: False = reference objective (logsumexp of the positive
    # negative-log-weights, VAE.py:2803-2807); True = textbook IWAE bound
    fixed_iwae_bound: bool = False
    # regularized notMIWAE variant: 'v2' (factory default) | 'both_s' |
    # 'sampled_mask' (see models/notmiwae.py)
    reg_notmiwae_variant: str = "v2"
    #: compute dtype: 'float32' (reference-exact numerics, the default every
    #: golden/parity test pins) | 'bfloat16' (bf16 operands with f32
    #: accumulation; params/optimizer stay f32). Measured on TPU v5e: XLA's
    #: DEFAULT precision already runs f32 matmuls as bf16-with-f32-
    #: accumulate on the MXU (identical losses — RESULTS.md "Mixed
    #: precision"), and 'bfloat16' has NO measured throughput benefit at
    #: ANY current shape (batch 64-4096, tiny-table and MNIST-EDDI; every
    #: delta within tunnel noise, round-5 table in RESULTS.md). On TPU the
    #: knob exists for numerics experiments and forward-compatibility; on
    #: CPU/GPU it genuinely narrows the matmuls.
    compute_dtype: str = "float32"
    #: device mesh for the multi-chip engine: '' = single-chip, 'auto' = all
    #: devices (dp x tp auto-factored), 'DP' or 'DP,TP' explicit. The
    #: reference is hard-wired to one device (imputation.py:16); with a mesh
    #: the CLI routes through parallel/train_parallel.train_sharded +
    #: engine/evaluate_sharded.
    mesh: str = ""

    @property
    def info(self) -> VaeTypeInfo:
        return parse_vae_type(self.vae_type)

    @classmethod
    def from_args(cls, args: argparse.Namespace, **overrides) -> "RunConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in vars(args).items() if k in fields}
        kw.update(overrides)
        return cls(**kw)

    @classmethod
    def from_jsonl_record(cls, record: dict, **overrides) -> "RunConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {}
        for key, value in record.items():
            if key in fields:
                default = value["default"]
                if isinstance(getattr(cls, key, None), bool) or key.endswith(
                    "_annealing"
                ):
                    default = str2bool(default)
                kw[key] = default
        kw.update(overrides)
        return cls(**kw)

    def replace(self, **kw) -> "RunConfig":
        return dataclasses.replace(self, **kw)


def resolve_mesh(cfg: "RunConfig"):
    """cfg.mesh -> jax.sharding.Mesh or None (single-chip engine).

    '' -> None; 'auto' -> all devices, (dp, tp) auto-factored; 'DP' or
    'DP,TP' -> explicit split over the first DP*TP devices. A 1-device
    'auto' resolves to None so single-chip runs stay on the flat-param fused
    engine (engine/train.py), which is faster there.
    """
    import jax

    from vae_posterior_consistency_tpu.parallel import mesh as meshlib

    spec = (cfg.mesh or "").strip().lower()
    if not spec:
        return None
    devices = jax.devices()
    if spec == "auto":
        if len(devices) < 2:
            return None
        return meshlib.make_mesh(devices)
    parts = [int(p) for p in spec.split(",")]
    dp, tp = (parts + [1])[:2]
    need = dp * tp
    if len(devices) < need:
        raise ValueError(
            f"-mesh {cfg.mesh!r} needs {need} devices, have {len(devices)}"
        )
    return meshlib.make_mesh(devices[:need], dp=dp, tp=tp)


def apply_rng_impl(cfg: "RunConfig") -> None:
    """Install the run's PRNG implementation as the jax default (see
    RunConfig.rng_impl), and the persistent compilation cache. Called once
    per process by every entry point before any key use."""
    import os

    import jax

    jax.config.update("jax_default_prng_impl", cfg.rng_impl)
    # persistent compile cache: the suite's ~40 distinct programs compile
    # once per host instead of once per process (through the TPU tunnel a
    # single compile is tens of seconds; run.sh spawns three processes)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("VPC_COMPILE_CACHE", "/tmp/vpc_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the persistent cache


def restart_opts(args):
    """(-checkpoint_every, -resume) CLI flags -> engine kwargs. ONE reader
    shared by every entry point (imputation, imputation_mnar) so all suite
    paths interpret the flags identically — non-positive checkpoint_every
    means 'off' (None) everywhere."""
    ck = int(getattr(args, "checkpoint_every", 0) or 0)
    return (ck if ck > 0 else None), bool(getattr(args, "resume", False))


def restrict_grid_records(records, probe):
    """Ensemble-mode `-vae_type` semantics, ONE definition for every entry
    point's `-ensemble true` path: restrict the JSONL grid to the matching
    record instead of letting the override clobber EVERY record's defaults
    (the serial grids apply the override per record — the reference's
    parse-per-record contract — which for grouped/vmapped ensemble modes
    would run the same vae_type under each record's unrelated
    missing_rate/epoch defaults). Undetectable edge: explicitly passing
    record[0]'s own default. Raises SystemExit for a non-grid vae_type."""
    if probe.vae_type == records[0]["vae_type"]["default"]:
        return records
    matching = [r for r in records
                if r["vae_type"]["default"] == probe.vae_type]
    if not matching:
        raise SystemExit(
            f"-ensemble true cannot apply -vae_type {probe.vae_type!r}: "
            "not a grid record — run without -ensemble to drive a custom "
            "single config")
    print(f"[ensemble mode] -vae_type {probe.vae_type}: grid restricted "
          f"to its record", flush=True)
    return matching


def early_stopper(args, cfg: "RunConfig", ensemble: bool = False):
    """`-early_stop` CLI flag -> a fresh early-stopping tracker (or None),
    thresholded by the config grid's `patience` field. ONE reader shared by
    every entry point; `ensemble=True` returns the per-replica tracker the
    stacked-pytree trainers take (parallel/sweep), else the serial/sharded
    engines' scalar one. A fresh instance per call — patience state must
    never leak between grid records."""
    if not bool(getattr(args, "early_stop", False)):
        return None
    from vae_posterior_consistency_tpu.utils.early_stopping import (
        EarlyStopping,
        EnsembleEarlyStopping,
    )

    cls = EnsembleEarlyStopping if ensemble else EarlyStopping
    return cls(patience=cfg.patience, verbose=True)


def parse_alphas(args, default):
    """Resolve the `-alphas` flag into a list of floats (the entry's
    hard-coded sweep when unset). Rejects empties/garbage loudly."""
    spec = (getattr(args, "alphas", "") or "").strip()
    if not spec:
        return list(default)
    try:
        alphas = [float(tok) for tok in spec.split(",") if tok.strip()]
    except ValueError:
        raise SystemExit(f"-alphas {spec!r}: expected comma-separated floats")
    if not alphas:
        raise SystemExit(f"-alphas {spec!r}: no values")
    return alphas


def parse_missings(args, default):
    """Resolve the `-missings` flag into a list of ints (the entry's
    hard-coded p_missingness sweep when unset). Integer percentages, matching
    the reference's `for missing in [30]` loop and the int-typed
    p_missingness baked into every artifact/checkpoint filename
    (reference: src/experiment_main/imputation.py:23)."""
    spec = (getattr(args, "missings", "") or "").strip()
    if not spec:
        return list(default)
    try:
        vals = [int(tok) for tok in spec.split(",") if tok.strip()]
    except ValueError:
        raise SystemExit(f"-missings {spec!r}: expected comma-separated ints")
    if not vals:
        raise SystemExit(f"-missings {spec!r}: no values")
    return vals
