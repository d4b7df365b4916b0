"""Headline benchmark: flagship-model training throughput on one chip.

Measures samples/sec of the fully-compiled training loop (Reg_VAE + kl_reg,
wine-shaped table: N=4898 x D=12, batch 64, Adam — the reference's flagship
configuration, Data/imputation_args.json defaults) on whatever accelerator is
attached, and compares against the reference's CPU throughput.

Baseline: 9723 samples/s — the torch-CPU reference-equivalent measured on this
host with tools/bench_baseline_torch.py (eager two-branch forward/backward with
per-batch host NumPy mask draws, mirroring src/experiment_main/train.py:26-116).
The build target is >=10x (BASELINE.md north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax

# persistent compilation cache: the flagship chunk program takes minutes to
# compile through the TPU tunnel; cache it across bench invocations
jax.config.update("jax_compilation_cache_dir", "/tmp/vpc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# production PRNG: XLA RngBitGenerator — +32% train throughput over threefry
# at the flagship shape, statistically identical training (RunConfig.rng_impl)
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np

#: torch-CPU reference-equivalent samples/s on this host
#: (tools/bench_baseline_torch.py, 2026-08-16)
TORCH_CPU_BASELINE = 9723.0

N_ROWS, OBS_DIM = 4898, 12
BENCH_EPOCHS = 200

#: peak dense-matmul throughput assumed for the MFU denominator, by device
#: kind substring. v5e: 197 TFLOP/s bf16 (f32 activations accumulate on the
#: same MXU; the bf16 peak is the speed-of-light yardstick).
PEAK_TFLOPS = {"v5 lite": 197.0, "v5litepod": 197.0, "v5e": 197.0,
               "v4": 275.0, "v5p": 459.0, "v6": 918.0}


def _peak_tflops() -> float | None:
    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in PEAK_TFLOPS.items():
        if sub in kind:
            return peak
    return None


def _train_flops_per_sample(obs_dim=OBS_DIM, latent=10) -> float:
    """Analytic matmul FLOPs per training sample for the flagship Reg_VAE:
    encoder [D->100->50->2L] + decoder [L->50->100->D], BOTH branches (the
    [2B] q/p stream), backward ~ 2x forward. (XLA's own cost_analysis counts
    scan bodies ONCE — useless for the 200-epoch chunked loop — so the MFU
    accounting uses this transparent count instead; elementwise/optimizer
    FLOPs are negligible next to the matmuls.)"""
    enc = obs_dim * 100 + 100 * 50 + 50 * 2 * latent
    dec = latent * 50 + 50 * 100 + 100 * obs_dim
    fwd = 2 * (enc + dec)  # multiply + add
    return 2 * fwd * 3  # two branches; fwd + ~2x for backward


#: MNIST-EDDI regime shape: the reference's only genuinely matmul-heavy
#: family (Reg_EDDI_mnist, src/models/VAE.py:32-44 — 500/500/200 encoder
#: trunk, 200/500/500 decoder over 784 features)
MNIST_ROWS, MNIST_DIM = 4096, 784
MNIST_EPOCHS = 30


def _mnist_flops_per_sample(latent=10, K=10, obs_dim=MNIST_DIM) -> float:
    """Analytic matmul FLOPs/sample for Reg_EDDI_mnist training. The EDDI
    per-feature embedding is computed in its collapsed elementwise form
    (models/layers.py:pointnet_encoder_apply) — VPU work, excluded from the
    MXU-FLOP numerator, so MFU here honestly measures matmul efficiency."""
    enc = K * 500 + 500 * 500 + 500 * 200 + 200 * 2 * latent
    dec = latent * 200 + 200 * 500 + 500 * 500 + 500 * obs_dim
    fwd = 2 * (enc + dec)  # multiply + add
    return 2 * fwd * 3  # two branches (q/p); fwd + ~2x backward


def _mnist_setup(batch: int, compute_dtype: str):
    """Build the compiled MNIST-EDDI training runner + initial flat state
    (shared by _bench_mnist and tools/bench_mnist.py so the regime under
    test is defined in exactly one place)."""
    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.engine.train import _build_epoch_runner
    from vae_posterior_consistency_tpu.models import get_model

    cfg = RunConfig(vae_type="reg_EDDI_mnist1", data_type="mnist",
                    reg_type="kl_reg", batch_size=batch, latent_dim=10,
                    K=10, alpha=1.0, p_missingness=30,
                    compute_dtype=compute_dtype)
    model = get_model(cfg)
    rng = np.random.default_rng(1)
    data = jnp.asarray(rng.uniform(0, 1, (MNIST_ROWS, MNIST_DIM)),
                       jnp.float32)
    mask = jnp.asarray(rng.random((MNIST_ROWS, MNIST_DIM)) < 0.7, jnp.float32)

    params = model.init(jax.random.PRNGKey(0), cfg, MNIST_DIM)
    runner = _build_epoch_runner(cfg, data, mask, model,
                                 template_params=params)
    return runner, params, runner.tx.init(params)


def _timed_chunks(runner, params, opt_state, epochs, reps: int = 3,
                  start_epoch: int = 0):
    """The one measurement protocol (CLAUDE.md axon quirks): readback-synced
    barriers, the epoch counter varies per rep so client-side dedup can't
    fake ~0 ms, best of `reps`. Assumes the (params, opt_state) shapes were
    already warmed at this chunk size. Returns (best_seconds, state...)."""
    key = jax.random.PRNGKey(1)
    best, done = None, start_epoch
    for _ in range(reps):
        t0 = time.perf_counter()
        params, opt_state, losses = runner(params, opt_state, key,
                                           jnp.asarray(done), epochs)
        float(losses[-1])  # readback barrier
        dt = time.perf_counter() - t0
        done += epochs
        best = dt if best is None else min(best, dt)
    return best, params, opt_state, float(losses[-1])


def _bench_mnist(batch: int, compute_dtype: str, epochs: int = MNIST_EPOCHS):
    """MNIST-EDDI training regime, one sweep point: returns
    (samples/s, compile+warmup seconds, final loss). The ONE definition of
    this regime's warmup + timing; tools/bench_mnist.py consumes it too."""
    runner, params, opt_state = _mnist_setup(batch, compute_dtype)
    t0 = time.perf_counter()
    params, opt_state, losses = runner(params, opt_state,
                                       jax.random.PRNGKey(1),
                                       jnp.asarray(0), epochs)
    float(losses[-1])  # compile + warmup readback (axon quirk — see main())
    t_compile = time.perf_counter() - t0
    best, _, _, loss = _timed_chunks(runner, params, opt_state, epochs,
                                     start_epoch=epochs)
    return epochs * MNIST_ROWS / best, t_compile, loss


def _bench_mnist_eval(batch: int = 1024, M: int = 50, pipeline: int = 1):
    """Rows/s of the compiled M-rep MNIST-EDDI evaluation program — the
    eval-side counterpart of _bench_mnist (reference loop:
    src/experiment_main/evaluate.py:136-245; all M reps in one dispatch).
    Keys vary per timing rep (client-side dedup otherwise fakes ~0 ms).

    M=50 is the grid's production rep count (Data/imputation_args.json).
    Measurement note (round 4): the M=10 program's DEVICE time is ~3.4 ms
    after the grouped-vmap eval restructure, but one tunneled dispatch
    costs ~12-17 ms host dispatch + ~24 ms readback RTT regardless of the
    program (measured; pipelined dispatches do NOT overlap on this
    client), so a small-M synchronous call measures the tunnel. The
    production M amortizes that fixed cost exactly as the real suite
    does. `pipeline` >1 kept for experimentation only."""
    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.engine.evaluate import _split_eval_fn
    from vae_posterior_consistency_tpu.models import get_model

    cfg = RunConfig(vae_type="reg_EDDI_mnist1", data_type="mnist",
                    reg_type="kl_reg", batch_size=batch, latent_dim=10,
                    K=10, M=M, alpha=1.0, p_missingness=30)
    model = get_model(cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (MNIST_ROWS, MNIST_DIM)), jnp.float32)
    mask = jnp.asarray(rng.random((MNIST_ROWS, MNIST_DIM)) < 0.7, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), cfg, MNIST_DIM)
    eval_fn = _split_eval_fn(cfg, model, MNIST_ROWS, None)

    def keys_for(rep):
        base = jax.random.fold_in(jax.random.PRNGKey(3), rep)
        return jax.vmap(lambda m: jax.random.fold_in(base, m))(jnp.arange(M))

    agg = eval_fn(params, x, mask, keys_for(0))
    float(agg["rmse"])  # readback barrier
    best = None
    for rep in range(1, 4):
        t0 = time.perf_counter()
        aggs = [eval_fn(params, x, mask, keys_for(rep * pipeline + i))
                for i in range(pipeline)]
        for a in aggs:  # one readback after the pipelined dispatches
            float(a["rmse"])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return pipeline * M * MNIST_ROWS / best


def _init_watchdog(timeout_s: float = 900.0):
    """Abort loudly if backend init hangs. A dead tunnel relay makes
    jax.devices() block FOREVER in connect-retry (observed 2026-08-17:
    the relay's 8082/8083 listeners vanished and every fresh process hung
    at init for hours); normal init is seconds, so 15 min is generous and
    far above the observed 58-483 s compile-service variance, which only
    affects later compiles anyway. Returns an Event the caller sets once
    devices answer (disarms the watchdog)."""
    import os
    import sys
    import threading

    done = threading.Event()

    def _watch():
        if not done.wait(timeout_s):
            print(
                f"bench: device init did not complete in {timeout_s:.0f}s "
                "— TPU tunnel unreachable; aborting instead of hanging",
                file=sys.stderr, flush=True,
            )
            os._exit(2)

    threading.Thread(target=_watch, daemon=True).start()
    return done


def main():
    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.engine.train import _build_epoch_runner
    from vae_posterior_consistency_tpu.models import get_model

    armed = _init_watchdog()
    jax.devices()  # blocks on backend/tunnel init
    armed.set()

    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", batch_size=64,
                    latent_dim=10, alpha=1.0, p_missingness=30)
    model = get_model(cfg)

    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.uniform(0, 1, (N_ROWS, OBS_DIM)), jnp.float32)
    mask = jnp.asarray(rng.random((N_ROWS, OBS_DIM)) < 0.7, jnp.float32)

    params = model.init(jax.random.PRNGKey(0), cfg, OBS_DIM)
    runner = _build_epoch_runner(cfg, data, mask, model, template_params=params)
    opt_state = runner.tx.init(params)
    key = jax.random.PRNGKey(1)

    # compile + warmup with the SAME static chunk size as the timed call
    # (a different n_epochs is a different compiled program — timing the first
    # call of a shape would measure compilation, not the training loop).
    # Sync via a real readback: through the tunneled TPU, block_until_ready
    # can return early while the compile is still in flight, which once
    # produced a nonsensical 8.8e9 samples/s reading (CLAUDE.md axon quirks)
    params, opt_state, losses = runner(params, opt_state, key,
                                       jnp.asarray(0), BENCH_EPOCHS)
    float(losses[-1])

    # _timed_chunks IS the measurement protocol (epoch counter varied per
    # rep, readback barriers, best-of-3) — one definition, no drift
    best, params, opt_state, _ = _timed_chunks(runner, params, opt_state,
                                               BENCH_EPOCHS,
                                               start_epoch=BENCH_EPOCHS)

    samples_per_sec = BENCH_EPOCHS * N_ROWS / best

    # utilization accounting (VERDICT r1: "MFU is <1% and unexamined" — now
    # examined and reported; a 30k-param MLP at batch 64 is overhead-bound by
    # construction, the ensemble regime below is where the MXU loads up)
    fps = _train_flops_per_sample()
    peak = _peak_tflops()
    tflops = samples_per_sec * fps / 1e12
    out = {
        "metric": "flagship_train_throughput",
        "value": round(samples_per_sec, 1),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec / TORCH_CPU_BASELINE, 2),
        "tflops": round(tflops, 4),
    }
    if peak is not None:
        out["mfu"] = round(tflops / peak, 6)
        out["peak_tflops_assumed"] = peak

    # ensemble regime: the same flagship config trained as a 128-seed vmapped
    # ensemble (parallel/sweep.py) — the sweep-parallel execution mode that
    # actually loads the MXU (tools/bench_scaling.py has the batch sweep).
    # 128 replicas ~ the production sweep size (39 configs x 4 seeds); the
    # round-5 re-measured saturation map (tools/bench_ensemble_sweep.py;
    # RESULTS.md "Ensemble rollover") puts the b64 knee at S=256 with S=128
    # within noise of it, and the regime's best point at S=128 x b256 —
    # wide-S programs use the per-step-gather layout and >512-replica
    # requests train as sequential groups (parallel/sweep.py)
    ens_n = 128
    ens_sps = _bench_seed_ensemble(n_seeds=ens_n)
    ens_tflops = ens_sps * fps / 1e12
    out["ensemble_n_seeds"] = ens_n
    out["ensemble_samples_per_sec"] = round(ens_sps, 1)
    out["ensemble_tflops"] = round(ens_tflops, 4)
    if peak is not None:
        out["ensemble_mfu"] = round(ens_tflops / peak, 6)

    # MNIST-EDDI regime (VERDICT r2 item 1): the 784-dim matmul-heavy family
    # at the reference batch (64) and at the MXU-saturating batch (1024 —
    # tools/bench_mnist.py sweep: throughput plateaus there), f32 and bf16.
    # The first MFU numbers at a scale where the MXU matters; analysis in
    # RESULTS.md "The MNIST-EDDI regime".
    mnist_fps = _mnist_flops_per_sample()
    for tag, b, dt in (("mnist_b64", 64, "float32"),
                       ("mnist_b1024", 1024, "float32"),
                       ("mnist_b1024_bf16", 1024, "bfloat16")):
        sps, _t_compile, _loss = _bench_mnist(b, dt)
        tf = sps * mnist_fps / 1e12
        out[f"{tag}_samples_per_sec"] = round(sps, 1)
        out[f"{tag}_tflops"] = round(tf, 3)
        if peak is not None:
            out[f"{tag}_mfu"] = round(tf / peak, 5)

    # eval-side counterpart: M-rep imputation evaluation rows/s (single
    # q-branch forward per row per rep -> fwd-only matmul FLOPs)
    ev_rps = _bench_mnist_eval()
    out["mnist_eval_rows_per_sec"] = round(ev_rps, 1)
    out["mnist_eval_tflops"] = round(ev_rps * (mnist_fps / 6) / 1e12, 3)
    print(json.dumps(out))


def _bench_seed_ensemble(n_seeds: int, epochs: int = 20):
    """Samples/s and TFLOP/s of the n_seeds-replica flagship ensemble —
    the sweep-parallel regime (one vmapped program, replicas stacked on the
    MXU; parallel/sweep.py)."""
    import time as _time

    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.data.loaders import Dataset, Split
    from vae_posterior_consistency_tpu.parallel.sweep import (
        build_seed_ensemble_runner,
    )

    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", batch_size=64,
                    latent_dim=10, alpha=1.0, p_missingness=30, epoch=epochs)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.uniform(0, 1, (N_ROWS, OBS_DIM)), jnp.float32)
    mask = jnp.asarray(rng.random((N_ROWS, OBS_DIM)) < 0.7, jnp.float32)
    ds = Dataset(train=Split(data, mask, "train"), test=None, obs_dim=OBS_DIM)

    run_chunk, params, opt_state = build_seed_ensemble_runner(
        ds, cfg, list(range(n_seeds)))
    params, opt_state, hist = run_chunk(params, opt_state, jnp.asarray(0),
                                        epochs)  # compile + warmup
    float(hist[-1, 0])  # readback barrier (see main(): axon quirk)
    best, done = None, epochs
    for _ in range(3):
        t0 = _time.perf_counter()
        params, opt_state, hist = run_chunk(params, opt_state,
                                            jnp.asarray(done), epochs)
        float(hist[-1, 0])
        dt = _time.perf_counter() - t0
        done += epochs
        best = dt if best is None else min(best, dt)
    return n_seeds * epochs * N_ROWS / best


if __name__ == "__main__":
    main()
