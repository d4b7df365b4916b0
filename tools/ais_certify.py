"""AIS/BDMC schedule-certification study (VERDICT r3 item 2).

Trains flagship (reg_vae, Gaussian decoder) and flow checkpoints on a real
table, then runs the BDMC sandwich (engine/ais.bdmc: forward lower bound +
reverse upper bound on data simulated from the trained decoder) across
schedule shape {linear, sigmoidal} x n_ais_dist {50, 200, 500, 1000}. The
gap table is what certifies (or indicts) a bridge before eval_ais spends it
on the real splits — the reference ships the sigmoidal schedule
(src/utils/AIS.py:65-77, citing BDMC §6) but never the sandwich that would
justify it.

Also records the real-split eval_ais logw at each point so the study shows
how the estimate itself moves as the bridge tightens.

Run (serialize with other TPU work; ~10 min at the default grid):
    PYTHONPATH=.:/root/.axon_site python3 tools/ais_certify.py \
        [-data_type wine] [-epochs 300] [-n_sample 64] [-families gauss,flow]

Output: one JSON line per (family, schedule, T) to stdout and
tools/ais_certify_out.jsonl (append); summarize into RESULTS.md by hand.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vpc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.data import loaders
from vae_posterior_consistency_tpu.engine import ais
from vae_posterior_consistency_tpu.engine.train import train

FAMILY_VAE_TYPE = {"gauss": "reg_vae1", "flow": "reg_flow1",
                   "notmiwae": "vanilla_notMIWAE1", "miwae": "MIWAE1"}


def _arg(flag, default, cast=str):
    if flag in sys.argv:
        return cast(sys.argv[sys.argv.index(flag) + 1])
    return default


def main():
    data_type = _arg("-data_type", "wine")
    epochs = _arg("-epochs", 300, int)
    n_sample = _arg("-n_sample", 64, int)
    families = _arg("-families", "gauss,flow").split(",")
    temps = [int(t) for t in _arg("-temps", "50,200,500,1000").split(",")]
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "ais_certify_out.jsonl")

    print(f"device={jax.devices()[0].device_kind} data={data_type} "
          f"epochs={epochs} n_sample={n_sample}", flush=True)
    results = []
    for fam in families:
        cfg = RunConfig(vae_type=FAMILY_VAE_TYPE[fam], data_type=data_type,
                        epoch=epochs, batch_size=64, latent_dim=10,
                        p_missingness=30, missing_rate=30)
        dataset = loaders.data_loader("Data", cfg.vae_type, cfg.missing_rate,
                                      cfg.batch_size, cfg.data_type)
        t0 = time.perf_counter()
        params, hist = train(dataset, cfg, save=False)
        print(f"[{fam}] trained {epochs} epochs in "
              f"{time.perf_counter()-t0:.1f}s loss {hist[0]:.3f} -> "
              f"{hist[-1]:.3f}", flush=True)
        # fixed simulated batch size across the grid: the sandwich compares
        # schedules, so the data regime must not move with T
        n_batch = min(64, dataset.test.x.shape[0])
        for sched_name in ("linear", "sigmoidal"):
            for T in temps:
                sched = (ais.linear_schedule(T) if sched_name == "linear"
                         else ais.sigmoidial_schedule(T))
                cfgT = cfg.replace(ais_schedule=sched_name, n_ais_dist=T)
                t0 = time.perf_counter()
                bd = ais.eval_bdmc(dataset, cfgT, params=params,
                                   schedule=sched, n_sample=n_sample,
                                   n_batch=n_batch,
                                   key=jax.random.PRNGKey(5), save=False)
                t_bdmc = time.perf_counter() - t0
                # real-split estimate under the same bridge (test split only
                # to keep the study cheap; train tracks it)
                ds_test_only = type(dataset)(train=dataset.test, test=None,
                                             obs_dim=dataset.obs_dim)
                r = ais.eval_ais(ds_test_only, cfgT, params=params,
                                 schedule=sched, n_sample=n_sample,
                                 key=jax.random.PRNGKey(6), save=False)
                rec = {
                    "family": fam, "schedule": sched_name, "T": T,
                    "bdmc_lower": round(bd.lower, 4),
                    "bdmc_upper": round(bd.upper, 4),
                    "bdmc_gap": round(bd.gap, 4),
                    "test_ais_logw": round(float(r["test"].logw), 4),
                    "n_sample": n_sample, "seconds": round(t_bdmc, 1),
                }
                results.append(rec)
                print(json.dumps(rec), flush=True)
                with open(out_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
    # pick the defended default: smallest T whose gap is within 10% (or
    # 0.05 nats) of the best gap seen for that family
    for fam in families:
        rows = [r for r in results if r["family"] == fam]
        best = min(abs(r["bdmc_gap"]) for r in rows)
        ok = [r for r in rows
              if abs(r["bdmc_gap"]) <= max(best * 1.1, best + 0.05)]
        pick = min(ok, key=lambda r: (r["T"], r["schedule"] != "sigmoidal"))
        print(f"[{fam}] defended default: schedule={pick['schedule']} "
              f"T={pick['T']} (gap {pick['bdmc_gap']}, best {best})",
              flush=True)


if __name__ == "__main__":
    main()
