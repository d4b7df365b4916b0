"""Two-process jax.distributed smoke test for parallel/multihost.py.

Proves the multi-host orchestration path actually composes:
`multihost.initialize` (coordinator handshake) + `multihost.global_mesh`
(mesh over ALL processes' devices) + `multihost.shard_host_data`
(per-process rows -> one globally-sharded array) + a jitted cross-process
reduction and a model loss on the global batch.

The reference has no multi-host story at all (SURVEY.md §2.5); this validates
the framework's own subsystem, on CPU, with no TPU pod needed.

Run (self-orchestrating — spawns both processes, exits 0 on success):
    python3 tools/multihost_smoke.py
Or run one rank explicitly:
    JAX_COORDINATOR_ADDRESS=localhost:9911 JAX_NUM_PROCESSES=2 \
    JAX_PROCESS_ID=0 python3 tools/multihost_smoke.py --rank
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

LOCAL_DEVICES = 2  # virtual CPU devices per process
ROWS_PER_DEVICE = 4
OBS_DIM = 6


def run_rank() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.models import get_model
    from vae_posterior_consistency_tpu.parallel import multihost

    multihost.initialize()  # env-var driven handshake
    pid = jax.process_index()
    nproc = jax.process_count()
    assert nproc == 2, f"expected 2 processes, got {nproc}"
    assert jax.device_count() == nproc * LOCAL_DEVICES, (
        jax.device_count(), jax.local_device_count()
    )

    mesh = multihost.global_mesh(dp=jax.device_count(), tp=1)

    # per-process rows: process p contributes rows filled with (p + 1)
    local_rows = LOCAL_DEVICES * ROWS_PER_DEVICE
    local = np.full((local_rows, OBS_DIM), float(pid + 1), np.float32)
    g = multihost.shard_host_data(mesh, local)
    assert g.shape == (nproc * local_rows, OBS_DIM)

    # cross-process reduction: every process must see the GLOBAL sum
    total = float(jax.jit(jnp.sum)(g))
    expect = OBS_DIM * local_rows * sum(p + 1 for p in range(nproc))
    assert total == expect, (total, expect)

    # and a model loss over the globally-sharded batch: params are built
    # inside the program from a constant key (identical on every process),
    # XLA inserts the collectives for the dp-sharded batch
    cfg = RunConfig(vae_type="reg_vae1", latent_dim=4, hid_dim=32)
    model = get_model(cfg)

    @jax.jit
    def global_loss(x):
        params = model.init(jax.random.PRNGKey(0), cfg, OBS_DIM)
        mask = jnp.ones_like(x)
        mask_p = jnp.concatenate(
            [jnp.ones_like(x[:, : OBS_DIM // 2]),
             jnp.zeros_like(x[:, OBS_DIM // 2:])], axis=1)
        loss, _ = model.train_loss(params, x, mask, mask_p,
                                   jax.random.PRNGKey(1), jnp.float32(1.0),
                                   cfg)
        return loss

    loss = float(global_loss(g))
    assert np.isfinite(loss), loss
    print(f"[rank {pid}] devices={jax.device_count()} "
          f"sum={total:.0f} loss={loss:.4f} OK", flush=True)


def orchestrate() -> int:
    port = 9911
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS=f"--xla_force_host_platform_device_count={LOCAL_DEVICES}",
            PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--rank"],
            env=env,
        ))
    # a rank that never reaches the handshake (stale port holder, dead
    # sibling) must not crash the orchestrator with an uncaught
    # TimeoutExpired and leak the other child still holding the port —
    # kill BOTH children and report FAILED instead
    rcs = []
    for p in procs:
        try:
            rcs.append(p.wait(timeout=300))
        except subprocess.TimeoutExpired:
            rcs.append("timeout")
    if "timeout" in rcs:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    ok = all(rc == 0 for rc in rcs)
    print(f"multihost_smoke: 2 processes x {LOCAL_DEVICES} devices -> "
          f"{'OK' if ok else f'FAILED {rcs}'}")
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rank", action="store_true",
                    help="run as one rank (env-var configured)")
    args = ap.parse_args()
    if args.rank:
        run_rank()
    else:
        sys.exit(orchestrate())
