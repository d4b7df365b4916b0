"""Imputation serving: a compiled, fixed-shape inference path for deployment.

The reference has no serving story (research scripts only). This module
packages a trained checkpoint as a low-latency imputation service:

- `ImputationServer.impute(x, mask)` — jit-compiled, bucketed to a fixed set
  of batch shapes (no recompiles in steady state), returns the model's
  imputation for the missing cells and a per-row quality score (the
  negative evidence bound; lower = better fit, uniform across families).
- Optional mesh: rows shard over `dp` for throughput serving.
- `serve_http()` — a minimal stdlib HTTP endpoint (POST /impute with JSON
  {"x": [[...]], "mask": [[...]]}) for integration smoke tests.
"""

from __future__ import annotations

import itertools
import json

import jax
import jax.numpy as jnp
import numpy as np

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.models import get_model

DEFAULT_BUCKETS = (1, 8, 64, 512)


class ImputationServer:
    def __init__(self, params, cfg: RunConfig, obs_dim: int,
                 buckets=DEFAULT_BUCKETS, mesh=None):
        self.cfg = cfg
        self.model = get_model(cfg)
        self.obs_dim = obs_dim
        self.mesh = mesh
        self._row_sharding = None
        if mesh is not None:
            # rows shard over dp: params replicate, request rows split, and
            # XLA partitions the whole compiled program from the input
            # shardings alone (row-independent math, zero collectives).
            # Buckets round up to dp multiples so shards stay even.
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = mesh.shape["dp"]
            buckets = {-(-b // dp) * dp for b in buckets}
            params = jax.device_put(params, NamedSharding(mesh, P()))
            self._row_sharding = NamedSharding(mesh, P("dp", None))
        self.buckets = tuple(sorted(buckets))
        self.params = params
        self._base_key = jax.random.PRNGKey(cfg.seed + 9)
        # host-side request counter; key derived inside the jit. itertools
        # counters are atomic under the GIL, so concurrent impute() callers
        # (outside serve_http's lock) never reuse a PRNG key.
        self._ctr = itertools.count(1)

        model = self.model

        @jax.jit
        def _impute(params, x, mask, base_key, ctr):
            # fold the per-request key derivation INTO the compiled program:
            # one device dispatch per request instead of two (split + compute)
            # — on a tunneled TPU each dispatch costs a full RTT once any
            # device->host readback has forced the client synchronous
            key = jax.random.fold_in(base_key, ctr)
            out = model.eval_step(params, x, mask, jnp.ones_like(mask), key,
                                  cfg)
            # fill only the missing cells; keep observed values verbatim
            filled = x * mask + out["x_imputed"] * (1.0 - mask)
            # quality score: the per-row NEGATIVE EVIDENCE BOUND (lower =
            # better fit) — consistent across every model family, unlike
            # row_negl whose llh_eval semantics are family-specific reference
            # quirks (e.g. MIWAE's sign-flipped /5000 imputed log-lik,
            # VAE.py:3099)
            return filled, out["row_loss"]

        self._impute = _impute

    def warmup(self):
        """Pre-compile every bucket shape."""
        for b in self.buckets:
            self.impute(np.zeros((b, self.obs_dim), np.float32),
                        np.ones((b, self.obs_dim), np.float32))
        return self

    def impute(self, x, mask):
        """Impute missing cells; returns (filled [n,D], row_score [n])
        where row_score is the per-row negative evidence bound.
        """
        x = np.asarray(x, np.float32)
        mask = np.asarray(mask, np.float32)
        n = x.shape[0]
        bucket = next((b for b in self.buckets if b >= n), None)
        if bucket is None:
            bucket = ((n + self.buckets[-1] - 1) // self.buckets[-1]
                      ) * self.buckets[-1]
        pad = bucket - n
        if pad:
            x = np.concatenate([x, np.zeros((pad, x.shape[1]), np.float32)])
            mask = np.concatenate(
                [mask, np.ones((pad, mask.shape[1]), np.float32)]
            )
        x, mask = jnp.asarray(x), jnp.asarray(mask)
        if self._row_sharding is not None:
            x = jax.device_put(x, self._row_sharding)
            mask = jax.device_put(mask, self._row_sharding)
        filled, negll = self._impute(self.params, x, mask, self._base_key,
                                     np.uint32(next(self._ctr)))
        # one batched device->host readback for both outputs
        filled, negll = jax.device_get((filled, negll))
        return filled[:n], negll[:n]


def make_http_server(server: ImputationServer, host: str = "127.0.0.1",
                     port: int = 8787):
    """Build (but don't run) the HTTP endpoint; returns the bound
    ThreadingHTTPServer. `port=0` binds an OS-chosen free port (read it
    back from `httpd.server_address[1]`) — callers that pre-probed a free
    port and re-bound it raced other processes for it (TOCTOU)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    impute_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/impute":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            try:
                payload = json.loads(self.rfile.read(length))
                with impute_lock:
                    filled, negll = server.impute(payload["x"],
                                                  payload["mask"])
                body = json.dumps(
                    {"imputed": filled.tolist(), "row_score": negll.tolist()}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                self.send_error(400, str(e))

        def log_message(self, *a):
            pass

    return ThreadingHTTPServer((host, port), Handler)


def serve_http(server: ImputationServer, host: str = "127.0.0.1",
               port: int = 8787):
    """Minimal HTTP endpoint: POST /impute {"x": ..., "mask": ...}.

    Threaded accept loop; device work is serialized through a lock (one
    compiled program in flight keeps per-request latency at a single device
    round-trip)."""
    httpd = make_http_server(server, host, port)
    print(f"imputation server on http://{host}:{httpd.server_address[1]}"
          "/impute")
    httpd.serve_forever()
