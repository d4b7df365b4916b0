"""Imputation serving: bucketed jit path + HTTP endpoint round trip."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.engine.serve import ImputationServer
from vae_posterior_consistency_tpu.models import get_model


def _server():
    cfg = RunConfig(vae_type="vanilla_vae1", latent_dim=4)
    model = get_model(cfg)
    D = 6
    params = model.init(jax.random.PRNGKey(0), cfg, D)
    return ImputationServer(params, cfg, D, buckets=(4, 16)), D


def test_impute_preserves_observed_and_fills_missing():
    srv, D = _server()
    x = np.random.default_rng(0).uniform(0, 1, (5, D)).astype(np.float32)
    mask = np.ones((5, D), np.float32)
    mask[:, 2] = 0.0
    filled, negll = srv.impute(x, mask)
    assert filled.shape == (5, D)
    # observed cells unchanged
    np.testing.assert_allclose(filled * mask, x * mask, atol=1e-6)
    # missing cells replaced by the model (sigmoid outputs in (0,1))
    assert np.all(filled[:, 2] > 0) and np.all(filled[:, 2] < 1)
    assert negll.shape == (5,)


def test_bucketing_no_shape_blowup():
    srv, D = _server()
    for n in (1, 3, 4, 9, 16, 33):
        x = np.zeros((n, D), np.float32)
        mask = np.ones((n, D), np.float32)
        filled, negll = srv.impute(x, mask)
        assert filled.shape == (n, D)


def test_http_round_trip():
    srv, D = _server()
    from vae_posterior_consistency_tpu.engine.serve import make_http_server

    # port=0: the server binds an OS-chosen free port itself (no probe-
    # then-rebind TOCTOU race), and we read the bound port back
    httpd = make_http_server(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/impute",
            data=json.dumps(
                {"x": [[0.5] * D], "mask": [[1, 1, 0, 1, 1, 1]]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        # the server is already bound, so no retry loop — an HTTP error
        # (urllib raises on non-2xx) surfaces directly instead of being
        # swallowed as "not up yet"
        with urllib.request.urlopen(req, timeout=30) as resp:
            out = json.loads(resp.read())
    finally:
        httpd.shutdown()
    assert len(out["imputed"]) == 1
    assert len(out["imputed"][0]) == D
    assert len(out["row_score"]) == 1


def test_mesh_serving_matches_single_device():
    """`mesh=` shards request rows over dp (params replicated): outputs
    must match the single-device server on every bucket path, buckets
    round up to dp multiples, and the input actually lands sharded."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib

    cfg = RunConfig(vae_type="vanilla_vae1", latent_dim=4)
    model = get_model(cfg)
    D = 6
    params = model.init(jax.random.PRNGKey(0), cfg, D)
    mesh = meshlib.make_mesh(jax.devices()[:8])  # dp=4, tp=2
    ref = ImputationServer(params, cfg, D, buckets=(4, 16))
    srv = ImputationServer(params, cfg, D, buckets=(1, 6, 16), mesh=mesh)
    assert srv.buckets == (4, 8, 16)  # rounded up to dp=4 multiples

    rng = np.random.default_rng(1)
    for n in (1, 5, 16, 33):
        x = rng.uniform(0, 1, (n, D)).astype(np.float32)
        mask = (rng.random((n, D)) > 0.3).astype(np.float32)
        # same bucket => same ctr-keyed program inputs; keep counters aligned
        f_ref, s_ref = ref.impute(x, mask)
        f_mesh, s_mesh = srv.impute(x, mask)
        np.testing.assert_allclose(f_mesh, f_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(s_mesh, s_ref, rtol=1e-5, atol=1e-6)


def test_http_bad_request_is_400():
    """Malformed payloads (missing keys, invalid JSON) must map to HTTP 400
    with the error surfaced — not crash the handler thread or hang the
    client."""
    import urllib.error

    from vae_posterior_consistency_tpu.engine.serve import make_http_server

    srv, D = _server()
    httpd = make_http_server(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        for body in (b"{not json", json.dumps({"x": [[0.5] * D]}).encode()):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/impute", data=body,
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(req, timeout=30)
                raise AssertionError("expected HTTP error")
            except urllib.error.HTTPError as e:
                assert e.code == 400
        # unknown path -> 404
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/nope", data=b"{}")
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected HTTP error")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()
