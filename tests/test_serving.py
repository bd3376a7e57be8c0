"""Embedding HTTP service: end-to-end request against a live in-process server."""

import http.client
import json
import threading

import jax
import numpy as np
import pytest

from hippie_tpu.models import cvae
from hippie_tpu.train import checkpoint as ckpt_mod


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    # small checkpoints (shallow backbone keeps CPU compile fast)
    for name, out in (("wave", 50), ("time", 100)):
        cfg = cvae.CVAEConfig(z_dim=4, output_size=out, num_blocks=(1, 1, 1, 1))
        p, s = cvae.unimodal_cvae_init(jax.random.PRNGKey(out), cfg)
        ckpt_mod.save_lightning_ckpt(str(tmp / f"{name}.ckpt"), p, s)

    import sys

    sys.path.insert(0, "scripts")
    import serve_embeddings as se

    # monkeypatch the model config so the service builds the shallow variant
    orig = cvae.CVAEConfig

    def shallow_cfg(*a, **kw):
        kw["num_blocks"] = (1, 1, 1, 1)
        return orig(*a, **kw)

    cvae.CVAEConfig = shallow_cfg
    try:
        service = se.EmbeddingService(str(tmp / "wave.ckpt"), str(tmp / "time.ckpt"), z_dim=4)
    finally:
        cvae.CVAEConfig = orig
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), se.make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield httpd.server_address, service
    httpd.shutdown()


def _request(addr, method, path, body=None):
    conn = http.client.HTTPConnection(*addr, timeout=300)
    conn.request(method, path, body=json.dumps(body) if body else None,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def test_healthz(server):
    addr, _ = server
    status, payload = _request(addr, "GET", "/healthz")
    assert status == 200 and payload["status"] == "ok" and payload["z_dim"] == 4


def test_embed_roundtrip(server):
    addr, service = server
    rng = np.random.default_rng(0)
    wf = rng.normal(size=(5, 46)).astype(np.float32)
    isi = np.abs(rng.normal(size=(5, 80))).astype(np.float32)
    status, payload = _request(addr, "POST", "/embed",
                               {"waveforms": wf.tolist(), "isi_dists": isi.tolist(), "source": 2})
    assert status == 200
    assert np.asarray(payload["waveform"]).shape == (5, 4)
    assert np.asarray(payload["joint"]).shape == (5, 8)
    # server output equals a direct library call
    w, i, j, _ = service.embed(wf, isi, 2, False)
    np.testing.assert_allclose(np.asarray(payload["joint"]), np.asarray(j), rtol=1e-5, atol=1e-6)


def test_embed_bad_requests(server):
    addr, _ = server
    status, payload = _request(addr, "POST", "/embed", {"waveforms": [[1, 2]]})
    assert status == 400 and "isi_dists" in payload["error"]
    status, payload = _request(addr, "POST", "/embed",
                               {"waveforms": [[1, 2]], "isi_dists": [[1], [2]]})
    assert status == 400
    status, payload = _request(addr, "GET", "/nope")
    assert status == 404


def test_service_from_artifacts(tmp_path):
    """--wave-artifact/--time-artifact serve exported StableHLO models with
    embeddings identical to the checkpoint-backed path."""
    import sys

    sys.path.insert(0, "scripts")
    import serve_embeddings as se

    from hippie_tpu import export as hexport

    trees = {}
    for name, out in (("wave", 50), ("time", 100)):
        cfg = cvae.CVAEConfig(z_dim=4, output_size=out, num_blocks=(1, 1, 1, 1))
        p, s = cvae.unimodal_cvae_init(jax.random.PRNGKey(out), cfg)
        trees[name] = (p, s)
        blob = hexport.export_embedder(p, s, input_len=out, platforms=("cpu",))
        hexport.save_artifact(str(tmp_path / f"{name}.hippie"), blob,
                              {"modality": "unimodal", "z_dim": 4})

    service = se.EmbeddingService(
        z_dim=4,
        wave_artifact=str(tmp_path / "wave.hippie"),
        time_artifact=str(tmp_path / "time.hippie"),
    )
    assert service.z_dim == 4
    rng = np.random.default_rng(0)
    wf = rng.normal(size=(5, 46)).astype(np.float32)
    isi = rng.uniform(0, 9, size=(5, 100)).astype(np.float32)
    w, i, j, _ = service.embed(wf, isi, 0, False)
    assert w.shape == (5, 4) and i.shape == (5, 4) and j.shape == (5, 8)

    # parity vs the library embed path on the same preprocessed inputs
    import jax.numpy as jnp
    from hippie_tpu.evaluate import embeddings as emb
    from hippie_tpu.ops import preprocess

    wave_p = preprocess.preprocess_waveforms(jnp.asarray(wf), normalize=False)
    isi_p = preprocess.preprocess_isi(jnp.asarray(isi), normalize=False)
    src = jnp.zeros((5,), jnp.int32)
    want_w = np.asarray(emb.embed_unimodal(*trees["wave"], wave_p, src))
    want_i = np.asarray(emb.embed_unimodal(*trees["time"], isi_p, src))
    np.testing.assert_allclose(w, want_w, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(i, want_i, rtol=1e-5, atol=1e-6)
