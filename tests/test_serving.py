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
    # out-of-range source: the XLA gather would silently clamp to the last
    # source-embedding row and return wrong embeddings with a 200
    status, payload = _request(addr, "POST", "/embed",
                               {"waveforms": [[1, 2]], "isi_dists": [[1, 2]],
                                "source": 999})
    assert status == 400 and "source" in payload["error"]


def test_worker_error_surfaces_as_500(server):
    """A failure inside the dispatch worker must come back as a JSON 500,
    not a dropped socket."""
    addr, service = server
    saved = dict(service._embed_fns)

    def boom(*a, **kw):
        raise RuntimeError("injected device failure")

    try:
        service._embed_fns = {k: boom for k in saved}
        status, payload = _request(addr, "POST", "/embed",
                                   {"waveforms": [[1.0, 2.0]],
                                    "isi_dists": [[1.0, 2.0]]})
        assert status == 500 and "injected device failure" in payload["error"]
    finally:
        service._embed_fns = saved
    # the service still works afterwards
    status, payload = _request(addr, "POST", "/embed",
                               {"waveforms": [[1.0, 2.0]], "isi_dists": [[1.0, 2.0]]})
    assert status == 200


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


def test_coalesced_group_matches_serial(server):
    """The dispatch worker concatenates compatible pending requests into ONE
    device call; per-request slices must equal what each request would get
    served alone (row-local preprocessing + row-independent eval forward)."""
    import sys

    sys.path.insert(0, "scripts")
    import serve_embeddings as se

    _, service = server
    rng = np.random.default_rng(3)
    items = [
        se._Item(rng.normal(size=(r, 46)).astype(np.float32),
                 np.abs(rng.normal(size=(r, 80))).astype(np.float32),
                 src, False)
        for r, src in ((3, 0), (5, 2), (2, 1))
    ]
    before = service.device_dispatches
    service._run_group(list(items))
    assert service.device_dispatches == before + 1
    for it in items:
        assert it.event.is_set() and it.err is None
        w, i, j, _ = it.out
        sw, si, sj, _ = service.embed(it.wf, it.isi, it.source, it.normalize)
        np.testing.assert_allclose(np.asarray(j), np.asarray(sj), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(w), np.asarray(sw), rtol=1e-5, atol=1e-6)


def test_concurrent_clients(server):
    """N concurrent HTTP clients: every reply must carry that client's own
    rows' embeddings (no cross-request mixing), and the single-dispatch queue
    must keep stats consistent."""
    addr, service = server
    rng = np.random.default_rng(4)
    inputs = [
        (rng.normal(size=(4, 46)).astype(np.float32),
         np.abs(rng.normal(size=(4, 80))).astype(np.float32))
        for _ in range(6)
    ]
    results = [None] * len(inputs)

    def client(k):
        wf, isi = inputs[k]
        status, payload = _request(addr, "POST", "/embed",
                                   {"waveforms": wf.tolist(), "isi_dists": isi.tolist()})
        results[k] = (status, payload)

    threads = [threading.Thread(target=client, args=(k,)) for k in range(len(inputs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for k, (status, payload) in enumerate(results):
        assert status == 200
        wf, isi = inputs[k]
        want_w, want_i, want_j, _ = service.embed(wf, isi, 0, False)
        np.testing.assert_allclose(np.asarray(payload["joint"]), np.asarray(want_j),
                                   rtol=1e-5, atol=1e-6)
    status, stats = _request(addr, "GET", "/stats")
    assert status == 200
    assert stats["requests"] >= len(inputs)
    assert stats["device_dispatches"] >= 1
    assert "p50_latency_ms" in stats and "p99_latency_ms" in stats


def test_joint_service_from_checkpoint(tmp_path):
    """--joint-checkpoint serves the MultiModalCVAE: reply carries 'joint'
    only, values match the library embed_multimodal path."""
    import sys

    sys.path.insert(0, "scripts")
    import serve_embeddings as se

    cfg = cvae.MultiModalConfig(z_dim=4, num_blocks=(1, 1, 1, 1))
    p, s = cvae.multimodal_cvae_init(jax.random.PRNGKey(9), cfg)
    ckpt = str(tmp_path / "joint.ckpt")
    ckpt_mod.save_lightning_ckpt(ckpt, p, s)

    service = se.EmbeddingService(z_dim=99, joint_ckpt=ckpt)
    assert service.mode == "joint" and service.z_dim == 4

    rng = np.random.default_rng(5)
    wf = rng.normal(size=(5, 46)).astype(np.float32)
    isi = np.abs(rng.normal(size=(5, 80))).astype(np.float32)
    w, i, j, _ = service.embed(wf, isi, 1, False)
    assert w is None and i is None and j.shape == (5, 4)

    import jax.numpy as jnp

    from hippie_tpu.evaluate import embeddings as emb
    from hippie_tpu.ops import preprocess

    wave_p = preprocess.preprocess_waveforms(jnp.asarray(wf), normalize=False)
    isi_p = preprocess.preprocess_isi(jnp.asarray(isi), normalize=False)
    src = jnp.ones((5,), jnp.int32)
    want = np.asarray(emb.embed_multimodal(p, s, wave_p, isi_p, src))
    np.testing.assert_allclose(j, want, rtol=1e-5, atol=1e-6)

    # HTTP contract: joint-only reply
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), se.make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        status, payload = _request(httpd.server_address, "POST", "/embed",
                                   {"waveforms": wf.tolist(), "isi_dists": isi.tolist(),
                                    "source": 1})
        assert status == 200
        assert "waveform" not in payload and "isi" not in payload
        np.testing.assert_allclose(np.asarray(payload["joint"]), want, rtol=1e-4, atol=1e-5)
        status, health = _request(httpd.server_address, "GET", "/healthz")
        assert health["mode"] == "joint"
    finally:
        httpd.shutdown()


def test_chunk_to_warm_buckets(server):
    """Coalesced groups are split so each chunk pads to a bucket the device
    has already compiled — a burst can't stall every waiter behind one fresh
    compile of a never-seen (larger) bucket. A single oversized request still
    runs alone and warms its bucket."""
    import sys

    sys.path.insert(0, "scripts")
    import serve_embeddings as se

    _, service = server

    def items(rows_list):
        return [se._Item(np.zeros((r, 46), np.float32),
                         np.zeros((r, 80), np.float32), 0, False)
                for r in rows_list]

    saved = service._max_bucket
    try:
        # no warm bucket recorded yet (--warmup-rows 0): each request runs
        # alone — a burst must not coalesce into one giant cold bucket
        service._max_bucket = 0
        assert [len(c) for c in service._chunk_to_warm_buckets(items([64] * 16))] == [1] * 16

        # warm bucket 512: 16x64=1024 rows must split into 512-row chunks
        service._max_bucket = 512
        chunks = service._chunk_to_warm_buckets(items([64] * 16))
        assert [sum(len(it.wf) for it in c) for c in chunks] == [512, 512]

        # a lone oversized request forms its own chunk (runs, warms 1024)
        chunks = service._chunk_to_warm_buckets(items([700, 64]))
        assert [sum(len(it.wf) for it in c) for c in chunks] == [700, 64]

        # under-cap group stays whole
        chunks = service._chunk_to_warm_buckets(items([64, 64]))
        assert [sum(len(it.wf) for it in c) for c in chunks] == [128]
    finally:
        service._max_bucket = saved


def test_width_agnostic_preprocess_program(server):
    """Requests of different raw widths (under the caps) must reuse ONE
    compiled preprocess program per row bucket — the warmup ladder then
    covers first requests regardless of raw width — and their embeddings
    must match the exact-width library path."""
    _, service = server
    assert service.max_wave_width > 0 and service.max_isi_width > 0
    rng = np.random.default_rng(11)

    wf_a = rng.normal(size=(4, 41)).astype(np.float32)
    isi_a = np.abs(rng.normal(size=(4, 91))).astype(np.float32)
    w_a, _, _, _ = service.embed(wf_a, isi_a, 0, False)  # compiles the padded program

    # Public no-recompile signal: jax.monitoring's backend-compile event
    # fires once per fresh XLA compile and never on tracing-cache hits
    # (stable public API, unlike the jitted function's _cache_size()).
    import jax.monitoring

    compiles = []

    def _on_event(name, secs, **kw):
        if name == "/jax/core/compile/backend_compile_duration":
            compiles.append(name)

    jax.monitoring.register_event_duration_secs_listener(_on_event)
    try:
        wf_b = rng.normal(size=(4, 33)).astype(np.float32)
        isi_b = np.abs(rng.normal(size=(4, 77))).astype(np.float32)
        w, i, j, _ = service.embed(wf_b, isi_b, 1, False)
    finally:
        jax.monitoring.unregister_event_duration_listener(_on_event)
    # a different raw width did NOT trigger a new compile
    assert compiles == []
    assert np.asarray(w).shape == (4, service.z_dim)
    assert np.asarray(j).shape == (4, 2 * service.z_dim)
    assert np.all(np.isfinite(np.asarray(j)))
    # widths key the coalescing groups, so mixed-width replies can't mix rows
    assert not np.allclose(np.asarray(w_a), np.asarray(w))


def test_warmup_ladder(server):
    """warmup() accepts a bucket ladder: every distinct power-of-two bucket
    gets one pre-compile request and the coalescing cap (_max_bucket) ends at
    the ladder's top, so burst groups can span the full warm range."""
    _, service = server
    saved = service._max_bucket
    before = service.requests
    try:
        service._max_bucket = 0
        service.warmup([512, 600, 1024])  # 600 buckets to 1024: deduped
        assert service._max_bucket == 1024
        assert service.requests - before == 2  # 512 + 1024, not 3
        service.warmup(0)  # legacy int form, 0 = no-op
        assert service.requests - before == 2
    finally:
        service._max_bucket = max(saved, service._max_bucket)


def test_warmup_widths_respect_caps(server):
    """Warmup must warm the program live requests take, on BOTH axes:

    - rows: warmup entries bucket through the service's single shared rule
      (``_bucket_rows``, also used by _run_group and the coalescer cap), so
      a sub-floor ladder entry like 64 warms the floor bucket a live 64-row
      request pads to — agreement by construction, not by two copies.
    - widths: when a width cap is SMALLER than the synthetic 46/100
      defaults, the warmup rows must clamp to the cap (padded path) —
      otherwise the ladder compiles only the exact-width programs and
      every live bucket stays cold.
    """
    _, service = server
    b = service._bucket_rows(64)  # THE live-path bucket for 64 rows
    assert b >= 64
    seen = []
    orig_embed = service.embed
    saved = (service.max_wave_width, service.max_isi_width)
    service.embed = lambda wf, isi, src, norm: seen.append((wf.shape, isi.shape))
    try:
        service.max_wave_width, service.max_isi_width = 40, 80
        service.warmup([64])
        assert seen == [((b, 40), (b, 80))]  # clamped -> padded program
        seen.clear()
        service.max_wave_width, service.max_isi_width = 256, 512
        service.warmup([64])
        assert seen == [((b, 46), (b, 100))]  # defaults already under caps
    finally:
        service.embed = orig_embed
        service.max_wave_width, service.max_isi_width = saved


def test_warmup_async_interleaves_with_live_requests(server):
    """--warmup-async contract: live requests are served WHILE the ladder
    warms (both funnel through the single-dispatch queue, so they
    interleave rather than the live request waiting for the whole ladder)."""
    _, service = server
    started = threading.Event()
    done = threading.Event()

    def warm():
        started.set()
        service.warmup([512])
        done.set()

    t = threading.Thread(target=warm)
    t.start()
    started.wait(5)
    rng = np.random.default_rng(5)
    wf = rng.normal(size=(3, 46)).astype(np.float32)
    isi = np.abs(rng.normal(size=(3, 100))).astype(np.float32)
    w, i, j, _ = service.embed(wf, isi, 0, False)  # must not deadlock
    assert np.asarray(j).shape == (3, 2 * service.z_dim)
    t.join(30)
    assert done.is_set()


def test_live_path_and_warmup_share_bucket_rule(server, monkeypatch):
    """Regression for the r4 red test: the live dispatch path (_run_group)
    and warmup() must consume ONE bucket function. Route _bucket_rows
    through a recorder and assert both paths hit it with the same answer."""
    _, service = server
    calls = []
    real = type(service)._bucket_rows

    def recording(n):
        b = real(n)
        calls.append((n, b))
        return b

    monkeypatch.setattr(type(service), "_bucket_rows", staticmethod(recording))
    rng = np.random.default_rng(3)
    wf = rng.normal(size=(5, 46)).astype(np.float32)
    isi = np.abs(rng.normal(size=(5, 100))).astype(np.float32)
    service.embed(wf, isi, 0, False)  # live path
    live = [b for (n, b) in calls if n == 5]
    assert live, "live path did not consult _bucket_rows"
    calls.clear()
    orig_embed = service.embed
    service.embed = lambda *a: None
    try:
        service.warmup([5])
        warm = [b for (n, b) in calls if n == 5]
        assert warm and warm[0] == live[0]
    finally:
        service.embed = orig_embed


def test_serving_rides_aot_cache(tmp_path, monkeypatch):
    """--aot-dir contract: with a default AOT dir configured, the live
    dispatch path routes BOTH the preprocess program and the embed programs
    through the executable cache (warm-restart lever: a fresh process loads
    serialized executables instead of re-tracing the whole warmup ladder),
    and a second service instance reuses the on-disk entries instead of
    writing new ones."""
    import sys

    sys.path.insert(0, "scripts")
    import serve_embeddings as se

    from hippie_tpu.utils import aot

    tmp = tmp_path
    for name, out in (("wave", 50), ("time", 100)):
        cfg = cvae.CVAEConfig(z_dim=4, output_size=out, num_blocks=(1, 1, 1, 1))
        p, s = cvae.unimodal_cvae_init(jax.random.PRNGKey(out), cfg)
        ckpt_mod.save_lightning_ckpt(str(tmp / f"{name}.ckpt"), p, s)

    aot_dir = tmp / "aot"
    monkeypatch.setattr(aot, "_DEFAULT_DIR", str(aot_dir))
    descs = []
    real_call = aot.cached_call

    def recording(fn, args, d, static_desc, lower_kwargs=None):
        descs.append(static_desc)
        return real_call(fn, args, d, static_desc, lower_kwargs)

    monkeypatch.setattr(aot, "cached_call", recording)

    orig = cvae.CVAEConfig

    def shallow_cfg(*a, **kw):
        kw["num_blocks"] = (1, 1, 1, 1)
        return orig(*a, **kw)

    cvae.CVAEConfig = shallow_cfg
    try:
        service = se.EmbeddingService(str(tmp / "wave.ckpt"), str(tmp / "time.ckpt"), z_dim=4)
    finally:
        cvae.CVAEConfig = orig

    rng = np.random.default_rng(7)
    wf = rng.normal(size=(3, 46)).astype(np.float32)
    isi = np.abs(rng.normal(size=(3, 100))).astype(np.float32)
    w1, i1, j1, _ = service.embed(wf, isi, 0, False)

    assert any(d.startswith("serve_preprocess") for d in descs), descs
    assert any(d.startswith("embed_unimodal") for d in descs), descs
    entries = sorted(f.name for f in aot_dir.iterdir() if f.suffix in (".jexec", ".shlo"))
    assert entries, "no executable cache entries written"

    # Warm restart: fresh in-process memo, second service — must LOAD the
    # on-disk entries (no new files) and reproduce the same embeddings.
    aot._EXEC_MEMO.clear()
    cvae.CVAEConfig = shallow_cfg
    try:
        service2 = se.EmbeddingService(str(tmp / "wave.ckpt"), str(tmp / "time.ckpt"), z_dim=4)
    finally:
        cvae.CVAEConfig = orig
    w2, i2, j2, _ = service2.embed(wf, isi, 0, False)
    entries2 = sorted(f.name for f in aot_dir.iterdir() if f.suffix in (".jexec", ".shlo"))
    assert entries2 == entries, (entries, entries2)
    np.testing.assert_array_equal(np.asarray(j1), np.asarray(j2))
