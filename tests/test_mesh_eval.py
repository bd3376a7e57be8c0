"""Data-parallel eval over the device mesh must match single-device eval.

Embedding extraction and the KNN sweep are per-row computations, so sharding
the rows over the 'data' axis (params / train set replicated) is semantics-
preserving; these tests pin that on the 8-device CPU mesh (conftest)."""

import jax
import numpy as np
import pytest

from hippie_tpu.evaluate import embeddings as emb
from hippie_tpu.evaluate import knn_eval
from hippie_tpu.models import cvae
from hippie_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return pmesh.make_mesh(8)


def test_embed_unimodal_mesh_matches_single(mesh):
    cfg = cvae.CVAEConfig(z_dim=5, output_size=50, class_hidden_dim=5,
                          num_sources=5, num_classes=5)
    params, bn = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    data = rng.normal(size=(24, 50)).astype(np.float32)
    source = rng.integers(0, 5, size=24).astype(np.int32)

    ref = np.asarray(emb.embed_unimodal(params, bn, data, source))
    out = emb.embed_unimodal(params, bn, data, source, mesh=mesh)
    # the padded bucket (512) splits 64 rows/device
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-5)


def test_knn_sweep_mesh_matches_single(mesh):
    rng = np.random.default_rng(2)
    train_x = rng.normal(size=(40, 6)).astype(np.float32)
    train_y = rng.integers(0, 4, size=40)
    test_x = rng.normal(size=(23, 6)).astype(np.float32)  # 23 % 8 != 0: pad path
    ks = list(range(5, 20))

    ref = knn_eval.knn_predict_sweep(train_x, train_y, test_x, ks)
    out = knn_eval.knn_predict_sweep(train_x, train_y, test_x, ks, mesh=mesh)
    for k in ks:
        assert out[k].shape == (23,)
        np.testing.assert_array_equal(out[k], ref[k])


def test_mesh_eval_with_aot_dir_and_no_exec_serialization(mesh, tmp_path, monkeypatch):
    """--aot-dir is on by default, so mesh-sharded eval programs flow through
    aot.maybe_cached_call. On a JAX without executable serialization the
    cache's jax.export fallback cannot carry multi-device shardings
    (device_fit pre-guards its dp fit programs for the same reason) — the
    central guard must run such programs UNCACHED instead of exporting them."""
    from hippie_tpu.utils import aot

    cfg = cvae.CVAEConfig(z_dim=5, output_size=50, class_hidden_dim=5,
                          num_sources=5, num_classes=5)
    params, bn = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    data = rng.normal(size=(24, 50)).astype(np.float32)
    source = rng.integers(0, 5, size=24).astype(np.int32)
    ref = np.asarray(emb.embed_unimodal(params, bn, data, source))  # uncached

    monkeypatch.setattr(aot, "have_exec_serialization", lambda: False)
    aot.set_default_dir(str(tmp_path))
    try:
        out = emb.embed_unimodal(params, bn, data, source, mesh=mesh)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-5)
        # no .shlo artifact may be written for the sharded program
        assert not [f for f in tmp_path.iterdir() if f.suffix == ".shlo"]
    finally:
        aot.set_default_dir(None)
