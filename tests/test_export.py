"""jax.export deployment artifacts: parity, symbolic batch, ckpt round trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hippie_tpu import export as hexport
from hippie_tpu.evaluate import embeddings as emb
from hippie_tpu.models import cvae


@pytest.fixture(scope="module")
def small_model():
    cfg_m = cvae.CVAEConfig(z_dim=4, output_size=50, num_classes=3, num_blocks=(1, 1, 1, 1))
    params, bn = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg_m)
    return cfg_m, params, bn


def test_exported_embedder_matches_library(small_model, tmp_path):
    cfg_m, params, bn = small_model
    blob = hexport.export_embedder(params, bn, input_len=50, platforms=("cpu",))
    path = tmp_path / "wave.hippie"
    hexport.save_artifact(str(path), blob, {"modality": "unimodal", "input_len": 50})
    call, manifest = hexport.load_artifact(str(path))
    assert manifest["format_version"] == hexport.FORMAT_VERSION

    rng = np.random.default_rng(1)
    for n in (3, 17):  # symbolic batch: one artifact, several sizes
        data = rng.normal(size=(n, 50)).astype(np.float32)
        src = np.zeros((n,), np.int32)
        got = call(data, src)
        want = np.asarray(emb.embed_unimodal(params, bn, jnp.asarray(data), jnp.asarray(src)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_default_precision_close_to_highest(small_model, tmp_path):
    """--precision default bakes TPU-bf16 matmuls into the artifact for
    serving throughput; embeddings must stay close to the fp32-exact parity
    contract (on CPU both lower to fp32, so the export path itself — flag
    plumbing, manifest, symbolic batch — is what this pins)."""
    cfg_m, params, bn = small_model
    blob = hexport.export_embedder(params, bn, input_len=50, platforms=("cpu",),
                                   precision="default")
    path = tmp_path / "wave_fast.hippie"
    hexport.save_artifact(str(path), blob, {"modality": "unimodal", "input_len": 50})
    call, _ = hexport.load_artifact(str(path))
    rng = np.random.default_rng(4)
    data = rng.normal(size=(9, 50)).astype(np.float32)
    src = np.zeros((9,), np.int32)
    got = call(data, src)
    want = np.asarray(emb.embed_unimodal(params, bn, jnp.asarray(data), jnp.asarray(src)))
    cos = np.sum(got * want, 1) / (
        np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1))
    assert cos.min() > 0.999


def test_export_multimodal_embedder(tmp_path):
    cfg_m = cvae.MultiModalConfig(z_dim=4, num_blocks=(1, 1, 1, 1))
    params, bn = cvae.multimodal_cvae_init(jax.random.PRNGKey(2), cfg_m)
    blob = hexport.export_embedder(params, bn, input_lens=(50, 100), platforms=("cpu",))
    path = tmp_path / "joint.hippie"
    hexport.save_artifact(str(path), blob, {"modality": "multimodal"})
    call, _ = hexport.load_artifact(str(path))
    rng = np.random.default_rng(3)
    wave = rng.normal(size=(5, 50)).astype(np.float32)
    isi = rng.normal(size=(5, 100)).astype(np.float32)
    src = np.zeros((5,), np.int32)
    got = call(wave, isi, src)
    want = np.asarray(emb.embed_multimodal(
        params, bn, jnp.asarray(wave), jnp.asarray(isi), jnp.asarray(src)
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_from_checkpoint_infers_config(small_model, tmp_path):
    cfg_m, params, bn = small_model
    from hippie_tpu.train import checkpoint as ckpt_mod

    ckpt = tmp_path / "model.ckpt"
    ckpt_mod.save_lightning_ckpt(str(ckpt), params, bn)
    out = tmp_path / "model.hippie"
    manifest = hexport.export_from_checkpoint(str(ckpt), str(out), platforms=("cpu",))
    assert manifest["z_dim"] == cfg_m.z_dim
    assert manifest["input_len"] == cfg_m.output_size
    assert manifest["num_blocks"] == list(cfg_m.num_blocks)

    call, _ = hexport.load_artifact(str(out))
    rng = np.random.default_rng(4)
    data = rng.normal(size=(7, 50)).astype(np.float32)
    src = np.zeros((7,), np.int32)
    want = np.asarray(emb.embed_unimodal(params, bn, jnp.asarray(data), jnp.asarray(src)))
    np.testing.assert_allclose(call(data, src), want, rtol=1e-5, atol=1e-6)


def test_export_cli(small_model, tmp_path, capsys):
    cfg_m, params, bn = small_model
    from hippie_tpu.train import checkpoint as ckpt_mod
    import importlib.util

    ckpt = tmp_path / "cli.ckpt"
    ckpt_mod.save_lightning_ckpt(str(ckpt), params, bn)
    out = tmp_path / "cli.hippie"
    spec = importlib.util.spec_from_file_location("export_model", "scripts/export_model.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(["--checkpoint", str(ckpt), "--output", str(out), "--platforms", "cpu"])
    assert out.exists()
    assert "exported" in capsys.readouterr().out


def test_export_from_multimodal_checkpoint(tmp_path):
    from hippie_tpu.train import checkpoint as ckpt_mod

    cfg_m = cvae.MultiModalConfig(z_dim=4, num_blocks=(1, 1, 1, 1))
    params, bn = cvae.multimodal_cvae_init(jax.random.PRNGKey(5), cfg_m)
    ckpt = tmp_path / "mm.ckpt"
    ckpt_mod.save_lightning_ckpt(str(ckpt), params, bn)
    out = tmp_path / "mm.hippie"
    manifest = hexport.export_from_checkpoint(str(ckpt), str(out), platforms=("cpu",))
    assert manifest["modality"] == "multimodal"
    assert manifest["input_lens"] == [50, 100]

    call, _ = hexport.load_artifact(str(out))
    rng = np.random.default_rng(6)
    wave = rng.normal(size=(4, 50)).astype(np.float32)
    isi = rng.normal(size=(4, 100)).astype(np.float32)
    src = np.zeros((4,), np.int32)
    want = np.asarray(emb.embed_multimodal(
        params, bn, jnp.asarray(wave), jnp.asarray(isi), jnp.asarray(src)
    ))
    np.testing.assert_allclose(call(wave, isi, src), want, rtol=1e-5, atol=1e-6)
