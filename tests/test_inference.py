"""End-to-end inference CLI (scripts/inference_from_trained_model.py).

The reference CLI hardcodes z_dim=64 / num_sources=5 defaults
(inference_from_trained_model.py:16-22,97) and silently mis-loads any
checkpoint with other geometry; ours infers the full geometry from the
checkpoint's own weight shapes (export.infer_*_config) — covered here with
non-default z_dim/num_sources/num_blocks and NO geometry flags.
"""

import importlib.util
import os

import jax
import numpy as np
import pandas as pd
import pytest

from hippie_tpu.data import synth
from hippie_tpu.models import cvae
from hippie_tpu.train import checkpoint as ckpt_mod

Z, NSRC, BLOCKS = 4, 7, (1, 1, 1, 1)


def _load_cli():
    spec = importlib.util.spec_from_file_location(
        "inference_cli", "scripts/inference_from_trained_model.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("infer_data")
    synth.make_dataset(str(root), "tiny-rig", n=24, seed=0)
    return root


def _ckpt(tmp_path, name, out_size, seed):
    cfg = cvae.CVAEConfig(z_dim=Z, output_size=out_size, num_sources=NSRC,
                          num_classes=3, num_blocks=BLOCKS)
    p, s = cvae.unimodal_cvae_init(jax.random.PRNGKey(seed), cfg)
    path = tmp_path / f"{name}.ckpt"
    ckpt_mod.save_lightning_ckpt(str(path), p, s)
    return path


def test_inference_cli_infers_geometry_from_ckpt(dataset_root, tmp_path, capsys):
    wave = _ckpt(tmp_path, "wave", 50, 0)
    time = _ckpt(tmp_path, "time", 100, 1)
    out = tmp_path / "out"
    # No --z_dim / --num-sources: the (wrong) reference defaults 64/5 apply
    # unless geometry is inferred from the checkpoints.
    _load_cli().main([
        "--dataset", "tiny-rig", "--data-root", str(dataset_root),
        "--wave-checkpoint", str(wave), "--time-checkpoint", str(time),
        "--output-dir", str(out),
    ])
    stdout = capsys.readouterr().out
    assert f"z_dim={Z}" in stdout and f"num_sources={NSRC}" in stdout
    assert "were skipped" not in stdout  # every ckpt key matched the template
    assert "Models loaded successfully" in stdout

    for kind, dim in (("waveform", Z), ("isi", Z), ("joint", 2 * Z)):
        df = pd.read_csv(out / f"tiny-rig_{kind}_embeddings.csv")
        assert df.shape == (24, dim + 2)  # z cols + label + label_name
        assert os.path.exists(out / f"tiny-rig_{kind}_umap.png")
    emb = df[[str(i) for i in range(2 * Z)]].to_numpy()
    assert np.all(np.isfinite(emb))


def test_inference_cli_joint_checkpoint_and_clustering(dataset_root, tmp_path, capsys):
    mm_cfg = cvae.MultiModalConfig(z_dim=Z, num_sources=NSRC, num_classes=3,
                                   num_blocks=BLOCKS)
    p, s = cvae.multimodal_cvae_init(jax.random.PRNGKey(2), mm_cfg)
    joint = tmp_path / "joint.ckpt"
    ckpt_mod.save_lightning_ckpt(str(joint), p, s)
    out = tmp_path / "out"
    _load_cli().main([
        "--dataset", "tiny-rig", "--data-root", str(dataset_root),
        "--joint-checkpoint", str(joint), "--output-dir", str(out),
        "--cluster", "2",
    ])
    stdout = capsys.readouterr().out
    assert f"z_dim={Z}" in stdout and "were skipped" not in stdout
    df = pd.read_csv(out / "tiny-rig_joint_embeddings.csv")
    assert df.shape == (24, Z + 2)
    clusters = pd.read_csv(out / "tiny-rig_joint_clusters.csv")
    assert set(clusters["cluster"].unique()) <= {0, 1}
    assert len(clusters) == 24


def test_inference_cli_string_labels(tmp_path, capsys):
    """metadata.csv with STRING labels (quirk Q12: the reference assumes
    integer codes and crashes computing the source pass-through); our CLI
    must encode them and export label_name from the strings."""
    root = tmp_path / "data"
    synth.make_dataset(str(root), "str-rig", n=12, seed=3)
    names = ["pyramidal", "interneuron", "granule"]
    pd.DataFrame({"label": [names[i % 3] for i in range(12)]}).to_csv(
        root / "str-rig" / "metadata.csv", index=False)
    wave = _ckpt(tmp_path, "wave_s", 50, 4)
    time = _ckpt(tmp_path, "time_s", 100, 5)
    out = tmp_path / "out_s"
    _load_cli().main([
        "--dataset", "str-rig", "--data-root", str(root),
        "--wave-checkpoint", str(wave), "--time-checkpoint", str(time),
        "--output-dir", str(out),
    ])
    stdout = capsys.readouterr().out
    assert "3 unique labels" in stdout
    df = pd.read_csv(out / "str-rig_joint_embeddings.csv")
    assert set(df["label_name"].unique()) == set(names)
    assert df.shape == (12, 2 * Z + 2)
