"""lr-sweep CLI: K configs trained in one vmapped program (scripts/lr_sweep.py)."""

import importlib.util
import json

import pytest

from hippie_tpu.data import synth


def _load_module():
    spec = importlib.util.spec_from_file_location("lr_sweep", "scripts/lr_sweep.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sweepdata")
    synth.make_dataset(str(root), "sweep-synth", n=64, wave_width=46,
                       isi_width=100, num_classes=3, seed=0)
    return str(root)


def test_lr_mode_zero_lr_loses(synth_root, capsys):
    m = _load_module()
    rc = m.main([
        "--dataset", "sweep-synth", "--data-root", synth_root, "--pool", "self",
        "--modality", "wave", "--lrs", "0,3e-3", "--max-epochs", "3",
        "--batch-size", "16", "--num-blocks", "1,1,1,1", "--z-dim", "4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["winner_lr"] == 3e-3
    assert rec["best_val_loss"][1] < rec["best_val_loss"][0]
    assert rec["epochs_run"] == 3
    assert len(rec["configs"]) == 2


def test_seeds_mode_runs(synth_root, capsys):
    m = _load_module()
    rc = m.main([
        "--dataset", "sweep-synth", "--data-root", synth_root, "--pool", "self",
        "--modality", "time", "--mode", "seeds", "--n-seeds", "2",
        "--lr", "1e-3", "--max-epochs", "2", "--batch-size", "16",
        "--num-blocks", "1,1,1,1", "--z-dim", "4",
    ])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["mode"] == "seeds"
    assert len(rec["best_val_loss"]) == 2
    # independent seeds: the two replicas trained to different losses
    assert rec["best_val_loss"][0] != rec["best_val_loss"][1]
