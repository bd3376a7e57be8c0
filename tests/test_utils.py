"""Utility subsystems: logging, wandb shim, profiling timers, embed bucketing."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from hippie_tpu.models import cvae
from hippie_tpu.evaluate import embeddings as emb
from hippie_tpu.utils.logging import JsonlLogger
from hippie_tpu.utils.profiling import StageTimer
from hippie_tpu.utils import wandb_shim


def test_jsonl_logger(tmp_path):
    path = tmp_path / "sub" / "metrics.jsonl"
    seen = []
    log = JsonlLogger(str(path), also=[seen.append])
    log({"epoch": 0, "loss": 1.5})
    log({"epoch": 1, "loss": 0.5})
    log.close()
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert [l["epoch"] for l in lines] == [0, 1]
    assert all("ts" in l for l in lines)
    assert seen == [{"epoch": 0, "loss": 1.5}, {"epoch": 1, "loss": 0.5}]


def test_wandb_shim_noop():
    w = wandb_shim.get()
    # every attribute/call chain is safe when wandb is absent/disabled
    w.init(project="x").log({"a": 1})
    w.log_artifact("nope.csv", name="n", type="t")
    assert not wandb_shim.is_enabled() or True


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert set(t.timings) == {"a", "b"}
    s = json.loads(t.summary())
    assert "total_s" in s


def test_embedding_bucketing_invariance():
    """Padded-bucket extraction must equal unpadded per-row results."""
    cfg = cvae.CVAEConfig(z_dim=4, output_size=50, num_blocks=(1, 1, 1, 1))
    p, s = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    for n in (3, 64, 65, 100):
        data = jnp.asarray(rng.normal(size=(n, 50)).astype(np.float32))
        src = jnp.zeros((n,), jnp.int32)
        e = np.asarray(emb.embed_unimodal(p, s, data, src))
        assert e.shape == (n, 4)
        # subset consistency: first rows of a larger batch match a smaller call
        e_sub = np.asarray(emb.embed_unimodal(p, s, data[: min(n, 5)], src[: min(n, 5)]))
        np.testing.assert_allclose(e[: min(n, 5)], e_sub, rtol=2e-4, atol=2e-5)
