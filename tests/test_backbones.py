"""Backbone parity vs the torch reference goldens (tests/golden_gen.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippie_tpu.models import backbones as bb
from hippie_tpu.models.cvae import param_count
from hippie_tpu.train import checkpoint as ckpt


def _sd(gold, prefix):
    return {k[len(prefix):]: gold[k] for k in gold.files if k.startswith(prefix)}


@pytest.fixture(scope="module")
def gold(goldens_dir):
    return np.load(goldens_dir / "backbones.npz")


@pytest.fixture(scope="module")
def enc_tree(gold):
    p, s = bb.resnet18_enc_init(jax.random.PRNGKey(0), z_dim=10)
    p, s, loaded, skipped = ckpt.from_torch_state_dict(_sd(gold, "enc_sd."), p, s, prefix="")
    assert not skipped, skipped
    return p, s


@pytest.fixture(scope="module")
def dec_tree(gold):
    p, s = bb.resnet18_dec_init(jax.random.PRNGKey(0), z_dim=10, output_size=50)
    p, s, loaded, skipped = ckpt.from_torch_state_dict(_sd(gold, "dec_sd."), p, s, prefix="")
    assert not skipped, skipped
    return p, s


def test_param_counts():
    """Empirical reference counts (SURVEY.md §2.3): enc 3,853,908; dec(50) 4,200,691."""
    ep, _ = bb.resnet18_enc_init(jax.random.PRNGKey(0), z_dim=10)
    dp, _ = bb.resnet18_dec_init(jax.random.PRNGKey(0), z_dim=10, output_size=50)
    dp100, _ = bb.resnet18_dec_init(jax.random.PRNGKey(0), z_dim=10, output_size=100)
    assert param_count(ep) == 3_853_908
    assert param_count(dp) == 4_200_691
    assert param_count(dp100) == 4_203_941


def test_state_dict_roundtrip_key_order(gold, enc_tree):
    """Our flattened key order must equal torch state_dict order (ckpt contract)."""
    p, s = enc_tree
    ours = list(ckpt.to_torch_state_dict(p, s, prefix="").keys())
    theirs = [k[len("enc_sd."):] for k in gold.files if k.startswith("enc_sd.")]
    assert ours == theirs


def test_dec_state_dict_key_order(gold, dec_tree):
    p, s = dec_tree
    ours = list(ckpt.to_torch_state_dict(p, s, prefix="").keys())
    theirs = [k[len("dec_sd."):] for k in gold.files if k.startswith("dec_sd.")]
    assert ours == theirs


def test_encoder_forward_eval(gold, enc_tree):
    p, s = enc_tree
    x = jnp.asarray(gold["x"]).transpose(0, 2, 1)  # [B,1,50] -> [B,50,1]
    out, _ = bb.resnet18_enc_apply(p, s, x, training=False)
    np.testing.assert_allclose(np.asarray(out), gold["enc_out_eval"], rtol=1e-4, atol=1e-5)


def test_decoder_forward_eval(gold, dec_tree):
    p, s = dec_tree
    z = jnp.asarray(gold["zin"])
    out, _ = bb.resnet18_dec_apply(p, s, z, training=False)
    np.testing.assert_allclose(
        np.asarray(out), gold["dec_out_eval"].reshape(out.shape), rtol=1e-4, atol=1e-5
    )


def test_encoder_forward_train_and_running_stats(gold, enc_tree):
    """Train mode: batch-stat normalization + torch-style running stat EMA."""
    p, s = enc_tree
    x = jnp.asarray(gold["x"]).transpose(0, 2, 1)
    out, new_s = bb.resnet18_enc_apply(p, s, x, training=True)
    np.testing.assert_allclose(np.asarray(out), gold["enc_out_train"], rtol=1e-3, atol=1e-4)
    # enc_sd_after.* are the running stats after the golden's one train forward.
    np.testing.assert_allclose(
        np.asarray(new_s["bn1"]["running_mean"]),
        gold["enc_sd_after.bn1.running_mean"],
        rtol=1e-4,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_s["layer4"]["1"]["bn2"]["running_var"]),
        gold["enc_sd_after.layer4.1.bn2.running_var"],
        rtol=1e-4,
        atol=1e-6,
    )


def test_decoder_forward_train(gold, dec_tree):
    p, s = dec_tree
    z = jnp.asarray(gold["zin"])
    out, new_s = bb.resnet18_dec_apply(p, s, z, training=True)
    np.testing.assert_allclose(
        np.asarray(out), gold["dec_out_train"].reshape(out.shape), rtol=1e-3, atol=1e-4
    )


def test_masked_batch_equals_small_batch(enc_tree):
    """A padded batch with mask must reproduce the unpadded batch exactly."""
    p, s = enc_tree
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 50, 1))
    out_small, s_small = bb.resnet18_enc_apply(p, s, x, training=True)
    xpad = jnp.concatenate([x, jnp.ones((8, 50, 1)) * 100.0], axis=0)
    mask = jnp.concatenate([jnp.ones(8), jnp.zeros(8)])
    out_pad, s_pad = bb.resnet18_enc_apply(p, s, xpad, training=True, mask=mask)
    np.testing.assert_allclose(np.asarray(out_pad[:8]), np.asarray(out_small), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(s_pad["bn1"]["running_mean"]),
        np.asarray(s_small["bn1"]["running_mean"]),
        rtol=1e-4,
        atol=1e-6,
    )
