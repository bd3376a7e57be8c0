"""Full cVAE parity vs torch reference goldens: forward, loss, params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippie_tpu.models import cvae
from hippie_tpu.ops import losses
from hippie_tpu.train import checkpoint as ckpt


@pytest.fixture(scope="module")
def gold(goldens_dir):
    return np.load(goldens_dir / "unimodal_cvae.npz")


@pytest.fixture(scope="module")
def tree(gold):
    cfg = cvae.CVAEConfig(z_dim=10, output_size=50, class_hidden_dim=5, num_sources=5, num_classes=5)
    p, s = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    sd = {k[len("sd0."):]: gold[k] for k in gold.files if k.startswith("sd0.")}
    p, s, loaded, skipped = ckpt.from_torch_state_dict(sd, p, s, prefix="")
    assert not skipped, skipped
    return p, s


def test_param_count():
    cfg = cvae.CVAEConfig(z_dim=10, output_size=50)
    p, _ = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    assert cvae.param_count(p) == 8_056_639  # SURVEY.md §2.3


def test_state_dict_key_order(gold, tree):
    p, s = tree
    ours = list(ckpt.to_torch_state_dict(p, s).keys())
    theirs = ["model." + k[len("sd0."):] for k in gold.files if k.startswith("sd0.")]
    assert ours == theirs


def test_forward_eval_with_class(gold, tree):
    p, s = tree
    (enc, mu, logvar, dec), _ = cvae.unimodal_cvae_apply(
        p, s,
        jnp.asarray(gold["data"][:, 0, :]),
        jnp.asarray(gold["source_labels"]),
        jnp.asarray(gold["class_labels"]),
        eps=jnp.asarray(gold["eps"]),
        training=False,
    )
    np.testing.assert_allclose(np.asarray(enc), gold["enc_eval"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mu), gold["mu_eval"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar), gold["logvar_eval"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dec), gold["dec_eval"].reshape(dec.shape), rtol=1e-3, atol=1e-4
    )


def test_forward_eval_without_class(gold, tree):
    """class_labels=None zeroes the class embedding (model.py:66)."""
    p, s = tree
    (enc, _, _, dec), _ = cvae.unimodal_cvae_apply(
        p, s,
        jnp.asarray(gold["data"][:, 0, :]),
        jnp.asarray(gold["source_labels"]),
        None,
        eps=jnp.asarray(gold["eps"]),
        training=False,
    )
    np.testing.assert_allclose(np.asarray(enc), gold["enc_eval_nocls"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dec), gold["dec_eval_nocls"].reshape(dec.shape), rtol=1e-3, atol=1e-4
    )


def test_train_forward_and_loss(gold, tree):
    p, s = tree
    data = jnp.asarray(gold["data"][:, 0, :])
    (enc, mu, logvar, dec), _ = cvae.unimodal_cvae_apply(
        p, s,
        data,
        jnp.asarray(gold["source_labels"]),
        jnp.asarray(gold["class_labels"]),
        eps=jnp.asarray(gold["eps"]),
        training=True,
    )
    np.testing.assert_allclose(np.asarray(enc), gold["enc_train"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dec), gold["dec_train"].reshape(dec.shape), rtol=1e-3, atol=1e-4
    )
    total, (mse, kl) = losses.vae_loss(data, dec, mu, logvar, beta=1.0)
    np.testing.assert_allclose(float(mse), float(gold["mse"]), rtol=1e-5)
    np.testing.assert_allclose(float(kl), float(gold["kl_mean"]), rtol=1e-5)
    np.testing.assert_allclose(float(total), float(gold["loss"]), rtol=1e-5)


def test_multimodal_forward_and_loss(goldens_dir):
    gold = np.load(goldens_dir / "multimodal_cvae.npz")
    cfg = cvae.MultiModalConfig(z_dim=10)
    p, s = cvae.multimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    assert cvae.param_count(p) == 16_115_748  # SURVEY.md §2.1
    sd = {k[len("sd."):]: gold[k] for k in gold.files if k.startswith("sd.")}
    p, s, loaded, skipped = ckpt.from_torch_state_dict(sd, p, s, prefix="")
    assert not skipped, skipped
    d1 = jnp.asarray(gold["d1"][:, 0, :])
    d2 = jnp.asarray(gold["d2"][:, 0, :])
    (enc, mu, logvar, dec1, dec2), _ = cvae.multimodal_cvae_apply(
        p, s, d1, d2,
        jnp.asarray(gold["sl"]), jnp.asarray(gold["cl"]),
        eps=jnp.asarray(gold["eps"]),
        training=False,
    )
    np.testing.assert_allclose(np.asarray(enc), gold["enc"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dec1), gold["dec1"].reshape(dec1.shape), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dec2), gold["dec2"].reshape(dec2.shape), rtol=1e-3, atol=1e-4)
    total, (mse1, mse2, kl) = losses.multimodal_vae_loss(
        d1, d2, dec1, dec2, mu, logvar, beta=1.0, mod1_weight=1.0, mod2_weight=1.0
    )
    np.testing.assert_allclose(float(mse1), float(gold["mse1"]), rtol=1e-5)
    np.testing.assert_allclose(float(mse2), float(gold["mse2"]), rtol=1e-5)
    np.testing.assert_allclose(float(total), float(gold["loss"]), rtol=1e-5)
