"""Conditional VAE models (unimodal wave/time and joint multimodal).

Re-design of the reference models (hippie/model.py:12-72 `hippieUnimodalCVAE`,
model.py:350-432 `MultiModalCVAE` — defined twice there, quirk Q1; we define
each once). Parameter pytrees mirror the torch module tree so the checkpoint
shim can translate Lightning ``state_dict`` keys mechanically.

Forward contract (matches model.py:64-72 / 424-432):
  unimodal:   (encoded, mu, logvar, decoded)
  multimodal: (encoded, mu, logvar, decoded1, decoded2)
where ``encoded`` is the deterministic z-dim encoder_fc output — the embedding
used downstream by the reference (scripts/utils.py:81) — NOT mu or z.

Class conditioning: ``class_labels=None`` (a static trace-time choice) zeroes
the class embedding exactly like model.py:66.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from hippie_tpu.nn import init as tinit
from hippie_tpu.nn.functional import batch_norm, batch_norm_init, dense, embedding, leaky_relu
from hippie_tpu.models.backbones import (
    resnet18_dec_apply,
    resnet18_dec_init,
    resnet18_enc_apply,
    resnet18_enc_init,
)


class CVAEConfig(NamedTuple):
    """Hyperparameters of a unimodal cVAE (reference model.py:13).

    ``num_blocks`` selects the backbone depth per stage; (2, 2, 2, 2) is the
    reference's ResNet18. Shallower variants exist for tests and small runs.
    """

    z_dim: int = 10
    output_size: int = 50
    class_hidden_dim: int = 5
    num_sources: int = 5
    num_classes: int = 5
    num_blocks: tuple = (2, 2, 2, 2)


class MultiModalConfig(NamedTuple):
    """Hyperparameters of the joint model (reference model.py:352)."""

    z_dim: int = 10
    output_size_wave: int = 50
    output_size_isi: int = 100
    class_hidden_dim: int = 5
    num_sources: int = 5
    num_classes: int = 5
    num_blocks: tuple = (2, 2, 2, 2)


# ---------------------------------------------------------------------------
# Unimodal
# ---------------------------------------------------------------------------


def unimodal_cvae_init(key, cfg: CVAEConfig):
    """Params/state pytrees for hippieUnimodalCVAE (model.py:12-44)."""
    z, h = cfg.z_dim, cfg.class_hidden_dim
    ks = list(jax.random.split(key, 12))
    p, s = {}, {}
    p["encoder"], s["encoder"] = resnet18_enc_init(ks[0], z_dim=z, num_blocks=cfg.num_blocks)
    # encoder_fc: Linear(2z+2h,2z) BN LeakyReLU(0.2) Linear(2z,z) BN LeakyReLU(0.2)
    efc, efc_s = {}, {}
    efc["0"] = tinit.dense_params(ks[1], 2 * z + 2 * h, 2 * z)
    efc["1"], efc_s["1"] = batch_norm_init(2 * z)
    efc["3"] = tinit.dense_params(ks[2], 2 * z, z)
    efc["4"], efc_s["4"] = batch_norm_init(z)
    p["encoder_fc"], s["encoder_fc"] = efc, efc_s
    p["source_embedding"] = tinit.embedding_params(ks[3], cfg.num_sources, h)
    p["class_embedding"] = tinit.embedding_params(ks[4], cfg.num_classes, h)
    p["z_mean"] = tinit.dense_params(ks[5], z, z)
    p["z_log_var"] = tinit.dense_params(ks[6], z, z)
    # decoder_fc: Linear(z+2h,2z) LeakyReLU(0.2) Linear(2z,2z) BN LeakyReLU(0.2)
    dfc, dfc_s = {}, {}
    dfc["0"] = tinit.dense_params(ks[7], z + 2 * h, 2 * z)
    dfc["2"] = tinit.dense_params(ks[8], 2 * z, 2 * z)
    dfc["3"], dfc_s["3"] = batch_norm_init(2 * z)
    p["decoder_fc"], s["decoder_fc"] = dfc, dfc_s
    p["decoder"], s["decoder"] = resnet18_dec_init(
        ks[9], z_dim=z, output_size=cfg.output_size, num_blocks=cfg.num_blocks
    )
    return p, s


def _encoder_fc_apply(p, s, x, *, training, mask):
    x = dense(x, p["0"]["weight"], p["0"]["bias"])
    x, u1 = batch_norm(x, p["1"], s["1"], training=training, mask=mask)
    x = leaky_relu(x, 0.2)
    x = dense(x, p["3"]["weight"], p["3"]["bias"])
    x, u4 = batch_norm(x, p["4"], s["4"], training=training, mask=mask)
    x = leaky_relu(x, 0.2)
    return x, {"1": u1, "4": u4}


def _decoder_fc_apply(p, s, x, *, training, mask):
    x = dense(x, p["0"]["weight"], p["0"]["bias"])
    x = leaky_relu(x, 0.2)
    x = dense(x, p["2"]["weight"], p["2"]["bias"])
    x, u3 = batch_norm(x, p["3"], s["3"], training=training, mask=mask)
    x = leaky_relu(x, 0.2)
    return x, {"3": u3}


def reparameterize(key, mu, logvar, eps=None):
    """z = mu + eps * exp(0.5*logvar), eps ~ N(0,1) (model.py:46-49).

    ``eps`` overrides the sampled noise (used by parity tests to inject the
    exact noise a torch golden run saw).
    """
    if eps is None:
        eps = jax.random.normal(key, mu.shape, mu.dtype)
    return mu + eps * jnp.exp(0.5 * logvar)


def unimodal_cvae_apply(
    p,
    s,
    data,
    source_labels,
    class_labels=None,
    *,
    rng: Optional[jax.Array] = None,
    eps: Optional[jax.Array] = None,
    training: bool = False,
    mask: Optional[jax.Array] = None,
    backend: str = "xla",
):
    """Forward pass. data: [B, L]; returns ((encoded, mu, logvar, decoded), new_state).

    When ``rng`` is None the reparameterization is skipped and the decoder sees
    ``mu`` directly — the deterministic eval path. (The reference always
    samples, but its downstream consumers only use the deterministic
    ``encoded``; see SURVEY.md Q8 for the eval-mode standardization decision.)
    """
    source_emb = embedding(source_labels, p["source_embedding"]["weight"])
    if class_labels is not None:
        class_emb = embedding(class_labels, p["class_embedding"]["weight"])
    else:
        class_emb = jnp.zeros_like(source_emb)

    new_s = {}
    x = data[:, :, None]  # [B, L, 1] channels-last
    h, new_s["encoder"] = resnet18_enc_apply(
        p["encoder"], s["encoder"], x, training=training, mask=mask, backend=backend
    )
    h = jnp.concatenate([h, source_emb, class_emb], axis=1)
    encoded, new_s["encoder_fc"] = _encoder_fc_apply(p["encoder_fc"], s["encoder_fc"], h, training=training, mask=mask)
    mu = dense(encoded, p["z_mean"]["weight"], p["z_mean"]["bias"])
    logvar = dense(encoded, p["z_log_var"]["weight"], p["z_log_var"]["bias"])
    if rng is not None or eps is not None:
        z = reparameterize(rng, mu, logvar, eps=eps)
    else:
        z = mu
    zc = jnp.concatenate([z, source_emb, class_emb], axis=1)
    d, new_s["decoder_fc"] = _decoder_fc_apply(p["decoder_fc"], s["decoder_fc"], zc, training=training, mask=mask)
    decoded, new_s["decoder"] = resnet18_dec_apply(
        p["decoder"], s["decoder"], d, training=training, mask=mask, backend=backend
    )
    return (encoded, mu, logvar, decoded), new_s


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


def multimodal_cvae_init(key, cfg: MultiModalConfig):
    """Params/state for MultiModalCVAE (model.py:350-395, the surviving def)."""
    z, h = cfg.z_dim, cfg.class_hidden_dim
    ks = list(jax.random.split(key, 12))
    p, s = {}, {}
    p["encoder_mod1"], s["encoder_mod1"] = resnet18_enc_init(ks[0], z_dim=z, num_blocks=cfg.num_blocks)
    p["encoder_mod2"], s["encoder_mod2"] = resnet18_enc_init(ks[1], z_dim=z, num_blocks=cfg.num_blocks)
    # fusion_encoder: Linear(4z+2h,2z) BN LeakyReLU(0.2) Linear(2z,z)
    fus, fus_s = {}, {}
    fus["0"] = tinit.dense_params(ks[2], 4 * z + 2 * h, 2 * z)
    fus["1"], fus_s["1"] = batch_norm_init(2 * z)
    fus["3"] = tinit.dense_params(ks[3], 2 * z, z)
    p["fusion_encoder"], s["fusion_encoder"] = fus, fus_s
    p["source_embedding"] = tinit.embedding_params(ks[4], cfg.num_sources, h)
    p["class_embedding"] = tinit.embedding_params(ks[5], cfg.num_classes, h)
    p["z_mean"] = tinit.dense_params(ks[6], z, z)
    p["z_log_var"] = tinit.dense_params(ks[7], z, z)
    # Registration order matches the torch module: both decoder_fc_* first,
    # then both decoder_* (model.py:379-395).
    for mod, k1 in (("mod1", ks[8]), ("mod2", ks[10])):
        dfc, dfc_s = {}, {}
        kk = list(jax.random.split(k1, 3))
        dfc["0"] = tinit.dense_params(kk[0], z + 2 * h, 2 * z)
        dfc["2"] = tinit.dense_params(kk[1], 2 * z, 2 * z)
        dfc["3"], dfc_s["3"] = batch_norm_init(2 * z)
        p[f"decoder_fc_{mod}"], s[f"decoder_fc_{mod}"] = dfc, dfc_s
    for mod, k2 in (("mod1", ks[9]), ("mod2", ks[11])):
        out_size = cfg.output_size_wave if mod == "mod1" else cfg.output_size_isi
        p[f"decoder_{mod}"], s[f"decoder_{mod}"] = resnet18_dec_init(
            k2, z_dim=z, output_size=out_size, num_blocks=cfg.num_blocks
        )
    return p, s


def _fusion_encoder_apply(p, s, x, *, training, mask):
    x = dense(x, p["0"]["weight"], p["0"]["bias"])
    x, u1 = batch_norm(x, p["1"], s["1"], training=training, mask=mask)
    x = leaky_relu(x, 0.2)
    x = dense(x, p["3"]["weight"], p["3"]["bias"])
    return x, {"1": u1}


def multimodal_cvae_apply(
    p,
    s,
    data1,
    data2,
    source_labels,
    class_labels=None,
    *,
    rng: Optional[jax.Array] = None,
    eps: Optional[jax.Array] = None,
    training: bool = False,
    mask: Optional[jax.Array] = None,
    backend: str = "xla",
):
    """Forward (model.py:424-432): two encoders -> fusion -> one z -> two decoders."""
    source_emb = embedding(source_labels, p["source_embedding"]["weight"])
    if class_labels is not None:
        class_emb = embedding(class_labels, p["class_embedding"]["weight"])
    else:
        class_emb = jnp.zeros_like(source_emb)

    new_s = {}
    h1, new_s["encoder_mod1"] = resnet18_enc_apply(
        p["encoder_mod1"], s["encoder_mod1"], data1[:, :, None], training=training, mask=mask,
        backend=backend,
    )
    h2, new_s["encoder_mod2"] = resnet18_enc_apply(
        p["encoder_mod2"], s["encoder_mod2"], data2[:, :, None], training=training, mask=mask,
        backend=backend,
    )
    h = jnp.concatenate([h1, h2, source_emb, class_emb], axis=1)
    encoded, new_s["fusion_encoder"] = _fusion_encoder_apply(
        p["fusion_encoder"], s["fusion_encoder"], h, training=training, mask=mask
    )
    mu = dense(encoded, p["z_mean"]["weight"], p["z_mean"]["bias"])
    logvar = dense(encoded, p["z_log_var"]["weight"], p["z_log_var"]["bias"])
    if rng is not None or eps is not None:
        z = reparameterize(rng, mu, logvar, eps=eps)
    else:
        z = mu
    zc = jnp.concatenate([z, source_emb, class_emb], axis=1)
    decs = []
    for mod in ("mod1", "mod2"):
        d, new_s[f"decoder_fc_{mod}"] = _decoder_fc_apply(
            p[f"decoder_fc_{mod}"], s[f"decoder_fc_{mod}"], zc, training=training, mask=mask
        )
        dec, new_s[f"decoder_{mod}"] = resnet18_dec_apply(
            p[f"decoder_{mod}"], s[f"decoder_{mod}"], d, training=training, mask=mask,
            backend=backend,
        )
        decs.append(dec)
    return (encoded, mu, logvar, decs[0], decs[1]), new_s


def param_count(tree) -> int:
    """Total number of parameters in a pytree."""
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
