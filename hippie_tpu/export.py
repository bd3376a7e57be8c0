"""AOT model export for deployment (jax.export / StableHLO artifacts).

Serializes the eval-mode embedding forward — parameters baked in as
constants — into a single portable artifact that a fresh process can load
and call with NO model code, NO Lightning checkpoint, and NO retrace. This
is the deployment story the reference lacks entirely: its inference path
(inference_from_trained_model.py) needs the full torch + Lightning stack, a
.ckpt file, and pays module construction + state_dict surgery per process.

Properties of the artifact:
  - symbolic batch dimension: one export serves any request size;
  - multi-platform lowering (cpu + tpu by default): the same file runs on a
    dev box and on a serving chip;
  - versioned, stable serialization (jax.export's calling convention);
  - embedding semantics identical to evaluate/embeddings.py (eval-mode
    forward at 'highest' matmul precision, per-sample z-score, class
    conditioning zeroed — the inference contract).

The container is a zip with ``manifest.json`` (model geometry, modality,
export metadata) + ``model.shlo`` (the serialized exported function).
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from hippie_tpu.evaluate.embeddings import zscore_rows
from hippie_tpu.models import cvae

FORMAT_VERSION = 1


def infer_unimodal_config(state_dict: dict) -> cvae.CVAEConfig:
    """Recover the model geometry from a Lightning state_dict's shapes.

    Keys follow the reference's torch registration tree (model.py:12-44):
    z_mean [z, z]; class/source embeddings [n, h]; decoder.linear_out
    [out_len, 64]; block counts from ``encoder.layer{i}.{j}.`` key indices.
    """
    z_dim = int(state_dict["model.z_mean.weight"].shape[0])
    num_classes, h = (int(x) for x in state_dict["model.class_embedding.weight"].shape)
    num_sources = int(state_dict["model.source_embedding.weight"].shape[0])
    output_size = int(state_dict["model.decoder.linear_out.weight"].shape[0])
    blocks = []
    for li in (1, 2, 3, 4):
        idxs = {
            int(k.split(".")[3])
            for k in state_dict
            if k.startswith(f"model.encoder.layer{li}.")
        }
        blocks.append(len(idxs))
    return cvae.CVAEConfig(
        z_dim=z_dim, output_size=output_size, class_hidden_dim=h,
        num_sources=num_sources, num_classes=num_classes, num_blocks=tuple(blocks),
    )


def infer_multimodal_config(state_dict: dict) -> cvae.MultiModalConfig:
    """Geometry of a joint MultiModalCVAE checkpoint (model.py:350-395)."""
    z_dim = int(state_dict["model.z_mean.weight"].shape[0])
    num_classes, h = (int(x) for x in state_dict["model.class_embedding.weight"].shape)
    num_sources = int(state_dict["model.source_embedding.weight"].shape[0])
    out_wave = int(state_dict["model.decoder_mod1.linear_out.weight"].shape[0])
    out_isi = int(state_dict["model.decoder_mod2.linear_out.weight"].shape[0])
    blocks = []
    for li in (1, 2, 3, 4):
        idxs = {
            int(k.split(".")[3])
            for k in state_dict
            if k.startswith(f"model.encoder_mod1.layer{li}.")
        }
        blocks.append(len(idxs))
    return cvae.MultiModalConfig(
        z_dim=z_dim, output_size_wave=out_wave, output_size_isi=out_isi,
        class_hidden_dim=h, num_sources=num_sources, num_classes=num_classes,
        num_blocks=tuple(blocks),
    )


def load_model_from_ckpt(path_or_payload, *, multimodal: bool = None,
                         fallback_config=None):
    """Load a Lightning ckpt and rebuild ``(params, bn_state, config)``.

    One shared policy for every CLI (infer/serve/kfold): geometry is
    inferred from the state_dict's own weight shapes (``infer_*_config`` —
    works for ours and for reference-trained ckpts alike); when inference
    fails on nonstandard keys, ``fallback_config`` is used instead, or a
    descriptive error is raised if none was given. ``multimodal=None``
    auto-detects from the key prefixes. Init runs under jit (eager init
    pays per-op dispatch on remote backends).
    """
    from hippie_tpu.train import checkpoint as ckpt_mod

    payload = (path_or_payload if isinstance(path_or_payload, dict)
               else ckpt_mod.load_lightning_ckpt(path_or_payload))
    sd = payload["state_dict"]
    if multimodal is None:
        multimodal = any(k.startswith("model.encoder_mod1.") for k in sd)
    try:
        cfg = infer_multimodal_config(sd) if multimodal else infer_unimodal_config(sd)
    except (KeyError, ValueError, IndexError) as e:
        if fallback_config is None:
            raise ValueError(
                f"could not infer model geometry from the checkpoint's "
                f"state_dict keys ({e!r}); the checkpoint does not follow "
                f"the reference layout — pass explicit geometry"
            ) from e
        cfg = fallback_config
    init = cvae.multimodal_cvae_init if multimodal else cvae.unimodal_cvae_init
    template = jax.jit(init, static_argnums=1)(jax.random.PRNGKey(0), cfg)
    params, bn, _, _ = ckpt_mod.from_torch_state_dict(sd, template[0], template[1])
    return params, bn, cfg


def _embedder(params, bn_state, multimodal: bool, precision: str = "highest"):
    """``precision='highest'`` is the parity contract (fp32-exact matmuls,
    matching evaluate/embeddings.py); ``'default'`` lets the TPU multiply in
    bf16 (~1 ulp-of-bf16 embedding drift, measured cosine vs highest in
    RESULTS.md) for higher serving throughput. CPU ignores the distinction."""
    if multimodal:
        def embed(wave, isi, source):
            with jax.default_matmul_precision(precision):
                (enc, *_), _ = cvae.multimodal_cvae_apply(
                    params, bn_state, wave, isi, source, None, training=False
                )
                return zscore_rows(enc)
    else:
        def embed(data, source):
            with jax.default_matmul_precision(precision):
                (enc, *_), _ = cvae.unimodal_cvae_apply(
                    params, bn_state, data, source, None, training=False
                )
                return zscore_rows(enc)
    return embed


def export_embedder(
    params,
    bn_state,
    *,
    input_len: Optional[int] = None,
    input_lens: Optional[Tuple[int, int]] = None,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
    precision: str = "highest",
) -> bytes:
    """Serialize the z-scored embedding forward. Unimodal when ``input_len``
    is given; multimodal (wave, isi) when ``input_lens`` is. The batch
    dimension is symbolic — one artifact serves every request size.
    ``precision``: see ``_embedder``."""
    multimodal = input_lens is not None
    embed = jax.jit(_embedder(params, bn_state, multimodal, precision=precision))
    (b,) = jexport.symbolic_shape("b")
    src = jax.ShapeDtypeStruct((b,), jnp.int32)
    if multimodal:
        args = (
            jax.ShapeDtypeStruct((b, input_lens[0]), jnp.float32),
            jax.ShapeDtypeStruct((b, input_lens[1]), jnp.float32),
            src,
        )
    else:
        args = (jax.ShapeDtypeStruct((b, input_len), jnp.float32), src)
    return jexport.export(embed, platforms=list(platforms))(*args).serialize()


def save_artifact(path: str, blob: bytes, manifest: dict) -> None:
    manifest = dict(manifest, format_version=FORMAT_VERSION)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("manifest.json", json.dumps(manifest, indent=1))
        zf.writestr("model.shlo", blob)


def load_artifact(path: str):
    """-> (callable, manifest). The callable maps (data, source) — or
    (wave, isi, source) for multimodal artifacts — to z-scored [N, z]
    embeddings, running the deserialized StableHLO on the default device."""
    with zipfile.ZipFile(path) as zf:
        manifest = json.loads(zf.read("manifest.json").decode())
        fv = manifest.get("format_version")
        if fv != FORMAT_VERSION:
            raise ValueError(
                f"artifact {path} has format_version {fv!r}; this build reads "
                f"version {FORMAT_VERSION}. Re-export the model with this "
                "version of hippie_tpu."
            )
        if manifest.get("jax_version") not in (None, jax.__version__):
            import warnings

            warnings.warn(
                f"artifact {path} was exported with jax "
                f"{manifest['jax_version']}, loading under {jax.__version__}; "
                "jax.export guarantees limited cross-version compatibility",
                stacklevel=2,
            )
        exported = jexport.deserialize(zf.read("model.shlo"))

    def call(*arrays):
        arrays = tuple(jnp.asarray(a) for a in arrays)
        return np.asarray(exported.call(*arrays))

    return call, manifest


def export_from_checkpoint(
    ckpt_path: str,
    out_path: str,
    *,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
    precision: str = "highest",
) -> dict:
    """Lightning .ckpt -> deployable artifact; returns the manifest.

    Geometry is inferred from the checkpoint's own tensor shapes — no flags
    needed (unlike the reference's inference CLI, whose z_dim default of 64
    silently disagrees with the training default, quirk Q12).
    """
    # One shared loading policy (geometry inference, jitted template init,
    # state_dict graft, descriptive errors): load_model_from_ckpt.
    params, bn, cfg_m = load_model_from_ckpt(ckpt_path)
    if isinstance(cfg_m, cvae.MultiModalConfig):
        blob = export_embedder(
            params, bn,
            input_lens=(cfg_m.output_size_wave, cfg_m.output_size_isi),
            platforms=platforms, precision=precision,
        )
        geometry = {"modality": "multimodal",
                    "input_lens": [cfg_m.output_size_wave, cfg_m.output_size_isi]}
    else:
        blob = export_embedder(
            params, bn, input_len=cfg_m.output_size, platforms=platforms,
            precision=precision,
        )
        geometry = {"modality": "unimodal", "input_len": cfg_m.output_size}
    manifest = {
        **geometry,
        "z_dim": cfg_m.z_dim,
        "num_sources": cfg_m.num_sources,
        "num_classes": cfg_m.num_classes,
        "num_blocks": list(cfg_m.num_blocks),
        "platforms": list(platforms),
        "precision": precision,
        "source_checkpoint": ckpt_path,
        "jax_version": jax.__version__,
    }
    save_artifact(out_path, blob, manifest)
    return manifest
