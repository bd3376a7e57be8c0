"""Checkpoint interop: Lightning-style ``.ckpt`` files <-> JAX pytrees.

The reference's checkpoint contract (SURVEY.md §5): a Lightning ``.ckpt`` is a
torch-pickled dict with ``state_dict`` (keys prefixed ``model.``, e.g.
``model.encoder.layer1.0.conv1.weight``) and ``optimizer_states`` (a list with
one torch AdamW state dict). The 3-stage pipeline reloads the best ckpt after
every stage (train_model.py:160-163, 339-347, 392-398), pops
``model.class_embedding.weight`` on class-count changes and loads with
``strict=False`` (quirk Q10), and restores optimizer state from
``optimizer_states[0]`` (train_model.py:394).

This module converts between that on-disk contract and our explicit pytrees.
torch is used ONLY for (de)serialization — never for compute. When torch is
unavailable, a numpy-pickle fallback format with the same dict schema is used
(readable by us, not by torch).

Layout transforms per leaf:
  conv kernels   jax [K, C_in, C_out]  <->  torch [C_out, C_in, K]
  dense kernels  jax [in, out]         <->  torch [out, in]
  embeddings / biases / BN vectors     identical
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # torch is optional and used for file I/O only.
    import torch  # noqa: F401

    HAVE_TORCH = True
except Exception:  # pragma: no cover
    HAVE_TORCH = False


# ---------------------------------------------------------------------------
# Pytree <-> flat state_dict
# ---------------------------------------------------------------------------

_BN_PARAM_KEYS = ("weight", "bias")
_BN_STATE_KEYS = ("running_mean", "running_var", "num_batches_tracked")


def _is_bn_params(node: Any) -> bool:
    return (
        isinstance(node, dict)
        and set(node.keys()) == {"weight", "bias"}
        and getattr(node["weight"], "ndim", None) == 1
    )


def _is_leaf_module(node: Any) -> bool:
    return isinstance(node, dict) and all(not isinstance(v, dict) for v in node.values())


def flatten_interleaved(params: dict, state: Optional[dict]) -> Dict[str, Any]:
    """Flatten params+state into torch state_dict key order.

    Walks the params tree in insertion order (which our init functions keep in
    torch registration order); BatchNorm nodes emit weight, bias,
    running_mean, running_var, num_batches_tracked like torch does.
    """
    out: Dict[str, Any] = {}

    def walk(p: Any, s: Any, prefix: str):
        if _is_bn_params(p) and isinstance(s, dict) and "running_mean" in s:
            for k in _BN_PARAM_KEYS:
                out[prefix + k] = p[k]
            for k in _BN_STATE_KEYS:
                out[prefix + k] = s[k]
            return
        if isinstance(p, dict):
            for k, v in p.items():
                walk(v, s.get(k, {}) if isinstance(s, dict) else {}, prefix + k + ".")
        else:
            out[prefix[:-1]] = p

    walk(params, state or {}, "")
    return out


def _set_path(tree: dict, path: Iterable[str], value):
    keys = list(path)
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _copy_ordered(tree):
    """Deep-copy a nested dict preserving insertion order.

    (jax.tree_util.tree_map would sort dict keys, destroying the torch
    registration order our init functions encode.)
    """
    if isinstance(tree, dict):
        return {k: _copy_ordered(v) for k, v in tree.items()}
    return tree


def reorder_like(template, tree):
    """Reorder ``tree``'s dict keys to match ``template``'s insertion order.

    Needed because any pytree that has been through jit/optax comes back with
    key-sorted dicts; saving a torch-ordered state_dict requires restoring the
    registration order from a freshly-inited template.
    """
    if isinstance(template, dict):
        return {k: reorder_like(template[k], tree[k]) for k in template}
    return tree


def unflatten_to(params_template: dict, state_template: dict, flat: Dict[str, Any]):
    """Scatter flat dot-keys back into (params, state) following the templates."""
    params = _copy_ordered(params_template)
    state = _copy_ordered(state_template)

    def locate(tree, keys):
        node = tree
        for k in keys:
            if not isinstance(node, dict) or k not in node:
                return None
            node = node[k]
        return node

    loaded, skipped = [], []
    staged = {}  # numpy staging; uploaded in one batched device_put at the end
    for key, val in flat.items():
        keys = key.split(".")
        target_tree = None
        if locate(params, keys) is not None:
            target_tree = params
        elif locate(state, keys) is not None:
            target_tree = state
        if target_tree is None:
            skipped.append(key)
            continue
        ref = locate(target_tree, keys)
        ref_dtype = np.dtype(ref.dtype)
        arr = np.asarray(val).astype(ref_dtype).reshape(tuple(ref.shape))
        staged[key] = (target_tree is params, arr)
        loaded.append(key)
    if staged:
        uploaded = jax.device_put({k: v[1] for k, v in staged.items()})
        for key, arr in uploaded.items():
            keys = key.split(".")
            _set_path(params if staged[key][0] else state, keys, arr)
    return params, state, loaded, skipped


# ---------------------------------------------------------------------------
# Layout transforms
# ---------------------------------------------------------------------------


def _to_torch_layout(key: str, x: np.ndarray) -> np.ndarray:
    if x.ndim == 3:  # conv kernel [K, I, O] -> [O, I, K]
        return np.transpose(x, (2, 1, 0))
    if x.ndim == 2 and "embedding" not in key:  # dense [in, out] -> [out, in]
        return np.transpose(x, (1, 0))
    return x


def _from_torch_layout(key: str, x: np.ndarray) -> np.ndarray:
    if x.ndim == 3:  # conv kernel [O, I, K] -> [K, I, O]
        return np.transpose(x, (2, 1, 0))
    if x.ndim == 2 and "embedding" not in key:
        return np.transpose(x, (1, 0))
    return x


def _pack_leaves(leaves):
    return jnp.concatenate([jnp.ravel(x).astype(jnp.float32) for x in leaves])


_pack_leaves_jit = jax.jit(_pack_leaves)


def bulk_host_fetch(flat: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Fetch a flat dict of device arrays with ONE device->host transfer.

    Remote backends pay a full round trip per buffer; a several-hundred-leaf
    state dict fetched leaf-by-leaf costs minutes. Instead, jit-concatenate
    everything into one float32 vector on device, fetch once, and split on the
    host. Integer leaves (BN step counters) survive the float32 round trip
    exactly (values << 2^24). Preserves key order.
    """
    keys = list(flat.keys())
    leaves = [flat[k] for k in keys]
    if not leaves or all(isinstance(x, np.ndarray) for x in leaves):
        return dict(flat)
    shapes = [tuple(np.shape(x)) for x in leaves]
    dtypes = [np.dtype(getattr(x, "dtype", np.float32)) for x in leaves]
    packed = np.asarray(_pack_leaves_jit(leaves))
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    out = {}
    offset = 0
    for k, shape, dtype, size in zip(keys, shapes, dtypes, sizes):
        chunk = packed[offset:offset + size]
        offset += size
        out[k] = chunk.astype(dtype).reshape(shape)
    return out


def to_torch_state_dict(params: dict, state: Optional[dict], prefix: str = "model.") -> Dict[str, np.ndarray]:
    """JAX pytrees -> {torch_key: np.ndarray} with torch layouts."""
    flat = bulk_host_fetch(flatten_interleaved(params, state))
    out = {}
    for k, v in flat.items():
        arr = np.asarray(v)
        if k.endswith("num_batches_tracked"):
            arr = arr.astype(np.int64)
        out[prefix + k] = _to_torch_layout(k, arr)
    return out


def from_torch_state_dict(
    sd: Dict[str, Any],
    params_template: dict,
    state_template: dict,
    prefix: str = "model.",
    drop_keys: Tuple[str, ...] = (),
):
    """{torch_key: tensor/ndarray} -> (params, state, loaded, skipped)."""
    flat = {}
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        rel = k[len(prefix):]
        if rel in drop_keys or k in drop_keys:
            continue
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        flat[rel] = _from_torch_layout(rel, arr)
    return unflatten_to(params_template, state_template, flat)


# ---------------------------------------------------------------------------
# Parameter ordering (for optimizer-state interop)
# ---------------------------------------------------------------------------


def parameter_key_order(params: dict, state: Optional[dict]) -> list:
    """Keys of *parameters* (not BN buffers) in torch ``model.parameters()`` order."""
    flat = flatten_interleaved(params, state)
    return [k for k in flat if not any(k.endswith(b) for b in _BN_STATE_KEYS)]


# ---------------------------------------------------------------------------
# File I/O
# ---------------------------------------------------------------------------


def save_lightning_ckpt(
    path: str,
    params: dict,
    state: Optional[dict],
    *,
    optimizer_state: Optional[dict] = None,
    epoch: int = 0,
    global_step: int = 0,
    hyper_parameters: Optional[dict] = None,
):
    """Write a Lightning-compatible .ckpt (torch pickle when torch is present).

    ``optimizer_state`` is a torch-style AdamW state dict (see
    hippie_tpu/train/optim.py:adamw_state_to_torch).
    """
    sd = to_torch_state_dict(params, state)
    payload = {
        "state_dict": sd,
        "optimizer_states": [optimizer_state] if optimizer_state is not None else [],
        "epoch": epoch,
        "global_step": global_step,
        "pytorch-lightning_version": "2.0.0",
        "hyper_parameters": hyper_parameters or {},
    }
    # Atomic write: ckpts are flushed from background threads (pipeline
    # BestTracker.flush_async), so a crash mid-save must never leave a
    # truncated file at the final path.
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        if HAVE_TORCH:
            payload["state_dict"] = {
                k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()
            }
            torch.save(payload, tmp)
        else:  # pragma: no cover
            with open(tmp, "wb") as f:
                pickle.dump(payload, f)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_lightning_ckpt(path: str) -> dict:
    """Read a .ckpt written by us or by the torch reference."""
    if HAVE_TORCH:
        return torch.load(path, map_location="cpu", weights_only=False)
    with open(path, "rb") as f:  # pragma: no cover
        return pickle.load(f)
