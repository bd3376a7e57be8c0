"""Optimizers with torch-matching semantics + optimizer-state ckpt interop.

The reference uses plain ``optim.AdamW(lr, weight_decay)`` everywhere
(hippie/model.py:93,262 — the imported AdamWScheduleFree is never used, quirk
Q9), with Lightning global-norm gradient clipping on some trainers (quirk Q7).

optax.adamw(b1=0.9, b2=0.999, eps=1e-8) is update-for-update identical to
torch AdamW (decoupled decay applied at the old params, bias-corrected
moments, eps outside the sqrt) — verified in tests/test_train_step.py.

Optimizer state travels in Lightning ckpts as ``optimizer_states[0]``
(train_model.py:394,398); this module converts optax's ScaleByAdamState to and
from that torch layout using the parameter ordering from
checkpoint.parameter_key_order.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hippie_tpu.train import checkpoint as ckpt_mod


def make_optimizer(
    learning_rate: float,
    weight_decay: float = 0.01,
    clip_val: Optional[float] = None,
    state_dtype: Optional[str] = None,
    algorithm: str = "adamw",
) -> optax.GradientTransformation:
    """AdamW(+ optional global-norm clipping) matching torch/Lightning.

    ``state_dtype='bfloat16'`` stores the Adam moments in bf16 (update math
    stays fp32) — the optimizer update is HBM-bandwidth bound (~226 MB/step
    of fp32 state traffic at 8M params, RESULTS.md), so halving the moment
    bytes buys ~10% of the train step. Opt-in: the EMA accumulates bf16
    rounding, so trajectories drift slightly from the torch-exact default.

    ``algorithm='schedule-free'`` swaps in the working schedule-free AdamW
    (train/schedule_free.py — the reference vendors but never instantiates
    it, quirk Q9). Callers must evaluate/checkpoint at the averaged x iterate
    (``maybe_eval_params``); the pipeline wires this automatically.
    """
    if algorithm == "schedule-free" and state_dtype is not None:
        # The z iterate is a parameter-scale accumulator; bf16 storage would
        # corrupt it. Fail loudly instead of silently ignoring the flag.
        raise ValueError(
            "--opt-state-dtype is not supported with --optimizer schedule-free "
            "(the schedule-free z iterate must stay fp32)"
        )
    chain = []
    if clip_val is not None:
        chain.append(optax.clip_by_global_norm(clip_val))

    def _factory(learning_rate):
        if algorithm == "schedule-free":
            from hippie_tpu.train.schedule_free import adamw_schedule_free

            return adamw_schedule_free(
                learning_rate=learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                weight_decay=weight_decay,
            )
        else:
            tx = optax.adamw(
                learning_rate=learning_rate,
                b1=0.9,
                b2=0.999,
                eps=1e-8,
                weight_decay=weight_decay,
            )
        if state_dtype is not None:
            tx = cast_state_dtype(tx, jnp.dtype(state_dtype))
        return tx

    # inject_hyperparams turns lr into optimizer STATE instead of an HLO
    # constant, so stages with different learning rates (lr vs lr/10) share
    # one compiled epoch program via the persistent compilation cache.
    chain.append(optax.inject_hyperparams(_factory)(learning_rate=float(learning_rate)))
    return optax.chain(*chain)


def cast_state_dtype(
    inner: optax.GradientTransformation, dtype
) -> optax.GradientTransformation:
    """Store the inner transform's float32 state in ``dtype``.

    State is upcast to fp32 around the inner update, so the update math is
    unchanged; only the at-rest (HBM) representation shrinks. Integer leaves
    (e.g. the Adam step count) are untouched.
    """

    def _down(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree,
        )

    def _up(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32) if hasattr(x, "dtype") and x.dtype == dtype else x,
            tree,
        )

    def init(params):
        return _down(inner.init(params))

    def update(updates, state, params=None):
        new_updates, new_state = inner.update(updates, _up(state), params)
        return new_updates, _down(new_state)

    return optax.GradientTransformation(init, update)


def _find_adam_state(opt_state):
    """Locate the ScaleByAdamState inside an optax chain state."""
    found = []

    def visit(node):
        if hasattr(node, "mu") and hasattr(node, "nu") and hasattr(node, "count"):
            found.append(node)
            return
        if isinstance(node, (tuple, list)):
            for child in node:
                visit(child)

    visit(opt_state)
    if not found:
        raise ValueError("no ScaleByAdamState found in optimizer state")
    return found[0]


def _replace_matching_state(opt_state, is_match, new_state):
    def visit(node):
        if is_match(node):
            return new_state
        if hasattr(node, "_fields"):  # recurse other namedtuples (e.g. InjectHyperparamsState)
            return type(node)(*[visit(getattr(node, f)) for f in node._fields])
        if isinstance(node, tuple):
            return tuple(visit(c) for c in node)
        if isinstance(node, list):
            return [visit(c) for c in node]
        if isinstance(node, dict):
            return {k: visit(v) for k, v in node.items()}
        return node

    return visit(opt_state)


def _replace_adam_state(opt_state, new_adam):
    return _replace_matching_state(
        opt_state,
        lambda n: hasattr(n, "mu") and hasattr(n, "nu") and hasattr(n, "count"),
        new_adam,
    )


def _is_sf_state(node) -> bool:
    return hasattr(node, "z") and hasattr(node, "weight_sum") and hasattr(node, "exp_avg_sq")


def replace_schedule_free_state(opt_state, new_sf):
    return _replace_matching_state(opt_state, _is_sf_state, new_sf)


def adamw_state_to_torch(
    opt_state,
    params: dict,
    state: Optional[dict],
    *,
    lr: float,
    weight_decay: float,
) -> dict:
    """optax state -> torch AdamW state-dict layout for ``optimizer_states[0]``.

    Parameter indices follow torch ``model.parameters()`` order; moment
    tensors get torch layouts (conv [O,I,K], linear [out,in]).
    """
    adam = _find_adam_state(opt_state)
    keys = ckpt_mod.parameter_key_order(params, state)
    mu_flat = ckpt_mod.bulk_host_fetch(ckpt_mod.flatten_interleaved(adam.mu, None))
    nu_flat = ckpt_mod.bulk_host_fetch(ckpt_mod.flatten_interleaved(adam.nu, None))
    step = int(adam.count)
    torch_state = {}
    for i, k in enumerate(keys):
        torch_state[i] = {
            "step": np.asarray(step, dtype=np.float32),
            # fp32 in the torch layout regardless of the at-rest state dtype
            "exp_avg": ckpt_mod._to_torch_layout(k, np.asarray(mu_flat[k], np.float32)),
            "exp_avg_sq": ckpt_mod._to_torch_layout(k, np.asarray(nu_flat[k], np.float32)),
        }
    return {
        "state": torch_state,
        "param_groups": [
            {
                "lr": lr,
                "betas": (0.9, 0.999),
                "eps": 1e-8,
                "weight_decay": weight_decay,
                "amsgrad": False,
                "maximize": False,
                "foreach": None,
                "capturable": False,
                "differentiable": False,
                "fused": None,
                "params": list(range(len(keys))),
            }
        ],
    }


def adamw_state_from_torch(
    torch_opt_sd: dict,
    opt_state,
    params_template: dict,
    state_template: Optional[dict],
):
    """torch AdamW state dict -> optax state (inverse of adamw_state_to_torch)."""
    adam = _find_adam_state(opt_state)
    keys = ckpt_mod.parameter_key_order(params_template, state_template)
    per_param = torch_opt_sd["state"]
    if not per_param:
        return opt_state
    mu_flat, nu_flat = {}, {}
    step = 0
    for i, k in enumerate(keys):
        entry = per_param.get(i, per_param.get(str(i)))
        if entry is None:
            continue
        ea = entry["exp_avg"]
        eas = entry["exp_avg_sq"]
        ea = ea.detach().cpu().numpy() if hasattr(ea, "detach") else np.asarray(ea)
        eas = eas.detach().cpu().numpy() if hasattr(eas, "detach") else np.asarray(eas)
        mu_flat[k] = ckpt_mod._from_torch_layout(k, ea)
        nu_flat[k] = ckpt_mod._from_torch_layout(k, eas)
        st = entry.get("step", 0)
        step = int(st.item() if hasattr(st, "item") else st)
    new_mu, _, _, missing_mu = ckpt_mod.unflatten_to(adam.mu, {}, mu_flat)
    new_nu, _, _, _ = ckpt_mod.unflatten_to(adam.nu, {}, nu_flat)
    new_adam = adam._replace(
        count=jnp.asarray(step, dtype=adam.count.dtype), mu=new_mu, nu=new_nu
    )
    return _replace_adam_state(opt_state, new_adam)


def find_schedule_free_state(opt_state):
    """Locate a ScheduleFreeState inside an optax chain state, else None."""
    found = []

    def visit(node):
        if _is_sf_state(node):
            found.append(node)
            return
        if hasattr(node, "inner_state"):  # InjectHyperparamsState
            visit(node.inner_state)
            return
        if isinstance(node, (tuple, list)):
            for child in node:
                visit(child)

    visit(opt_state)
    return found[0] if found else None


def maybe_eval_params(opt_state, params):
    """Params to EVALUATE/CHECKPOINT at: the averaged x iterate when the
    optimizer is schedule-free (the reference's .eval() mode switch,
    optimizers.py:82-92), otherwise ``params`` unchanged. Traceable."""
    sf = find_schedule_free_state(opt_state)
    if sf is None:
        return params
    from hippie_tpu.train.schedule_free import eval_params

    return eval_params(sf, params)


# One jitted dispatch per call (the host fit loop uses this per epoch; eager
# per-leaf lerps would pay a device round trip per parameter on remote
# backends). Structure (sf-present or not) is a static trace property.
eval_params_jit = jax.jit(maybe_eval_params)


# ---------------------------------------------------------------------------
# Schedule-free sidecar persistence
# ---------------------------------------------------------------------------
#
# The Lightning ckpt contract requires ``optimizer_states[0]`` to be a torch
# AdamW layout, which schedule-free state has none of — so the .ckpt stays
# contract-empty for schedule-free runs and the full averaging state
# (k, weight_sum, lr_max, z, exp_avg_sq) is persisted in a sidecar file next
# to the checkpoint. Stage handoffs continue from the device-resident state
# directly (pipeline._sf_fork_state); the sidecar exists so a later process
# can also continue training from the .ckpt (the analog of the reference's
# ``optimizer.load_state_dict(ckpt["optimizer_states"][0])``,
# train_model.py:387-398).

SF_SIDECAR_SUFFIX = ".sfstate"


def save_schedule_free_sidecar(ckpt_path: str, opt_state) -> Optional[str]:
    """Write the schedule-free state next to ``ckpt_path``; returns the
    sidecar path, or None when the optimizer is not schedule-free."""
    import pickle

    sf = find_schedule_free_state(opt_state)
    if sf is None:
        return None
    # ONE device->host transfer for the three scalars (eager scalar reads
    # cost ~65 ms each on the remote backend, CLAUDE.md) and one per tree.
    k, weight_sum, lr_max = jax.device_get((sf.k, sf.weight_sum, sf.lr_max))
    payload = {
        "k": int(k),
        "weight_sum": float(weight_sum),
        "lr_max": float(lr_max),
        "z": ckpt_mod.bulk_host_fetch(ckpt_mod.flatten_interleaved(sf.z, None)),
        "exp_avg_sq": ckpt_mod.bulk_host_fetch(
            ckpt_mod.flatten_interleaved(sf.exp_avg_sq, None)
        ),
    }
    path = ckpt_path + SF_SIDECAR_SUFFIX
    tmp = f"{path}.tmp.{os.getpid()}"  # atomic: background-thread writer
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)
    return path


def load_schedule_free_sidecar(ckpt_path: str, opt_state, drop_keys=()):
    """Restore a sidecar written by ``save_schedule_free_sidecar`` into a
    freshly-initialized optimizer state (same pytree structure). Leaves whose
    flat key starts with a ``drop_keys`` prefix keep their fresh values (the
    class-embedding surgery analog of quirk Q10)."""
    import pickle

    sf = find_schedule_free_state(opt_state)
    if sf is None:
        raise ValueError("optimizer state has no schedule-free component")
    with open(ckpt_path + SF_SIDECAR_SUFFIX, "rb") as f:
        payload = pickle.load(f)

    def filtered(flat):
        return {k: v for k, v in flat.items()
                if not any(k.startswith(d) for d in drop_keys)}

    z, _, _, _ = ckpt_mod.unflatten_to(sf.z, {}, filtered(payload["z"]))
    eas, _, _, _ = ckpt_mod.unflatten_to(sf.exp_avg_sq, {}, filtered(payload["exp_avg_sq"]))
    new_sf = sf._replace(
        k=jnp.asarray(payload["k"], sf.k.dtype),
        weight_sum=jnp.asarray(payload["weight_sum"], sf.weight_sum.dtype),
        lr_max=jnp.asarray(payload["lr_max"], sf.lr_max.dtype),
        z=z,
        exp_avg_sq=eas,
    )
    return replace_schedule_free_state(opt_state, new_sf)
