"""Schedule-free AdamW: trajectory parity vs the reference torch implementation."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from hippie_tpu.train import schedule_free as sf


@pytest.fixture(scope="module")
def torch_ref():
    sys.path.insert(0, "/root/reference")
    import torch
    from hippie.optimizers import AdamWScheduleFree

    return torch, AdamWScheduleFree


def test_trajectory_matches_torch(torch_ref):
    torch, AdamWScheduleFree = torch_ref
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(6, 4)).astype(np.float32)
    grads = [rng.normal(size=(6, 4)).astype(np.float32) for _ in range(12)]

    # torch run
    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = AdamWScheduleFree([p], lr=0.01, weight_decay=0.05, warmup_steps=4, foreach=False)
    opt.train()
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
    y_torch = p.detach().numpy().copy()
    opt.eval()
    x_torch = p.detach().numpy().copy()

    # ours
    tx = sf.adamw_schedule_free(learning_rate=0.01, weight_decay=0.05, warmup_steps=4)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), y_torch, rtol=1e-5, atol=1e-6)
    x_ours = sf.eval_params(state, params)["w"]
    np.testing.assert_allclose(np.asarray(x_ours), x_torch, rtol=1e-5, atol=1e-6)
    # mode round trip: train(eval(y)) == y
    back = sf.train_params(state, sf.eval_params(state, params))["w"]
    np.testing.assert_allclose(np.asarray(back), np.asarray(params["w"]), rtol=1e-5, atol=1e-6)


def test_trains_a_quadratic(torch_ref):
    """sanity: minimizes ||w - target||^2 and the averaged x beats raw y early."""
    target = jnp.asarray(np.ones((4, 4), np.float32) * 3.0)
    tx = sf.adamw_schedule_free(learning_rate=0.05)
    params = {"w": jnp.zeros((4, 4))}
    state = tx.init(params)
    losses = []
    for i in range(500):
        g = {"w": 2 * (params["w"] - target)}
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
        if i in (50, 499):
            x = sf.eval_params(state, params)["w"]
            losses.append(float(jnp.mean(jnp.square(x - target))))
    assert losses[-1] < losses[0]  # monotone improvement of the average
    assert losses[-1] < 5e-2
