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


def test_stage_fork_continues_averaging():
    """pipeline._sf_fork_state must CONTINUE the run-weighted average across a
    stage boundary: fork at step N (through the x-iterate handoff) and run M
    more steps == run N+M steps straight, up to the fp32 roundoff of the
    x<->y mode round trip. A fresh tx.init (the old behavior) diverges."""
    from hippie_tpu.train import optim, pipeline

    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32)),
              "class_embedding": {"weight": jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))}}
    grads = [jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32)), params)
        for _ in range(10)]

    tx = optim.make_optimizer(1e-2, 0.01, None, algorithm="schedule-free")

    def run(params, state, gs):
        for g in gs:
            updates, state = tx.update(g, state, params)
            params = optax.apply_updates(params, updates)
        return params, state

    # straight N+M run
    y, st = run(params, tx.init(params), grads)
    x_straight = optim.maybe_eval_params(st, y)

    # forked at N=5 through the stage handoff (x iterate + carried sf state)
    y5, st5 = run(params, tx.init(params), grads[:5])
    x5 = optim.maybe_eval_params(st5, y5)
    ts = pipeline._sf_fork_state(x5, {}, tx, st5)
    sf_new = optim.find_schedule_free_state(ts.opt_state)
    sf_old = optim.find_schedule_free_state(st5)
    assert int(sf_new.k) == int(sf_old.k) == 5
    np.testing.assert_array_equal(np.asarray(sf_new.weight_sum), np.asarray(sf_old.weight_sum))
    np.testing.assert_array_equal(np.asarray(sf_new.z["w"]), np.asarray(sf_old.z["w"]))
    y_cont, st_cont = run(ts.params, ts.opt_state, grads[5:])
    x_cont = optim.maybe_eval_params(st_cont, y_cont)
    np.testing.assert_allclose(
        np.asarray(x_cont["w"]), np.asarray(x_straight["w"]), rtol=2e-5, atol=2e-6
    )

    # control: a fresh init (reset averaging) does NOT reproduce the straight run
    y_reset, st_reset = run(x5, tx.init(x5), grads[5:])
    x_reset = optim.maybe_eval_params(st_reset, y_reset)
    assert not np.allclose(np.asarray(x_reset["w"]), np.asarray(x_straight["w"]), rtol=2e-5, atol=2e-6)

    # stage-3 style fork: class-count change keeps the fresh class_embedding
    x5_sup = dict(x5, class_embedding={"weight": jnp.zeros((2, 3), jnp.float32)})
    ts3 = pipeline._sf_fork_state(x5_sup, {}, tx, st5, drop=("class_embedding",))
    sf3 = optim.find_schedule_free_state(ts3.opt_state)
    assert sf3.z["class_embedding"]["weight"].shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(sf3.z["w"]), np.asarray(sf_old.z["w"]))
    np.testing.assert_array_equal(
        np.asarray(sf3.exp_avg_sq["class_embedding"]["weight"]),
        np.zeros((2, 3), np.float32),
    )
    assert int(sf3.k) == 5


def test_schedule_free_sidecar_roundtrip(tmp_path):
    """save/load_schedule_free_sidecar restore (k, weight_sum, lr_max, z,
    exp_avg_sq) bit-exactly into a fresh optimizer state."""
    from hippie_tpu.train import optim

    rng = np.random.default_rng(2)
    params = {"a": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
              "b": {"c": jnp.asarray(rng.normal(size=(7,)).astype(np.float32))}}
    tx = optim.make_optimizer(3e-3, 0.0, None, algorithm="schedule-free")
    state = tx.init(params)
    for i in range(4):
        g = jax.tree_util.tree_map(lambda x: x * 0.1 + i, params)
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)

    ckpt = str(tmp_path / "m.ckpt")
    path = optim.save_schedule_free_sidecar(ckpt, state)
    assert path == ckpt + optim.SF_SIDECAR_SUFFIX

    restored = optim.load_schedule_free_sidecar(ckpt, tx.init(params))
    a, b = (optim.find_schedule_free_state(s) for s in (state, restored))
    assert int(a.k) == int(b.k)
    np.testing.assert_array_equal(np.asarray(a.weight_sum), np.asarray(b.weight_sum))
    np.testing.assert_array_equal(np.asarray(a.lr_max), np.asarray(b.lr_max))
    for k in ("a",):
        np.testing.assert_array_equal(np.asarray(a.z[k]), np.asarray(b.z[k]))
        np.testing.assert_array_equal(np.asarray(a.exp_avg_sq[k]), np.asarray(b.exp_avg_sq[k]))
    np.testing.assert_array_equal(np.asarray(a.z["b"]["c"]), np.asarray(b.z["b"]["c"]))
