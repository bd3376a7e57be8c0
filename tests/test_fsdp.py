"""FSDP-style parameter/optimizer sharding over the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippie_tpu.data.device_data import batch_plan
from hippie_tpu.models import cvae
from hippie_tpu.parallel import mesh as pmesh
from hippie_tpu.train import optim, step


@pytest.mark.slow
def test_fsdp_epoch_matches_replicated():
    cfg = cvae.CVAEConfig(z_dim=4, output_size=50, num_blocks=(1, 1, 1, 1))
    tx = optim.make_optimizer(1e-3, 0.01, clip_val=1.0)
    train_epoch, _ = step.make_unimodal_epoch_fns(tx, beta=1.0, use_class_labels=False)
    n = 64
    data = jnp.asarray(np.random.default_rng(0).normal(size=(n, 50)).astype(np.float32))
    source = jnp.zeros((n,), jnp.int32)
    idx, mask = batch_plan(np.arange(n), 32, shuffle=False)
    idx, mask = jnp.asarray(idx), jnp.asarray(mask)

    # replicated single-device baseline
    params, bn = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    ts = step.TrainState(params, bn, tx.init(params))
    base, ms_base = train_epoch(ts, data, source, source, idx, mask, jax.random.PRNGKey(3))

    # FSDP: params + optimizer state sharded per-leaf over 'data'
    mesh = pmesh.make_mesh(8)
    params2, bn2 = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    with mesh:
        params2 = pmesh.shard_params_fsdp(mesh, params2)
        opt2 = pmesh.shard_params_fsdp(mesh, tx.init(params2))
        bn2 = jax.device_put(bn2, pmesh.replicated(mesh))
        ts2 = step.TrainState(params2, bn2, opt2)
        data_s = jax.device_put(data, pmesh.replicated(mesh))
        src_s = jax.device_put(source, pmesh.replicated(mesh))
        sharded, ms_sh = train_epoch(
            ts2, data_s, src_s, src_s,
            jax.device_put(idx, pmesh.batch_sharded(mesh)),
            jax.device_put(mask, pmesh.batch_sharded(mesh)),
            jax.random.PRNGKey(3),
        )

    np.testing.assert_allclose(np.asarray(ms_sh.loss), np.asarray(ms_base.loss), rtol=1e-3, atol=1e-4)
    max_diff = 0.0
    for a, b in zip(
        jax.tree_util.tree_leaves(base.params), jax.tree_util.tree_leaves(sharded.params)
    ):
        max_diff = max(max_diff, float(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).max()))
    assert max_diff < 4.5e-3, max_diff  # Adam step-1 sign-flip envelope

    # some large leaves actually ended up sharded
    sharded_leaves = [
        x for x in jax.tree_util.tree_leaves(sharded.params)
        if hasattr(x, "sharding") and not x.sharding.is_fully_replicated
    ]
    assert len(sharded_leaves) > 10
