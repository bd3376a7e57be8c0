"""Gradient + AdamW parity: one full train step must match torch exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hippie_tpu.models import cvae
from hippie_tpu.ops import losses
from hippie_tpu.train import checkpoint as ckpt
from hippie_tpu.train import optim


@pytest.fixture(scope="module")
def gold(goldens_dir):
    return np.load(goldens_dir / "unimodal_cvae.npz")


@pytest.fixture(scope="module")
def loaded(gold):
    cfg = cvae.CVAEConfig(z_dim=10, output_size=50)
    p, s = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    sd = {k[len("sd0."):]: gold[k] for k in gold.files if k.startswith("sd0.")}
    p, s, _, skipped = ckpt.from_torch_state_dict(sd, p, s, prefix="")
    assert not skipped
    return p, s


def _grads_and_newbn(gold, p, s):
    data = jnp.asarray(gold["data"][:, 0, :])
    src = jnp.asarray(gold["source_labels"])
    cls = jnp.asarray(gold["class_labels"])
    eps = jnp.asarray(gold["eps"])

    def loss_fn(params):
        (enc, mu, logvar, dec), new_bn = cvae.unimodal_cvae_apply(
            params, s, data, src, cls, eps=eps, training=True
        )
        total, (mse, kl) = losses.vae_loss(data, dec, mu, logvar, beta=1.0)
        return total, (new_bn, mse, kl)

    (loss, (new_bn, mse, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
    return loss, grads, new_bn


def test_gradients_match_torch(gold, loaded):
    """Per-tensor relative-L2 gradient error < 1% vs torch autograd.

    Tensors with reference gradient norm < 1e-6 are excluded: those are conv
    biases feeding directly into BatchNorm, whose gradient is mathematically
    zero (BN subtracts the mean) — both frameworks produce pure fp32 noise.
    """
    p, s = loaded
    loss, grads, _ = _grads_and_newbn(gold, p, s)
    np.testing.assert_allclose(float(loss), float(gold["loss"]), rtol=1e-5)
    flat = ckpt.to_torch_state_dict(grads, None, prefix="")
    checked, bad = 0, []
    for k, g in flat.items():
        ref = gold[f"grad.{k}"].astype(np.float64)
        ref_norm = np.linalg.norm(ref)
        if ref_norm < 1e-6:
            continue
        rel = np.linalg.norm(np.asarray(g, np.float64) - ref) / ref_norm
        if rel > 1e-2:
            bad.append((k, float(rel)))
        checked += 1
    assert checked > 100 and not bad, (checked, bad[:10])


def test_adamw_step_matches_torch(gold, loaded):
    p, s = loaded
    tx = optim.make_optimizer(1e-3, weight_decay=0.01)
    opt_state = tx.init(p)
    _, grads, new_bn = _grads_and_newbn(gold, p, s)
    updates, opt_state = tx.update(grads, opt_state, p)
    new_p = optax.apply_updates(p, updates)

    ours = ckpt.to_torch_state_dict(new_p, new_bn, prefix="")
    grads_t = ckpt.to_torch_state_dict(grads, None, prefix="")
    mismatches = []
    for k, v in ours.items():
        ref = gold[f"sd1.{k}"]
        if k.endswith("num_batches_tracked"):
            continue
        if "running_" in k:
            ok = np.allclose(v, ref, rtol=5e-3, atol=5e-5)
        else:
            # At Adam step 1 the update is ~ lr*sign(grad): elements whose
            # gradient is within fp32 cross-framework noise (~2e-4 in these
            # deep conv stacks) can flip sign and differ by up to 2*lr in both
            # frameworks. Compare exactly where the gradient is decisive, and
            # bound the rest by the 2*lr sign-flip envelope.
            g_ours = np.abs(grads_t[k]) if k in grads_t else np.ones_like(ref)
            g_ref = np.abs(gold[f"grad.{k}"])
            sel = (g_ours > 1e-3) & (g_ref > 1e-3)
            ok = np.allclose(np.asarray(v)[sel], ref[sel], rtol=5e-3, atol=2e-5)
            ok = ok and np.abs(np.asarray(v) - ref).max() < 2.5e-3
        if not ok:
            mismatches.append((k, float(np.abs(np.asarray(v, np.float64) - ref).max())))
    assert not mismatches, mismatches[:10]


def test_optimizer_state_torch_roundtrip(loaded):
    p, s = loaded
    tx = optim.make_optimizer(1e-3, weight_decay=0.01)
    opt_state = tx.init(p)
    # make the state non-trivial
    g = jax.tree_util.tree_map(jnp.ones_like, p)
    updates, opt_state = tx.update(g, opt_state, p)

    torch_sd = optim.adamw_state_to_torch(opt_state, p, s, lr=1e-3, weight_decay=0.01)
    assert torch_sd["param_groups"][0]["params"] == list(range(len(torch_sd["state"])))

    fresh = tx.init(p)
    restored = optim.adamw_state_from_torch(torch_sd, fresh, p, s)
    a0 = optim._find_adam_state(opt_state)
    a1 = optim._find_adam_state(restored)
    assert int(a1.count) == int(a0.count)
    for orig, rest in zip(jax.tree_util.tree_leaves(a0.mu), jax.tree_util.tree_leaves(a1.mu)):
        np.testing.assert_allclose(np.asarray(orig), np.asarray(rest), rtol=1e-6)


def test_clipping_matches_global_norm():
    """optax.clip_by_global_norm == Lightning's gradient_clip_val semantics."""
    p = {"a": jnp.asarray(np.ones((4, 4), np.float32) * 3.0)}
    tx = optim.make_optimizer(1.0, weight_decay=0.0, clip_val=1.0)
    st = tx.init(p)
    g = {"a": jnp.full((4, 4), 5.0)}
    gn = float(jnp.sqrt(jnp.sum(jnp.square(g["a"]))))
    clipped, _ = optax.clip_by_global_norm(1.0).update(g, optax.clip_by_global_norm(1.0).init(p), p)
    np.testing.assert_allclose(np.asarray(clipped["a"]), np.asarray(g["a"]) / gn, rtol=1e-6)


def test_bf16_optimizer_state_tracks_fp32():
    """state_dtype='bfloat16' stores moments in bf16 but the trajectory must
    track the fp32 optimizer closely (update math stays fp32)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(64,)).astype(np.float32)),
    }
    tx32 = optim.make_optimizer(1e-3, 0.01)
    tx16 = optim.make_optimizer(1e-3, 0.01, state_dtype="bfloat16")
    st16 = tx16.init(params)
    leaves = jax.tree_util.tree_leaves(st16)
    assert any(getattr(l, "dtype", None) == jnp.bfloat16 for l in leaves)

    p32, o32 = params, tx32.init(params)
    p16, o16 = params, st16
    for i in range(20):
        g = jax.tree_util.tree_map(
            lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32)) * 0.1, params
        )
        u32, o32 = tx32.update(g, o32, p32)
        p32 = optax.apply_updates(p32, u32)
        u16, o16 = tx16.update(g, o16, p16)
        p16 = optax.apply_updates(p16, u16)
    for k in params:
        a, b = np.asarray(p16[k], np.float64), np.asarray(p32[k], np.float64)
        rel = np.linalg.norm(a - b) / np.linalg.norm(b - np.asarray(params[k], np.float64))
        assert rel < 0.05, (k, rel)  # drift well under 5% of the total movement
