"""Fused BasicBlock megakernel parity vs the XLA reference path.

Runs in Pallas interpret mode on the CPU conftest. The fused path stores
bf16 activations (fp32 stats/accumulation), so tolerances are bf16-scale;
the XLA path remains the bit-exact torch-matching reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippie_tpu.models import backbones, cvae
from hippie_tpu.ops import pallas_blocks as pb


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


@pytest.mark.parametrize("stride,L,C", [(1, 25, 64), (2, 25, 64), (2, 13, 128), (2, 7, 64)])
def test_enc_block_forward_parity(stride, L, C):
    rng = np.random.default_rng(0)
    B = 32
    x = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    p, s = backbones._basic_block_enc_init(jax.random.PRNGKey(1), C, stride)
    # randomize BN affine so parity is non-trivial
    p["bn1"]["weight"] = jnp.asarray(rng.uniform(0.5, 1.5, C * stride).astype(np.float32))
    p["bn1"]["bias"] = jnp.asarray(rng.normal(size=C * stride).astype(np.float32))

    ref, ref_s = backbones._basic_block_enc_apply(p, s, x, stride=stride, training=True, mask=None)
    x_lbc = jnp.transpose(x, (1, 0, 2)).astype(jnp.bfloat16)
    out, new_s = pb.basic_block_enc_fused(p, s, x_lbc, stride=stride)
    out = jnp.transpose(out, (1, 0, 2))
    assert out.dtype == jnp.bfloat16
    assert _rel(out.astype(np.float32), ref) < 3e-2
    # running stats update parity (fp32 path in both)
    for k in ("bn1", "bn2"):
        assert _rel(new_s[k]["running_mean"], ref_s[k]["running_mean"]) < 2e-2
        assert _rel(new_s[k]["running_var"], ref_s[k]["running_var"]) < 2e-2
        assert int(new_s[k]["num_batches_tracked"]) == int(ref_s[k]["num_batches_tracked"])


@pytest.mark.parametrize("stride,L,C", [(1, 8, 64), (2, 8, 128), (2, 4, 512), (1, 32, 64)])
def test_dec_block_forward_parity(stride, L, C):
    rng = np.random.default_rng(2)
    B = 32
    x = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    p, s = backbones._basic_block_dec_init(jax.random.PRNGKey(3), C, stride)

    ref, ref_s = backbones._basic_block_dec_apply(p, s, x, stride=stride, training=True, mask=None)
    out, new_s = pb.basic_block_dec_fused(
        p, s, jnp.transpose(x, (1, 0, 2)).astype(jnp.bfloat16), stride=stride
    )
    out = jnp.transpose(out, (1, 0, 2))
    assert out.shape == ref.shape
    assert _rel(out.astype(np.float32), ref) < 3e-2
    for k in ("bn1", "bn2"):
        assert _rel(new_s[k]["running_mean"], ref_s[k]["running_mean"]) < 2e-2


@pytest.mark.parametrize("stride", [1, 2])
def test_enc_block_grad_parity(stride):
    rng = np.random.default_rng(4)
    B, L, C = 32, 13, 64
    x = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    p, s = backbones._basic_block_enc_init(jax.random.PRNGKey(5), C, stride)
    g_out = rng.normal(size=(B, L if stride == 1 else (L - 1) // 2 + 1, C * stride)).astype(np.float32)
    g_out = jnp.asarray(g_out)

    def loss_ref(p, x):
        out, _ = backbones._basic_block_enc_apply(p, s, x, stride=stride, training=True, mask=None)
        return jnp.sum(out * g_out)

    def loss_fused(p, x):
        out, _ = pb.basic_block_enc_fused(
            p, s, jnp.transpose(x, (1, 0, 2)).astype(jnp.bfloat16), stride=stride
        )
        return jnp.sum(jnp.transpose(out, (1, 0, 2)).astype(jnp.float32) * g_out)

    (gp_ref, gx_ref) = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    (gp_f, gx_f) = jax.grad(loss_fused, argnums=(0, 1))(p, x)

    # The fused path computes in bf16, so vs the fp32 XLA reference the noise
    # floor is bf16-scale (sums of near-zero terms amplify relative error);
    # test_enc_block_bwd_matches_autodiff_of_same_math pins down correctness
    # at fp32-like tightness against autodiff of the identical bf16 math.
    assert _rel(gx_f, gx_ref) < 1e-1
    flat_ref = jax.tree_util.tree_leaves_with_path(gp_ref)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gp_f))
    for path, leaf in flat_ref:
        err = _rel(flat_f[path], leaf)
        assert err < 1e-1, (jax.tree_util.keystr(path), err)


@pytest.mark.parametrize("stride", [1, 2])
def test_enc_block_bwd_matches_autodiff_of_same_math(stride):
    """The hand-written backward must match jax.grad of a plain-jnp replica of
    the EXACT SAME bf16 forward math (pb helpers run outside kernels too) to
    ~0.5% — this separates backward-math bugs from bf16 precision effects."""
    rng = np.random.default_rng(14)
    B, L, C = 32, 13, 64
    x = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32)).astype(jnp.bfloat16)
    p, s = backbones._basic_block_enc_init(jax.random.PRNGKey(15), C, stride)
    Lo = L if stride == 1 else (L - 1) // 2 + 1
    g_out = jnp.asarray(rng.normal(size=(B, Lo, C * stride)).astype(np.float32))
    mc = jnp.ones((B, 1), jnp.float32)

    def fwd_replica(pp, xx):
        mb = mc.reshape(1, B, 1)
        n = jnp.sum(mc) * Lo
        c1 = pb._conv3(xx, pp["conv1"]["weight"].astype(jnp.bfloat16), stride)
        mu1, _, inv1 = pb._bn_stats(c1, mb, n)
        r1 = pb._lrelu(pp["bn1"]["weight"] * ((c1 - mu1) * inv1) + pp["bn1"]["bias"]).astype(jnp.bfloat16)
        c2 = pb._conv3(r1, pp["conv2"]["weight"].astype(jnp.bfloat16), 1)
        mu2, _, inv2 = pb._bn_stats(c2, mb, n)
        a2 = pp["bn2"]["weight"] * ((c2 - mu2) * inv2) + pp["bn2"]["bias"]
        if stride == 1:
            ash = xx.astype(jnp.float32)
        else:
            cs = pb._conv1x1_s2(xx, pp["shortcut"]["0"]["weight"].astype(jnp.bfloat16))
            mus, _, invs = pb._bn_stats(cs, mb, n)
            ash = pp["shortcut"]["1"]["weight"] * ((cs - mus) * invs) + pp["shortcut"]["1"]["bias"]
        return pb._lrelu(a2 + ash).astype(jnp.bfloat16)

    x = jnp.transpose(x, (1, 0, 2))       # [L, B, C]
    g_out = jnp.transpose(g_out, (1, 0, 2))

    def loss_replica(pp, xx):
        return jnp.sum(fwd_replica(pp, xx).astype(jnp.float32) * g_out)

    def loss_fused(pp, xx):
        out, _ = pb.basic_block_enc_fused(pp, s, xx, stride=stride)
        return jnp.sum(out.astype(jnp.float32) * g_out)

    gp_r, gx_r = jax.grad(loss_replica, argnums=(0, 1))(p, x)
    gp_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    # The hand backward additionally rounds its own intermediates (g0, dc*)
    # to bf16 to stay under the 16 MB VMEM stack limit, so vs autodiff of the
    # replica the floor is a few bf16 ulps per op (~2-3%); genuine math bugs
    # show up as O(1) errors.
    assert _rel(gx_f, gx_r) < 5e-2
    flat_r = jax.tree_util.tree_leaves_with_path(gp_r)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gp_f))
    for path, leaf in flat_r:
        err = _rel(flat_f[path], leaf)
        assert err < 5e-2, (jax.tree_util.keystr(path), err)


@pytest.mark.parametrize("stride", [1, 2])
def test_dec_block_grad_parity(stride):
    rng = np.random.default_rng(6)
    B, L, C = 32, 8, 128
    x = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    p, s = backbones._basic_block_dec_init(jax.random.PRNGKey(7), C, stride)
    g_out = jnp.asarray(rng.normal(size=(B, L * stride, C // stride)).astype(np.float32))

    def loss_ref(p, x):
        out, _ = backbones._basic_block_dec_apply(p, s, x, stride=stride, training=True, mask=None)
        return jnp.sum(out * g_out)

    def loss_fused(p, x):
        out, _ = pb.basic_block_dec_fused(
            p, s, jnp.transpose(x, (1, 0, 2)).astype(jnp.bfloat16), stride=stride
        )
        return jnp.sum(jnp.transpose(out, (1, 0, 2)).astype(jnp.float32) * g_out)

    (gp_ref, gx_ref) = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    (gp_f, gx_f) = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    assert _rel(gx_f, gx_ref) < 1e-1
    gscale = float(np.linalg.norm(np.asarray(g_out, np.float64)))
    flat_ref = jax.tree_util.tree_leaves_with_path(gp_ref)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gp_f))
    for path, leaf in flat_ref:
        ref_norm = float(np.linalg.norm(np.asarray(leaf, np.float64)))
        if ref_norm < 1e-4 * gscale:
            # exactly-cancelling grads (e.g. a pre-BN conv bias is absorbed by
            # the normalization): both paths are numerical noise around zero
            assert float(np.linalg.norm(np.asarray(flat_f[path], np.float64))) < 1e-2 * gscale
            continue
        err = _rel(flat_f[path], leaf)
        assert err < 1e-1, (jax.tree_util.keystr(path), err)


def test_enc_block_masked_stats():
    """Masked rows must not pollute statistics, exactly like the XLA path."""
    rng = np.random.default_rng(8)
    B, L, C = 16, 13, 64
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[10:] = 1e3  # garbage rows that the mask must exclude from stats
    mask = np.zeros((B,), np.float32)
    mask[:10] = 1.0
    p, s = backbones._basic_block_enc_init(jax.random.PRNGKey(9), C, 1)

    ref, ref_s = backbones._basic_block_enc_apply(
        p, s, jnp.asarray(x), stride=1, training=True, mask=jnp.asarray(mask)
    )
    out, new_s = pb.basic_block_enc_fused(
        p, s, jnp.transpose(jnp.asarray(x), (1, 0, 2)).astype(jnp.bfloat16),
        stride=1, mask=jnp.asarray(mask)
    )
    out = jnp.transpose(out, (1, 0, 2))
    assert _rel(np.asarray(out, np.float32)[:10], np.asarray(ref)[:10]) < 3e-2
    assert _rel(new_s["bn1"]["running_mean"], ref_s["bn1"]["running_mean"]) < 2e-2


@pytest.mark.parametrize("fast_backend", ["pallas", "bf16"])
def test_full_model_fused_backend_trains(fast_backend):
    """unimodal_cvae_apply(backend='pallas'/'bf16') must give the same training
    signal as XLA: matching loss, closely aligned full-gradient direction,
    and a matching short-training loss trajectory. 'bf16' is the standard-ops
    mixed-precision path (bfloat16 block activations, fp32 BN statistics)."""
    import optax

    rng = np.random.default_rng(10)
    cfg = cvae.CVAEConfig(z_dim=4, output_size=50, num_blocks=(1, 1, 1, 1))
    p0, s0 = cvae.unimodal_cvae_init(jax.random.PRNGKey(11), cfg)
    data = jnp.asarray(rng.normal(size=(32, 50)).astype(np.float32))
    src_lbl = jnp.zeros((32,), jnp.int32)

    def loss(p, s, backend, key):
        (enc, mu, logvar, dec), new_s = cvae.unimodal_cvae_apply(
            p, s, data, src_lbl, rng=key, training=True, backend=backend
        )
        return jnp.mean((dec - data) ** 2) + jnp.mean(mu * mu), new_s

    key = jax.random.PRNGKey(0)
    (l_ref, _), g_ref = jax.value_and_grad(loss, has_aux=True)(p0, s0, "xla", key)
    (l_f, _), g_f = jax.value_and_grad(loss, has_aux=True)(p0, s0, fast_backend, key)
    assert abs(float(l_f) - float(l_ref)) / abs(float(l_ref)) < 5e-2

    # full-gradient direction must agree closely (leaf-wise relative error is
    # dominated by the bf16 noise floor on near-cancelling BN-bias grads)
    cat_r = np.concatenate([
        np.asarray(l, np.float64).ravel() for l in jax.tree_util.tree_leaves(g_ref)
    ])
    cat_f = np.concatenate([
        np.asarray(l, np.float64).ravel() for l in jax.tree_util.tree_leaves(g_f)
    ])
    cos = float(cat_r @ cat_f / (np.linalg.norm(cat_r) * np.linalg.norm(cat_f)))
    # 'bf16' autodiffs through bf16-rounded activations everywhere, so its
    # grad-direction noise floor is slightly higher than the fused path's
    # (which keeps BN normalization/affine chains in fp32 registers).
    assert cos > (0.95 if fast_backend == "bf16" else 0.97), cos

    # 10 Adam steps with each backend: trajectories must track each other
    def train(backend):
        tx = optax.adam(1e-3)
        p, s, o = p0, s0, tx.init(p0)
        last = None
        for i in range(10):
            (l, new_s), g = jax.value_and_grad(loss, has_aux=True)(
                p, s, backend, jax.random.fold_in(key, i)
            )
            up, o = tx.update(g, o, p)
            p = optax.apply_updates(p, up)
            s = new_s
            last = float(l)
        return last

    l_xla = train("xla")
    l_pal = train(fast_backend)
    assert abs(l_pal - l_xla) / abs(l_xla) < 0.1, (l_pal, l_xla)
