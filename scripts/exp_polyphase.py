"""Experiment: polyphase decomposition of the decoder's ResizeConv1d.

The reference decoder upsamples nearest x2 then convolves k=3/pad=1
(/root/reference/hippie/backbones.py:6-16). Because nearest x2 repeats each
input sample, the k=3 conv on the 2L-length signal touches only two DISTINCT
input samples per output position, so the whole op equals ONE k=2 conv on the
original L-length signal with 2*C_out output channels (both phases share one
window sweep) followed by an interleave:

    y[2t]   = w0*x[t-1] + (w1+w2)*x[t]      (even-phase kernel [w0, w1+w2])
    y[2t+1] = (w0+w1)*x[t] + w2*x[t+1]      (odd-phase  kernel [w0+w1, w2])

MACs drop from 3*(2L)*Cin*Cout to 2*(L+1)*Cin*(2Cout) — ~2/3 at large L
(0.83/0.75/0.71 at the decoder's L=4/8/16) — and the conv's output-channel
count doubles (better MXU lane fill at C_out=64/128). The tap pre-sums
(w1+w2, w0+w1) change float rounding by ~1 ulp, so this is an opt-in backend
(like --block-backend bf16), not a default.

Decoder resize convs are ~25% of the 137 GFLOP step (fwd+bwd), so the
theoretical ceiling is ~8% step FLOPs plus lane-fill effects. This script
measures the FULL unimodal train step (fwd+bwd+AdamW, batch 512) with the
polyphase implementation monkeypatched in, using the calibrated fori_loop
harness from opt_fusion_experiment.py. Per-shape microbenchmarks were tried
first and are too noisy at these sizes (~30 us ops vs ~50 us remote-timing
noise); only the full-step A/B is decisive.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    from hippie_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from hippie_tpu.models import backbones, cvae
    from hippie_tpu.nn import functional as F
    from hippie_tpu.ops import losses
    from hippie_tpu.train import optim

    B, iters = args.batch, args.iters

    # ---- parity check of the polyphase rewrite ----------------------------
    def resize_conv_reference(w, b, x):
        return F.conv1d(F.upsample_nearest(x, 2), w, b, stride=1, padding=1)

    def resize_conv_polyphase(w, b, x):
        we = jnp.stack([w[0], w[1] + w[2]])        # [2, Cin, Cout] even phase
        wo = jnp.stack([w[0] + w[1], w[2]])        # [2, Cin, Cout] odd phase
        wcat = jnp.concatenate([we, wo], axis=2)   # [2, Cin, 2*Cout]
        y = F.conv1d(x, wcat, stride=1, padding=1)  # [B, L+1, 2*Cout]
        c = w.shape[2]
        even, odd = y[:, :-1, :c], y[:, 1:, c:]
        out = jnp.stack([even, odd], axis=2).reshape(x.shape[0], -1, c)
        return out + b

    rng = np.random.default_rng(0)
    for L, ci, co in [(4, 512, 256), (8, 256, 128), (16, 128, 64), (32, 64, 1)]:
        w = jnp.asarray(rng.normal(size=(3, ci, co)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(4, L, ci)).astype(np.float32))
        with jax.default_matmul_precision("highest"):
            ref = resize_conv_reference(w, b, x)
            poly = resize_conv_polyphase(w, b, x)
        err = float(jnp.max(jnp.abs(ref - poly)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f"parity L={L} {ci}->{co}: rel max err {err:.2e}")
        assert err < 1e-5

    # ---- full train step A/B ----------------------------------------------
    cfg = cvae.CVAEConfig(z_dim=10, output_size=50, class_hidden_dim=5,
                          num_sources=5, num_classes=5)
    params, bn = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    data = jnp.asarray(rng.normal(size=(B, 50)).astype(np.float32))
    source = jnp.zeros((B,), jnp.int32)
    key = jax.random.PRNGKey(1)
    tx = optim.make_optimizer(1e-3, 0.01, clip_val=None)

    def loss_fn(p, s, k):
        (enc, mu, logvar, dec), new_s = cvae.unimodal_cvae_apply(
            p, s, data, source, rng=k, training=True
        )
        total, _ = losses.vae_loss(data, dec, mu, logvar, beta=1.0)
        return total, new_s

    def step_loop(p, s, o):
        def body(i, carry):
            p, s, o = carry
            (loss, new_s), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, s, jax.random.fold_in(key, i)
            )
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), new_s, o

        return jax.lax.fori_loop(0, iters, body, (p, s, o))

    opt0 = tx.init(params)  # OUTSIDE the timed window: eager remote init
    _ = jax.block_until_ready(jax.tree_util.tree_leaves(opt0)[0])

    def timed(name, overhead_ms):
        fn = jax.jit(step_loop)
        out = fn(params, bn, opt0)  # compile + warmup
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = None
        for _rep in range(3):
            t0 = time.perf_counter()
            out = fn(params, bn, opt0)
            _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            dt = ((time.perf_counter() - t0) * 1e3 - overhead_ms) / iters
            best = dt if best is None else min(best, dt)
        print(f"{name:44s} {best:8.3f} ms/iter")
        return best

    def empty_loop(acc):
        return jax.lax.fori_loop(0, iters, lambda i, a: a + 1.0, acc)

    efn = jax.jit(empty_loop)
    _ = float(efn(jnp.float32(0)))
    t0 = time.perf_counter()
    _ = float(efn(jnp.float32(0)))
    dispatch_ms = (time.perf_counter() - t0) * 1e3
    print(f"{'dispatch+fetch floor':44s} {dispatch_ms:8.3f} ms/call")

    results = {}
    results["A_reference_resize_conv"] = timed("A reference resize conv (xla)", dispatch_ms)

    orig = backbones._resize_conv_apply

    def _poly_apply(p, x, *, scale: int):
        if scale != 2:
            return orig(p, x, scale=scale)
        return resize_conv_polyphase(p["conv"]["weight"], p["conv"]["bias"], x)

    backbones._resize_conv_apply = _poly_apply
    try:
        results["B_polyphase_resize_conv"] = timed("B polyphase resize conv", dispatch_ms)
    finally:
        backbones._resize_conv_apply = orig

    speedup = results["A_reference_resize_conv"] / results["B_polyphase_resize_conv"]
    print(f"\nbatch={B} iters={iters}  polyphase speedup: {speedup:.3f}x")
    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
