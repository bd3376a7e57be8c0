"""Component-level timing of the unimodal train step on the current device.

Breaks the bench.py workload (z=10 cVAE, batch 512) into parts — full
fwd+bwd+AdamW step, loss forward, grads-only, optimizer-only, encoder/decoder
forwards, and the dominant conv shapes — so kernel-fusion work targets the
actual bottleneck instead of a guess. Each part runs inside ONE jitted
lax.fori_loop (remote backends pay ~65 ms per dispatch, so eager timing or
per-step dispatch would swamp the signal); completion is forced with a scalar
fetch because block_until_ready under-waits on the axon platform.

Usage: python scripts/profile_train_step.py [--batch 512] [--iters 30]
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
    ap.add_argument("--conv-iters", type=int, default=2000)
    args = ap.parse_args()

    from hippie_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from hippie_tpu.models import cvae
    from hippie_tpu.models.backbones import resnet18_dec_apply, resnet18_enc_apply
    from hippie_tpu.ops import losses
    from hippie_tpu.train import optim

    B, iters = args.batch, args.iters
    cfg = cvae.CVAEConfig(z_dim=10, output_size=50, class_hidden_dim=5, num_sources=5, num_classes=5)
    params, bn = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(1e-3, 0.01, clip_val=None)
    opt = tx.init(params)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(B, 50)).astype(np.float32))
    source = jnp.zeros((B,), jnp.int32)
    key = jax.random.PRNGKey(1)

    def loss_fn(p, s, k):
        (enc, mu, logvar, dec), new_s = cvae.unimodal_cvae_apply(
            p, s, data, source, rng=k, training=True
        )
        total, _ = losses.vae_loss(data, dec, mu, logvar, beta=1.0)
        return total, new_s

    def timed(name, make_loop, *loop_args, n_iters=None, overhead_ms=0.0):
        n = iters if n_iters is None else n_iters
        fn = jax.jit(make_loop)
        out = fn(*loop_args)  # compile + warmup
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        out = fn(*loop_args)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = ((time.perf_counter() - t0) * 1e3 - overhead_ms) / n
        print(f"{name:36s} {dt:8.3f} ms/iter")
        return name, dt

    results = []

    # Calibrate the fixed dispatch+fetch round-trip cost of one jit call so
    # it can be subtracted: on the remote backend it is ~30-100 ms, which
    # would otherwise swamp every per-iteration number.
    def empty_loop(acc):
        return jax.lax.fori_loop(0, iters, lambda i, a: a + 1.0, acc)

    efn = jax.jit(empty_loop)
    _ = float(efn(jnp.float32(0)))
    t0 = time.perf_counter()
    _ = float(efn(jnp.float32(0)))
    dispatch_ms = (time.perf_counter() - t0) * 1e3
    print(f"{'dispatch+fetch floor':36s} {dispatch_ms:8.3f} ms/call")

    # 1) full train step: fwd + bwd + AdamW
    def full_step_loop(p, s, o):
        def body(i, carry):
            p, s, o = carry
            (loss, new_s), g = jax.value_and_grad(loss_fn, has_aux=True)(p, s, jax.random.fold_in(key, i))
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), new_s, o

        return jax.lax.fori_loop(0, iters, body, (p, s, o))

    results.append(timed("full train step", full_step_loop, params, bn, opt, overhead_ms=dispatch_ms))

    # 2) grads only (fwd+bwd, no optimizer)
    def grad_loop(p, s):
        def body(i, carry):
            p, s = carry
            (loss, new_s), g = jax.value_and_grad(loss_fn, has_aux=True)(p, s, jax.random.fold_in(key, i))
            # feed a grad leaf back so the loop carries a data dependency
            p = jax.tree_util.tree_map(lambda a, b: a - 0.0 * b, p, g)
            return p, new_s

        return jax.lax.fori_loop(0, iters, body, (p, s))

    results.append(timed("fwd+bwd (no optimizer)", grad_loop, params, bn, overhead_ms=dispatch_ms))

    # 3) forward only (training mode, loss value)
    def fwd_loop(p, s):
        def body(i, carry):
            s, acc = carry
            loss, new_s = loss_fn(p, s, jax.random.fold_in(key, i))
            return new_s, acc + loss

        return jax.lax.fori_loop(0, iters, body, (s, jnp.float32(0)))

    results.append(timed("forward only (train mode)", fwd_loop, params, bn, overhead_ms=dispatch_ms))

    # 4) optimizer only (apply fixed grads)
    fixed_g = jax.tree_util.tree_map(lambda a: jnp.full_like(a, 1e-6), params)

    def opt_loop(p, o):
        def body(i, carry):
            p, o = carry
            up, o = tx.update(fixed_g, o, p)
            return optax.apply_updates(p, up), o

        return jax.lax.fori_loop(0, iters, body, (p, o))

    results.append(timed("optimizer only", opt_loop, params, tx.init(params), overhead_ms=dispatch_ms))

    # 5) encoder / decoder forwards (train mode)
    x3 = data[:, :, None]

    def enc_loop(p, s):
        def body(i, carry):
            s, acc = carry
            h, new_s = resnet18_enc_apply(p, s, x3 + acc * 0, training=True)
            return new_s, acc + jnp.sum(h) * 0 + h[0, 0]

        return jax.lax.fori_loop(0, iters, body, (s, jnp.float32(0)))

    results.append(timed("encoder fwd (train mode)", enc_loop, params["encoder"], bn["encoder"], overhead_ms=dispatch_ms))

    zin = jnp.asarray(rng.normal(size=(B, 20)).astype(np.float32))

    def dec_loop(p, s):
        def body(i, carry):
            s, acc = carry
            h, new_s = resnet18_dec_apply(p, s, zin + acc * 0, training=True)
            return new_s, acc + h[0, 0]

        return jax.lax.fori_loop(0, iters, body, (s, jnp.float32(0)))

    results.append(timed("decoder fwd (train mode)", dec_loop, params["decoder"], bn["decoder"], overhead_ms=dispatch_ms))

    # 5b) backward split: grad through encoder alone / decoder alone
    def enc_grad_loop(p, s):
        def eloss(p, s):
            h, new_s = resnet18_enc_apply(p, s, x3, training=True)
            return jnp.sum(h * h), new_s

        def body(i, carry):
            p, s = carry
            (v, new_s), g = jax.value_and_grad(eloss, has_aux=True)(p, s)
            return jax.tree_util.tree_map(lambda a, b: a - 0.0 * b, p, g), new_s

        return jax.lax.fori_loop(0, iters, body, (p, s))

    results.append(timed("encoder fwd+bwd", enc_grad_loop, params["encoder"], bn["encoder"], overhead_ms=dispatch_ms))

    def dec_grad_loop(p, s):
        def dloss(p, s):
            h, new_s = resnet18_dec_apply(p, s, zin, training=True)
            return jnp.sum(h * h), new_s

        def body(i, carry):
            p, s = carry
            (v, new_s), g = jax.value_and_grad(dloss, has_aux=True)(p, s)
            return jax.tree_util.tree_map(lambda a, b: a - 0.0 * b, p, g), new_s

        return jax.lax.fori_loop(0, iters, body, (p, s))

    results.append(timed("decoder fwd+bwd", dec_grad_loop, params["decoder"], bn["decoder"], overhead_ms=dispatch_ms))

    # 5c) per-conv backward cost: dx and dw for the dominant shapes
    def conv_grad_loops(name, xs, ws, stride):
        x = jnp.asarray(rng.normal(size=xs).astype(np.float32))
        w = jnp.asarray(rng.normal(size=ws).astype(np.float32))

        def closs(x, w):
            y = conv1d(x, w, stride=stride, padding=1)
            return jnp.sum(y * y)

        def body_dx(i, carry):
            x, w = carry
            gx = jax.grad(closs, argnums=0)(x, w)
            return x - 0.0 * gx, w

        def body_dw(i, carry):
            x, w = carry
            gw = jax.grad(closs, argnums=1)(x, w)
            return x, w - 0.0 * gw

        from functools import partial

        results.append(timed(f"{name} dx", lambda x, w: jax.lax.fori_loop(0, args.conv_iters, body_dx, (x, w)),
                             x, w, n_iters=args.conv_iters, overhead_ms=dispatch_ms))
        results.append(timed(f"{name} dw", lambda x, w: jax.lax.fori_loop(0, args.conv_iters, body_dw, (x, w)),
                             x, w, n_iters=args.conv_iters, overhead_ms=dispatch_ms))

    from hippie_tpu.nn.functional import conv1d

    for name, xs, ws, stride in [
        ("enc l1 conv 64x64 L25", (B, 25, 64), (3, 64, 64), 1),
        ("enc l4 conv 512x512 L4", (B, 4, 512), (3, 512, 512), 1),
        ("dec l1 conv 64x64 L64", (B, 64, 64), (3, 64, 64), 1),
        ("dec l4 conv 512x512 L4", (B, 4, 512), (3, 512, 512), 1),
    ]:
        conv_grad_loops(name, xs, ws, stride)

    # 6) dominant conv shapes, fp32 vs bf16 (as the step sees them)
    from hippie_tpu.nn.functional import conv1d

    conv_shapes = [
        ("enc l1 conv 64x64 L25", (B, 25, 64), (3, 64, 64), 1),
        ("enc l2 conv 128x128 L13", (B, 13, 128), (3, 128, 128), 1),
        ("enc l3 conv 256x256 L7", (B, 7, 256), (3, 256, 256), 1),
        ("enc l4 conv 512x512 L4", (B, 4, 512), (3, 512, 512), 1),
        ("dec l1 conv 64x64 L64", (B, 64, 64), (3, 64, 64), 1),
    ]
    for name, xs, ws, stride in conv_shapes:
        for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            x = jnp.asarray(rng.normal(size=xs), dt)
            w = jnp.asarray(rng.normal(size=ws), dt)

            def conv_loop(x, w, stride=stride):
                def body(i, acc):
                    y = conv1d(acc, w, stride=stride, padding=1)
                    # renormalize so values stay finite; keeps the dependency
                    return acc + 0 * jnp.mean(y) + 1e-6 * y[:, : acc.shape[1], : acc.shape[2]]

                return jax.lax.fori_loop(0, args.conv_iters, body, x)

            flops = 2 * xs[0] * xs[1] * ws[0] * ws[1] * ws[2] / stride
            _, ms = timed(f"{name} [{dt_name}]", conv_loop, x, w, n_iters=args.conv_iters, overhead_ms=dispatch_ms)
            print(f"{'':36s} -> {flops / (ms * 1e-3) / 1e12:.2f} TF/s")
            results.append((f"{name}[{dt_name}]", ms))

    print(json.dumps({k: round(v, 4) for k, v in results}))


if __name__ == "__main__":
    main()
