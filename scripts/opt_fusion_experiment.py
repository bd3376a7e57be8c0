"""Optimizer-in-backward / fused-update experiment (VERDICT r2 item 3).

Question: the AdamW update moves ~226 MB/step of optimizer state at 8.06M
params (~276 us at peak HBM BW); can folding the update into the backward —
or hand-fusing its elementwise chain — overlap or shrink that traffic and
lift the train step past ~39% MFU?

Variants measured on the bench workload (z=10 unimodal cVAE, batch 512,
unclipped stage-1 wave config), each inside ONE jitted fori_loop with the
remote dispatch floor calibrated out (same harness as profile_train_step.py):

  A. production step: value_and_grad -> optax chain (inject_hyperparams(adamw))
  B. plain optax.adamw (no inject_hyperparams wrapper)
  C. hand-fused AdamW: one tree_map computing (new_p, new_m, new_v) per leaf
     in a single pass (minimal possible traffic: read p,m,v,g; write p,m,v)
  D. fwd+bwd only (no optimizer) — the overlap bound: if A-D is much smaller
     than the standalone optimizer pass, XLA already hides the state traffic
  E. A with bf16 moments (--opt-state-dtype bfloat16 production option)

"Optimizer-in-backward" in the torch sense (per-tensor update hooks firing
as grads materialize) has no direct JAX spelling — the whole step is one XLA
program and the scheduler is free to start each leaf's update as soon as its
grad is ready (no cross-leaf dependence without global clipping). Variant D
bounds what that freedom is worth; C bounds what kernel-count/fusion wins
are left. Results recorded in RESULTS.md.

Usage: python scripts/opt_fusion_experiment.py [--batch 512] [--iters 200]
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

    from hippie_tpu.models import cvae
    from hippie_tpu.ops import losses
    from hippie_tpu.train import optim

    B, iters = args.batch, args.iters
    cfg = cvae.CVAEConfig(z_dim=10, output_size=50, class_hidden_dim=5,
                          num_sources=5, num_classes=5)
    params, bn = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    n_params = cvae.param_count(params)
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

    def timed(name, make_loop, *loop_args, overhead_ms=0.0):
        fn = jax.jit(make_loop)
        out = fn(*loop_args)  # compile + warmup
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        out = fn(*loop_args)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = ((time.perf_counter() - t0) * 1e3 - overhead_ms) / iters
        print(f"{name:44s} {dt:8.3f} ms/iter")
        return name, dt

    def empty_loop(acc):
        return jax.lax.fori_loop(0, iters, lambda i, a: a + 1.0, acc)

    efn = jax.jit(empty_loop)
    _ = float(efn(jnp.float32(0)))
    t0 = time.perf_counter()
    _ = float(efn(jnp.float32(0)))
    dispatch_ms = (time.perf_counter() - t0) * 1e3
    print(f"{'dispatch+fetch floor':44s} {dispatch_ms:8.3f} ms/call")

    results = {}

    def step_loop_with(update_fn, init_state):
        def loop(p, s, o):
            def body(i, carry):
                p, s, o = carry
                (loss, new_s), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    p, s, jax.random.fold_in(key, i)
                )
                p, o = update_fn(p, g, o)
                return p, new_s, o

            return jax.lax.fori_loop(0, iters, body, (p, s, o))

        return loop, init_state

    # A. production optax chain (inject_hyperparams(adamw))
    txA = optim.make_optimizer(1e-3, 0.01, clip_val=None)

    def updA(p, g, o):
        up, o = txA.update(g, o, p)
        return optax.apply_updates(p, up), o

    loop, o0 = step_loop_with(updA, txA.init(params))
    results["A_production_optax_chain"] = timed(
        "A production optax chain", loop, params, bn, o0, overhead_ms=dispatch_ms)[1]

    # B. plain optax.adamw
    txB = optax.adamw(1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)

    def updB(p, g, o):
        up, o = txB.update(g, o, p)
        return optax.apply_updates(p, up), o

    loop, o0 = step_loop_with(updB, txB.init(params))
    results["B_plain_optax_adamw"] = timed(
        "B plain optax.adamw", loop, params, bn, o0, overhead_ms=dispatch_ms)[1]

    # C. hand-fused AdamW: single pass, minimal traffic
    def fused_init(p):
        z = jax.tree_util.tree_map(jnp.zeros_like, p)
        return (jnp.zeros((), jnp.int32), z,
                jax.tree_util.tree_map(jnp.zeros_like, p))

    def updC(p, g, o, lr=1e-3, b1=0.9, b2=0.999, eps=1e-8, wd=0.01):
        t, m, v = o
        t = t + 1
        c1 = 1.0 - b1 ** t.astype(jnp.float32)
        c2 = 1.0 - b2 ** t.astype(jnp.float32)

        def leaf(p, g, m, v):
            nm = b1 * m + (1 - b1) * g
            nv = b2 * v + (1 - b2) * jnp.square(g)
            upd = (nm / c1) / (jnp.sqrt(nv / c2) + eps) + wd * p
            return p - lr * upd, nm, nv

        out = jax.tree_util.tree_map(
            lambda p, g, m, v: leaf(p, g, m, v), p, g, m, v,
            is_leaf=lambda x: False,
        )
        newp = jax.tree_util.tree_map(lambda t3: t3[0], out,
                                      is_leaf=lambda x: isinstance(x, tuple))
        newm = jax.tree_util.tree_map(lambda t3: t3[1], out,
                                      is_leaf=lambda x: isinstance(x, tuple))
        newv = jax.tree_util.tree_map(lambda t3: t3[2], out,
                                      is_leaf=lambda x: isinstance(x, tuple))
        return newp, (t, newm, newv)

    loop, o0 = step_loop_with(updC, fused_init(params))
    results["C_hand_fused_adamw"] = timed(
        "C hand-fused AdamW (1 pass)", loop, params, bn, o0, overhead_ms=dispatch_ms)[1]

    # D. fwd+bwd only — the overlap bound
    def loopD(p, s):
        def body(i, carry):
            p, s = carry
            (loss, new_s), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, s, jax.random.fold_in(key, i)
            )
            p = jax.tree_util.tree_map(lambda a, b: a - 0.0 * b, p, g)
            return p, new_s

        return jax.lax.fori_loop(0, iters, body, (p, s))

    results["D_fwd_bwd_only"] = timed(
        "D fwd+bwd only (no optimizer)", loopD, params, bn, overhead_ms=dispatch_ms)[1]

    # E. production with bf16 moments
    txE = optim.make_optimizer(1e-3, 0.01, clip_val=None, state_dtype="bfloat16")

    def updE(p, g, o):
        up, o = txE.update(g, o, p)
        return optax.apply_updates(p, up), o

    loop, o0 = step_loop_with(updE, txE.init(params))
    results["E_bf16_moments"] = timed(
        "E production + bf16 moments", loop, params, bn, o0, overhead_ms=dispatch_ms)[1]

    # standalone optimizer pass (fixed grads) for the exposure comparison
    fixed_g = jax.tree_util.tree_map(lambda a: jnp.full_like(a, 1e-6), params)

    def opt_only(p, o):
        def body(i, carry):
            p, o = carry
            up, o = txA.update(fixed_g, o, p)
            return optax.apply_updates(p, up), o

        return jax.lax.fori_loop(0, iters, body, (p, o))

    results["opt_only_standalone"] = timed(
        "optimizer pass standalone", opt_only, params, txA.init(params),
        overhead_ms=dispatch_ms)[1]

    exposure = results["A_production_optax_chain"] - results["D_fwd_bwd_only"]
    print(f"\nparams={n_params:,}  batch={B}")
    print(f"optimizer EXPOSED time in the full step: {exposure:.3f} ms "
          f"(standalone pass: {results['opt_only_standalone']:.3f} ms)")
    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
