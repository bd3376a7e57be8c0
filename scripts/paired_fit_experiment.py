"""Paired-model training experiment: fuse the wave + time train steps.

The pipeline trains its two unimodal models (wave out=50, time out=100)
SEQUENTIALLY, mirroring the reference (train_model.py:119-158); each step is
conv-FLOP bound at ~38% MFU with the small-C BatchNorm/elementwise glue on
the VPU (RESULTS.md round-2 analysis: ~23 us of a 35 us layer-1 block is
glue). The two models are computationally independent, so ONE program that
runs both steps lets the XLA scheduler overlap model A's MXU convs with
model B's VPU glue (and vice versa).

This measures the headroom: ms/iter for the wave step, the time step, and
a fused both-models step, same harness as opt_fusion_experiment.py (jitted
fori_loop, remote dispatch floor calibrated out). A fused step meaningfully
cheaper than the sequential sum means a real pipeline win for stages 1-2
(both models see the same row count and batch plan shape per stage).

Usage: python scripts/paired_fit_experiment.py [--batch 512] [--iters 200]
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

    from hippie_tpu.models import cvae
    from hippie_tpu.train import optim, step

    B, iters = args.batch, args.iters
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    source = jnp.zeros((B,), jnp.int32)
    mask = jnp.ones((B,), jnp.float32)

    models = {}
    for name, out_size, clip in (("wave", 50, None), ("time", 100, 1.0)):
        cfg = cvae.CVAEConfig(z_dim=10, output_size=out_size,
                              class_hidden_dim=5, num_sources=5, num_classes=5)
        p, bn = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
        tx = optim.make_optimizer(1e-3, 0.01, clip_val=clip)
        batch_step, _ = step.make_unimodal_steps(tx)
        data = jnp.asarray(rng.normal(size=(B, out_size)).astype(np.float32))
        models[name] = dict(
            ts=step.TrainState(p, bn, jax.jit(tx.init)(p)),
            batch_step=batch_step, data=data,
        )

    def timed(name, loop_fn, *a, overhead_ms=0.0):
        fn = jax.jit(loop_fn)
        out = fn(*a)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        out = fn(*a)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = ((time.perf_counter() - t0) * 1e3 - overhead_ms) / iters
        print(f"{name:40s} {dt:8.3f} ms/iter")
        return dt

    def empty_loop(acc):
        return jax.lax.fori_loop(0, iters, lambda i, a: a + 1.0, acc)

    efn = jax.jit(empty_loop)
    _ = float(efn(jnp.float32(0)))
    t0 = time.perf_counter()
    _ = float(efn(jnp.float32(0)))
    dispatch_ms = (time.perf_counter() - t0) * 1e3
    print(f"{'dispatch+fetch floor':40s} {dispatch_ms:8.3f} ms/call")

    def single_loop(m):
        def loop(ts):
            def body(i, ts):
                ts, _ = m["batch_step"](ts, m["data"], source, None, mask,
                                        jax.random.fold_in(key, i))
                return ts
            return jax.lax.fori_loop(0, iters, body, ts)
        return loop

    results = {}
    results["wave_ms"] = timed("wave step alone", single_loop(models["wave"]),
                               models["wave"]["ts"], overhead_ms=dispatch_ms)
    results["time_ms"] = timed("time step alone", single_loop(models["time"]),
                               models["time"]["ts"], overhead_ms=dispatch_ms)

    def paired_loop(ts_w, ts_t):
        def body(i, carry):
            ts_w, ts_t = carry
            k = jax.random.fold_in(key, i)
            ts_w, _ = models["wave"]["batch_step"](
                ts_w, models["wave"]["data"], source, None, mask, k)
            ts_t, _ = models["time"]["batch_step"](
                ts_t, models["time"]["data"], source, None, mask, k)
            return ts_w, ts_t
        return jax.lax.fori_loop(0, iters, body, (ts_w, ts_t))

    results["paired_ms"] = timed("paired (both models, one program)",
                                 paired_loop, models["wave"]["ts"],
                                 models["time"]["ts"], overhead_ms=dispatch_ms)

    seq = results["wave_ms"] + results["time_ms"]
    results["sequential_sum_ms"] = seq
    results["speedup"] = seq / results["paired_ms"]
    print(f"{'sequential sum':40s} {seq:8.3f} ms/iter")
    print(f"{'paired speedup':40s} {results['speedup']:8.3f}x")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
