"""Measure vmapped K-replica ensemble training throughput on the real TPU.

Question: the reference recipe's batch 512 sits below the chip's sweet spot
(RESULTS.md "throughput vs batch size": MFU 0.345 @512 vs 0.417 @1024). Does
vmapping K full-size models over one program (train/ensemble.py) buy K
trained models in < K× one model's wall-clock?

Method mirrors scripts/opt_fusion_experiment.py: full-size stage-1 wave
config (z=10, 8.06M params, batch 512), a jitted fori_loop of train steps per
variant, remote dispatch floor excluded by timing the loop body only, scalar
fetch to force completion (jax.block_until_ready under-waits on axon). Run
with the default env (real TPU); no args.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hippie_tpu.models import cvae
from hippie_tpu.train import ensemble, optim, step

BATCH = 512
ITERS = 100
REPS = 3


def time_loop(fn, *args):
    """Median-of-REPS seconds for ITERS iterations of jitted fn(*args)."""
    out = fn(*args)  # compile + warm
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # force completion
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    print(f"devices: {jax.devices()}")
    cfg = cvae.CVAEConfig(z_dim=10, output_size=50)
    tx = optim.make_optimizer(1e-3, 0.01)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(BATCH, 50)).astype(np.float32))
    source = jnp.zeros((BATCH,), jnp.int32)
    mask = jnp.ones((BATCH,), jnp.float32)

    batch_step, _ = step.make_unimodal_steps(tx, beta=1.0)

    def make_loop(stepfn, ts_template):
        @jax.jit
        def loop(ts, key):
            keys = jax.random.split(key, ITERS)

            def body(i, carry):
                new, m = stepfn(carry, data, source, None, mask, keys[i])
                return new

            ts = jax.lax.fori_loop(0, ITERS, body, ts)
            return ts.params

        return loop

    results = {}
    # K=0 marker = plain single model (no vmap axis at all)
    p, s = cvae.unimodal_cvae_init(jax.random.PRNGKey(1), cfg)
    ts1 = step.TrainState(p, s, tx.init(p))
    loop1 = make_loop(batch_step, ts1)
    t1 = time_loop(loop1, ts1, jax.random.PRNGKey(2)) / ITERS
    results["single"] = t1
    print(f"single model:          {t1 * 1e3:8.3f} ms/step")

    for K in (1, 2, 4, 8):
        tsk = ensemble.init_unimodal_ensemble(jax.random.PRNGKey(1), cfg, tx, K)
        v_step = jax.vmap(batch_step, in_axes=(0, None, None, None, None, 0))

        def vstep(ts, d, s_, c, m, key):
            return v_step(ts, d, s_, c, m, jax.random.split(key, K))

        loopk = make_loop(vstep, tsk)
        tk = time_loop(loopk, tsk, jax.random.PRNGKey(2)) / ITERS
        results[f"K={K}"] = tk
        print(
            f"ensemble K={K}:          {tk * 1e3:8.3f} ms/step  "
            f"({tk / (K * t1):.2f}x of K sequential; per-model "
            f"{tk / K * 1e3:.3f} ms, {BATCH * K / tk:,.0f} wf/s aggregate)"
        )

    print("\nsummary: per-model speedup vs sequential")
    for K in (1, 2, 4, 8):
        tk = results[f"K={K}"]
        print(f"  K={K}: {K * t1 / tk:.2f}x")


if __name__ == "__main__":
    main()
