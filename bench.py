"""Headline benchmark: cVAE pretrain throughput (waveforms/sec/chip).

Reproduces the reference's stage-1 workload — unimodal waveform cVAE
(z_dim=10, ~8.06M params), batch 512, reference-scale epoch of 19,539 samples
(SURVEY.md §6: the leave-cellexplorer-out pretraining pool) — as the
epoch-as-scan jitted train loop, and measures steady-state training
throughput on the current default JAX device.

Baseline derivation (BASELINE.md): the reference publishes no numbers beyond
"~45 minutes for train+inference on a consumer-grade GPU" (README.md:80).
Attributing the entire 45 min to the six training passes over the pool
(2 models x 3 stages x 19,539 samples) gives the most charitable reference
throughput: 2*3*19539 / 2700 s = 43.4 waveforms/sec. ``vs_baseline`` is
measured throughput / 43.4 (BASELINE.json target: > 20x).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_EPOCH_SAMPLES = 19_539
BASELINE_WAVEFORMS_PER_SEC = 2 * 3 * REFERENCE_EPOCH_SAMPLES / 2700.0  # 43.42


def main():
    from hippie_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from hippie_tpu.data.device_data import batch_plan
    from hippie_tpu.models import cvae
    from hippie_tpu.train import optim, step

    batch_size = 512
    n = REFERENCE_EPOCH_SAMPLES

    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(n, 50)).astype(np.float32))
    source = jnp.asarray(rng.integers(0, 5, size=n).astype(np.int32))

    cfg = cvae.CVAEConfig(z_dim=10, output_size=50, class_hidden_dim=5, num_sources=5, num_classes=5)
    params, bn = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(1e-3, 0.01, clip_val=None)
    ts = step.TrainState(params, bn, tx.init(params))
    train_epoch, _ = step.make_unimodal_epoch_fns(tx, beta=1.0, use_class_labels=False)

    key = jax.random.PRNGKey(42)
    idx, mask = batch_plan(np.arange(n), batch_size, shuffle=True, key=key)
    idx, mask = jnp.asarray(idx), jnp.asarray(mask)

    # MFU denominator from XLA's own cost model BEFORE running (lower+compile
    # is cached): the scan body is counted ONCE, so this is FLOPs per batch.
    flops_per_batch = 0.0
    try:
        compiled = train_epoch.lower(ts, data, source, source, idx, mask, key)
        ca = compiled.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops_per_batch = float(ca.get("flops", 0.0))
    except Exception:
        pass

    # Warmup / compile.
    ts, ms = train_epoch(ts, data, source, source, idx, mask, jax.random.fold_in(key, 0))
    jax.block_until_ready(ms.loss)
    # `block_until_ready` under-waits on the remote axon backend; a scalar
    # fetch forces real completion. One fetch costs a full host round trip,
    # so calibrate it and subtract from the timed window.
    _ = float(np.asarray(ms.loss)[0])
    t0 = time.perf_counter()
    _ = float(np.asarray(ms.loss)[0])
    fetch_rtt = time.perf_counter() - t0

    epochs = 5
    t0 = time.perf_counter()
    for e in range(1, epochs + 1):
        ts, ms = train_epoch(ts, data, source, source, idx, mask, jax.random.fold_in(key, e))
    _ = float(np.asarray(ms.loss)[0])
    dt = max(time.perf_counter() - t0 - fetch_rtt, 1e-9)

    nb = int(idx.shape[0])
    ms_per_batch = dt / (epochs * nb) * 1e3
    mfu = None
    if flops_per_batch > 0:
        tf_per_s = flops_per_batch / (ms_per_batch * 1e-3) / 1e12
        mfu = round(tf_per_s / 197.0, 4)  # v5e bf16 peak ~197 TF/s

    wps = epochs * n / dt
    print(
        json.dumps(
            {
                "metric": "cvae_pretrain_waveforms_per_sec",
                "value": round(wps, 1),
                "unit": "waveforms/s/chip",
                "vs_baseline": round(wps / BASELINE_WAVEFORMS_PER_SEC, 2),
                "ms_per_batch": round(ms_per_batch, 4),
                "mfu_vs_bf16_peak": mfu,
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # transient remote-TPU FAILED_PRECONDITIONs happen
        import sys
        import time as _time

        print(f"bench attempt failed ({type(e).__name__}); retrying once", file=sys.stderr)
        _time.sleep(10)
        main()
