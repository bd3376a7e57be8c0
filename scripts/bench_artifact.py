"""Deployment-artifact throughput: the exported StableHLO embedder on the
current backend (cpu and/or tpu — the artifact is multi-platform).

Measures end-to-end serving latency of `hippie_tpu.export.load_artifact`'s
callable — deserialize once, then timed calls at several row counts (first
call per shape pays the backend compile and is reported separately). This is
the deployment story's headline number (VERDICT r2 item 9): the same .hippie
file drives a dev box (cpu) and a serving chip (tpu).

Usage:
  python scripts/bench_artifact.py --artifact wave.hippie [--rows 512,4096]
  PYTHONPATH= JAX_PLATFORMS=cpu python scripts/bench_artifact.py ...  # cpu run

Prints one JSON line per row count:
  {"platform": ..., "rows": N, "warm_ms": ..., "rows_per_sec": ..., "cold_ms": ...}
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
    ap.add_argument("--artifact", type=str, required=True)
    ap.add_argument("--rows", type=str, default="512,4096,16384")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from hippie_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import numpy as np

    from hippie_tpu import export as hexport

    call, manifest = hexport.load_artifact(args.artifact)
    platform = jax.default_backend()
    multimodal = manifest.get("modality") == "multimodal"
    rng = np.random.default_rng(0)

    for rows in (int(r) for r in args.rows.split(",")):
        if multimodal:
            lens = manifest["input_lens"]
            arrays = (
                rng.normal(size=(rows, lens[0])).astype(np.float32),
                rng.normal(size=(rows, lens[1])).astype(np.float32),
                np.zeros((rows,), np.int32),
            )
        else:
            arrays = (
                rng.normal(size=(rows, manifest["input_len"])).astype(np.float32),
                np.zeros((rows,), np.int32),
            )
        t0 = time.perf_counter()
        out = call(*arrays)
        _ = float(np.asarray(out).ravel()[0])  # force completion
        cold_ms = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        for _i in range(args.iters):
            out = call(*arrays)
        _ = float(np.asarray(out).ravel()[0])
        warm_ms = (time.perf_counter() - t0) * 1e3 / args.iters
        print(json.dumps({
            "platform": platform,
            "rows": rows,
            "cold_ms": round(cold_ms, 2),
            "warm_ms": round(warm_ms, 2),
            "rows_per_sec": round(rows / (warm_ms / 1e3), 1),
            "z_dim": manifest.get("z_dim"),
            "modality": manifest.get("modality"),
        }))


if __name__ == "__main__":
    main()
