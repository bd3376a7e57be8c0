"""TPU numerical-parity check against the frozen torch goldens.

Run on real TPU hardware (default env). Reports the minimum per-sample cosine
similarity of eval-mode embeddings vs the torch-CPU reference (BASELINE.md
target: > 0.999) plus the embedding-export wall time for cellexplorer-scale
data, as JSON.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from hippie_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from hippie_tpu.evaluate import embeddings as emb
    from hippie_tpu.models import cvae
    from hippie_tpu.train import checkpoint as ckpt

    gold_path = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens" / "unimodal_cvae.npz"
    if not gold_path.exists():
        import subprocess

        subprocess.run([sys.executable, str(gold_path.parent.parent / "golden_gen.py")], check=True)
    gold = np.load(gold_path)

    cfg = cvae.CVAEConfig(z_dim=10, output_size=50)
    p, s = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    sd = {k[len("sd0."):]: gold[k] for k in gold.files if k.startswith("sd0.")}
    p, s, _, _ = ckpt.from_torch_state_dict(sd, p, s, prefix="")

    data = jnp.asarray(gold["data"][:, 0, :])
    src = jnp.asarray(gold["source_labels"])
    cls = jnp.asarray(gold["class_labels"])

    e = np.asarray(emb.embed_unimodal(p, s, data, src, cls))
    # reference embedding, z-scored the same way (scripts/utils.py:84-85)
    ref = gold["enc_eval"].astype(np.float64)
    ref = (ref - ref.mean(axis=1, keepdims=True)) / ref.std(axis=1, ddof=1, keepdims=True)
    num = (e.astype(np.float64) * ref).sum(axis=1)
    den = np.linalg.norm(e, axis=1) * np.linalg.norm(ref, axis=1)
    min_cos = float((num / den).min())

    # embedding-export timing at cellexplorer scale (392 rows) and 16k rows
    timings = {}
    for n in (392, 16_384):
        big = jnp.asarray(np.random.default_rng(0).normal(size=(n, 50)).astype(np.float32))
        bsrc = jnp.zeros((n,), jnp.int32)
        e0 = emb.embed_unimodal(p, s, big, bsrc)  # compile
        jax.block_until_ready(e0)
        t0 = time.perf_counter()
        e1 = emb.embed_unimodal(p, s, big, bsrc)
        jax.block_until_ready(e1)
        timings[f"embed_export_{n}_ms"] = round(1000 * (time.perf_counter() - t0), 2)

    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "min_embedding_cosine_vs_torch": min_cos,
                "target": 0.999,
                "pass": min_cos > 0.999,
                **timings,
            }
        )
    )


if __name__ == "__main__":
    main()
