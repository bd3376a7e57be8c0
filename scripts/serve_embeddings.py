"""Embedding-serving HTTP microservice (production/serving surface).

Loads the dual wave/time checkpoints once, keeps the models device-resident,
and serves embedding requests over plain HTTP (stdlib only — no extra deps):

  GET  /healthz  -> {"status": "ok", ...model info}
  GET  /stats    -> request counters + latency aggregates
  POST /embed    -> body {"waveforms": [[...]], "isi_dists": [[...]],
                          "source": int (optional, default 0),
                          "normalize": bool (optional, default false)}
                    reply {"waveform": [[z]], "isi": [[z]], "joint": [[2z]]}

Raw rows may have any width — the same exact linear-resample-to-50/100
preprocessing as training runs on device per request. Inputs are padded to
power-of-two row buckets so steady-state requests reuse compiled executables
(the common buckets are warmed at startup).

Usage:
  python scripts/serve_embeddings.py --wave-checkpoint a.ckpt \
      --time-checkpoint b.ckpt --z_dim 10 --port 8477
  (or `hippie-tpu serve ...`)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--z_dim", type=int, default=10)
    parser.add_argument("--wave-checkpoint", type=str, default=None)
    parser.add_argument("--time-checkpoint", type=str, default=None)
    parser.add_argument("--wave-artifact", type=str, default=None,
                        help="exported .hippie artifact (scripts/export_model.py) "
                             "instead of --wave-checkpoint: no torch, no retrace")
    parser.add_argument("--time-artifact", type=str, default=None)
    parser.add_argument("--num-sources", type=int, default=5)
    parser.add_argument("--num-classes", type=int, default=5)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8477)
    parser.add_argument("--warmup-rows", type=int, default=512,
                        help="bucket size to pre-compile at startup (0 to skip)")
    return parser


class EmbeddingService:
    """Checkpoint-backed embedding engine shared by all server threads."""

    def __init__(self, wave_ckpt=None, time_ckpt=None, *, z_dim: int,
                 num_sources: int = 5, num_classes: int = 5,
                 wave_artifact=None, time_artifact=None):
        from hippie_tpu.utils.cache import enable_persistent_cache

        enable_persistent_cache()
        import jax

        from hippie_tpu.models import cvae
        from hippie_tpu.train import checkpoint as ckpt_mod

        self._lock = threading.Lock()
        self.z_dim = z_dim
        self.requests = 0
        self.rows_embedded = 0
        self.total_latency = 0.0

        # Each modality is served either from a Lightning checkpoint (library
        # embed path) or from an exported StableHLO artifact (hippie_tpu.
        # export — already traced/lowered, symbolic batch, no torch needed).
        self._embed_fns = {}
        for name, out_size, ckpt, artifact in (
            ("wave", 50, wave_ckpt, wave_artifact),
            ("time", 100, time_ckpt, time_artifact),
        ):
            if artifact is not None:
                from hippie_tpu import export as hexport
                from hippie_tpu.evaluate.embeddings import _bucket, _pad_rows

                call, manifest = hexport.load_artifact(artifact)
                self.z_dim = int(manifest.get("z_dim", self.z_dim))

                def _artifact_embed(data, src, call=call):
                    # Same power-of-two row bucketing as the checkpoint path:
                    # Exported.call compiles per concrete shape, so raw N would
                    # pay a fresh XLA compile per distinct request size. Eval
                    # mode means pad rows cannot influence real rows.
                    n = data.shape[0]
                    b = _bucket(n)
                    out = call(_pad_rows(data, b), _pad_rows(src, b))
                    return out[:n]

                self._embed_fns[name] = _artifact_embed
            elif ckpt is not None:
                cfg = cvae.CVAEConfig(z_dim=z_dim, output_size=out_size, class_hidden_dim=5,
                                      num_sources=num_sources, num_classes=num_classes)
                template = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
                payload = ckpt_mod.load_lightning_ckpt(ckpt)
                params, bn, _, _ = ckpt_mod.from_torch_state_dict(
                    payload["state_dict"], template[0], template[1]
                )

                def _lib_embed(data, src, params=params, bn=bn):
                    from hippie_tpu.evaluate import embeddings as emb

                    return np.asarray(emb.embed_unimodal(params, bn, data, src))

                self._embed_fns[name] = _lib_embed
            else:
                raise ValueError(f"provide --{name}-checkpoint or --{name}-artifact")

    def warmup(self, rows: int):
        if rows > 0:
            self.embed(np.zeros((rows, 46), np.float32), np.zeros((rows, 100), np.float32), 0, False)

    def embed(self, waveforms: np.ndarray, isi_dists: np.ndarray, source: int, normalize: bool):
        import jax.numpy as jnp

        from hippie_tpu.evaluate.embeddings import _bucket
        from hippie_tpu.ops import preprocess

        t0 = time.perf_counter()
        # Bucket the RAW rows before preprocessing: every stage downstream
        # (preprocess included) compiles per concrete shape, so without this
        # the first request of each new row count paid a fresh remote compile
        # (~5 s measured). Preprocessing is row-local (log1p / per-sample
        # min-max / per-row resample) and embedding runs in eval mode, so
        # zero-pad rows cannot influence real rows; they are sliced off.
        n = len(waveforms)
        b = _bucket(n)
        wf_p = np.zeros((b, waveforms.shape[1]), np.float32)
        wf_p[:n] = waveforms
        isi_p = np.zeros((b, isi_dists.shape[1]), np.float32)
        isi_p[:n] = isi_dists
        wave = preprocess.preprocess_waveforms(jnp.asarray(wf_p), normalize=normalize)
        isi = preprocess.preprocess_isi(jnp.asarray(isi_p), normalize=normalize)
        src = jnp.full((b,), int(source), jnp.int32)
        w = np.asarray(self._embed_fns["wave"](wave, src))[:n]
        i = np.asarray(self._embed_fns["time"](isi, src))[:n]
        j = np.concatenate([w, i], axis=1)
        dt = time.perf_counter() - t0
        with self._lock:
            self.requests += 1
            self.rows_embedded += len(w)
            self.total_latency += dt
        return w, i, j, dt


def make_handler(service: EmbeddingService):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok", "z_dim": service.z_dim})
            elif self.path == "/stats":
                with service._lock:
                    self._reply(200, {
                        "requests": service.requests,
                        "rows_embedded": service.rows_embedded,
                        "mean_latency_ms": round(
                            1000 * service.total_latency / max(service.requests, 1), 3
                        ),
                    })
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/embed":
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length) or b"{}")
                wf = np.asarray(payload["waveforms"], np.float32)
                isi = np.asarray(payload["isi_dists"], np.float32)
                if wf.ndim != 2 or isi.ndim != 2 or len(wf) != len(isi) or len(wf) == 0:
                    raise ValueError(
                        f"waveforms/isi_dists must be equal-length 2-D arrays, "
                        f"got {wf.shape} and {isi.shape}"
                    )
                source = int(payload.get("source", 0))
                normalize = bool(payload.get("normalize", False))
            except (KeyError, ValueError, TypeError, json.JSONDecodeError) as e:
                self._reply(400, {"error": str(e)})
                return
            w, i, j, dt = service.embed(wf, isi, source, normalize)
            self._reply(200, {
                "waveform": np.asarray(w).tolist(),
                "isi": np.asarray(i).tolist(),
                "joint": np.asarray(j).tolist(),
                "latency_ms": round(dt * 1000, 3),
            })

    return Handler


def main(argv=None):
    args = build_parser().parse_args(argv)
    service = EmbeddingService(
        args.wave_checkpoint, args.time_checkpoint,
        z_dim=args.z_dim, num_sources=args.num_sources, num_classes=args.num_classes,
        wave_artifact=args.wave_artifact, time_artifact=args.time_artifact,
    )
    print("warming up...")
    service.warmup(args.warmup_rows)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(service))
    print(f"serving embeddings on http://{args.host}:{args.port} (POST /embed)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
