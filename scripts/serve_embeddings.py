"""Embedding-serving HTTP microservice (production/serving surface).

Loads the model(s) once, keeps them device-resident, and serves embedding
requests over plain HTTP (stdlib only — no extra deps):

  GET  /healthz  -> {"status": "ok", ...model info}
  GET  /stats    -> request counters + latency aggregates (p50/p99)
  POST /embed    -> body {"waveforms": [[...]], "isi_dists": [[...]],
                          "source": int (optional, default 0),
                          "normalize": bool (optional, default false)}
                    dual mode reply  {"waveform": [[z]], "isi": [[z]], "joint": [[2z]]}
                    joint mode reply {"joint": [[z]]}

Model backends:
  --wave-checkpoint/--time-checkpoint   dual unimodal Lightning ckpts
  --wave-artifact/--time-artifact       exported StableHLO artifacts
  --joint-checkpoint / --joint-artifact the MultiModalCVAE joint model

Concurrency discipline: there is ONE device; concurrent requests must not
race it (concurrent TPU dispatch wrecks both latencies). All device work
funnels through a single dispatch worker; requests that arrive while a batch
is in flight are COALESCED — compatible pending requests (same row widths +
normalize flag) are concatenated into one device call and the results split
per request. Under an N-client burst this turns N dispatches into ~1-2.

Raw rows may have any width — the same exact linear-resample-to-50/100
preprocessing as training runs on device per request. Inputs are padded to
power-of-two row buckets so steady-state requests reuse compiled executables
(the common buckets are warmed at startup).

Usage:
  python scripts/serve_embeddings.py --wave-checkpoint a.ckpt \
      --time-checkpoint b.ckpt --port 8477
  python scripts/serve_embeddings.py --joint-artifact joint.hippie
  (or `hippie-tpu serve ...`)
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import functools


@functools.lru_cache(maxsize=64)
def _device_interp_matrix(in_len: int, out_len: int, cap: int):
    """Device-resident padded resample coefficients, cached per geometry.

    The numpy matrix (ops.resample.padded_interp_matrix) is already
    lru-cached, but jnp.asarray on it re-uploads ~50-205 KB host->device on
    EVERY request — pure recurring overhead on the remote-tunnel dispatch
    path this file exists to minimize. The matrices never change per
    (in_len, out_len, cap), so keep them device-resident."""
    import jax.numpy as jnp

    from hippie_tpu.ops.resample import padded_interp_matrix

    return jnp.asarray(padded_interp_matrix(in_len, out_len, cap))


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--z_dim", type=int, default=10,
                        help="fallback when geometry cannot be inferred from the model file")
    parser.add_argument("--wave-checkpoint", type=str, default=None)
    parser.add_argument("--time-checkpoint", type=str, default=None)
    parser.add_argument("--wave-artifact", type=str, default=None,
                        help="exported .hippie artifact (scripts/export_model.py) "
                             "instead of --wave-checkpoint: no torch, no retrace")
    parser.add_argument("--time-artifact", type=str, default=None)
    parser.add_argument("--joint-checkpoint", type=str, default=None,
                        help="serve a MultiModalCVAE joint checkpoint (reply has "
                             "'joint' embeddings only)")
    parser.add_argument("--joint-artifact", type=str, default=None,
                        help="exported multimodal .hippie artifact")
    parser.add_argument("--num-sources", type=int, default=5)
    parser.add_argument("--num-classes", type=int, default=5)
    parser.add_argument("--aot-dir", type=str,
                        default=os.path.join(os.path.expanduser("~"), ".cache", "hippie_tpu_aot"),
                        help="executable AOT cache dir shared with the training "
                             "pipeline: the warmup ladder's embed + preprocess "
                             "programs load as serialized executables on a warm "
                             "restart instead of re-tracing/re-compiling "
                             "(measured: the dominant cost of the ladder). "
                             "'' disables")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8477)
    parser.add_argument("--warmup-buckets", type=str, default="512,1024,2048,4096",
                        help="comma-separated ladder of row buckets to pre-compile at "
                             "startup. Warming the LADDER (not one bucket) means (a) no "
                             "live client ever pays a first-of-bucket compile and (b) the "
                             "burst coalescer's cap — the largest warm bucket — is high "
                             "enough to form maximal groups, which is what cuts burst "
                             "p99. '' disables the ladder")
    parser.add_argument("--warmup-rows", type=int, default=None,
                        help="legacy single-bucket warmup: >0 adds that bucket to the "
                             "ladder; 0 disables ALL warmup (including the ladder)")
    parser.add_argument("--max-wave-width", type=int, default=256,
                        help="raw waveform width cap for the width-agnostic preprocess "
                             "program: requests up to this wide reuse ONE compiled "
                             "program per row bucket (padded rows + traced resample "
                             "coefficients), so the warmup ladder covers them no matter "
                             "their raw width. Wider requests fall back to a per-width "
                             "compile. 0 disables (always per-width)")
    parser.add_argument("--max-isi-width", type=int, default=512,
                        help="raw ISI width cap (see --max-wave-width)")
    parser.add_argument("--warmup-async", action="store_true",
                        help="bind the port and serve immediately; the warmup "
                             "ladder compiles on a background thread (early "
                             "requests are slower — they queue behind the "
                             "in-flight ladder compiles — but the service is "
                             "reachable at once instead of after the ~2-min "
                             "cold ladder)")
    return parser


class _Item:
    __slots__ = ("wf", "isi", "source", "normalize", "event", "out", "err", "t0")

    def __init__(self, wf, isi, source, normalize):
        self.wf = wf
        self.isi = isi
        self.source = source
        self.normalize = normalize
        self.event = threading.Event()
        self.out = None
        self.err = None
        self.t0 = time.perf_counter()

    def key(self):
        # requests are row-concatenable iff widths and the (per-row, but
        # group-applied) normalize flag agree; source is per-row, not keyed
        return (self.wf.shape[1], self.isi.shape[1], bool(self.normalize))


class EmbeddingService:
    """Model-backed embedding engine shared by all server threads.

    All device work runs on ONE dispatch worker thread; HTTP threads enqueue
    and wait. Pending compatible requests are coalesced into a single device
    call (see module docstring).
    """

    def __init__(self, wave_ckpt=None, time_ckpt=None, *, z_dim: int,
                 num_sources: int = 5, num_classes: int = 5,
                 wave_artifact=None, time_artifact=None,
                 joint_ckpt=None, joint_artifact=None,
                 max_wave_width: int = 256, max_isi_width: int = 512):
        from hippie_tpu.utils.cache import enable_persistent_cache

        enable_persistent_cache()
        from hippie_tpu import export as hexport
        from hippie_tpu.models import cvae

        self._lock = threading.Lock()
        self.z_dim = z_dim
        # Width caps for the width-agnostic preprocess program (see
        # ops/preprocess.preprocess_pair_padded); 0 disables.
        self.max_wave_width = int(max_wave_width)
        self.max_isi_width = int(max_isi_width)
        self.requests = 0
        self.rows_embedded = 0
        self.total_latency = 0.0
        self.coalesced_requests = 0  # served as part of a multi-request batch
        self.device_dispatches = 0
        self._latencies = collections.deque(maxlen=8192)

        if (joint_ckpt or joint_artifact) and (
            wave_ckpt or time_ckpt or wave_artifact or time_artifact
        ):
            raise ValueError("--joint-* is exclusive with the wave/time model flags")
        self.mode = "joint" if (joint_ckpt or joint_artifact) else "dual"

        self._embed_fns = {}
        # Size of the models' source-embedding table: requests with an
        # out-of-range source would silently clamp inside the XLA gather and
        # return wrong embeddings with a 200; the handler rejects them.
        self.num_sources: int = num_sources
        if self.mode == "joint":
            if joint_artifact is not None:
                call, manifest = hexport.load_artifact(joint_artifact)
                if manifest.get("modality") != "multimodal":
                    raise ValueError(
                        f"--joint-artifact {joint_artifact} is not a multimodal "
                        f"export (modality={manifest.get('modality')!r})"
                    )
                self.z_dim = int(manifest.get("z_dim", self.z_dim))
                self.num_sources = int(manifest.get("num_sources", num_sources))
                self._embed_fns["joint"] = self._bucketed_artifact_call(call)
            else:
                params, bn, cfg = hexport.load_model_from_ckpt(joint_ckpt, multimodal=True)
                self.z_dim = cfg.z_dim
                self.num_sources = cfg.num_sources

                def _joint_embed(wave, isi, src, params=params, bn=bn):
                    from hippie_tpu.evaluate import embeddings as emb

                    # Device array: _run_group fetches after all dispatches.
                    return emb.embed_multimodal(params, bn, wave, isi, src)

                self._embed_fns["joint"] = _joint_embed
        else:
            # Each modality served from a Lightning checkpoint (library embed
            # path; geometry inferred from the state_dict's own shapes) or
            # from an exported StableHLO artifact (already traced/lowered,
            # symbolic batch, no torch needed).
            for name, ckpt, artifact in (
                ("wave", wave_ckpt, wave_artifact),
                ("time", time_ckpt, time_artifact),
            ):
                if artifact is not None:
                    call, manifest = hexport.load_artifact(artifact)
                    if manifest.get("modality") not in (None, "unimodal"):
                        raise ValueError(
                            f"--{name}-artifact {artifact} is not a unimodal "
                            f"export (modality={manifest.get('modality')!r}); "
                            f"serve multimodal artifacts with --joint-artifact"
                        )
                    want_len = 50 if name == "wave" else 100
                    got_len = manifest.get("input_len")
                    if got_len is not None and int(got_len) != want_len:
                        raise ValueError(
                            f"--{name}-artifact {artifact} expects input "
                            f"length {got_len}, but the {name} slot feeds "
                            f"resampled length {want_len} — wrong modality's "
                            f"artifact?"
                        )
                    self.z_dim = int(manifest.get("z_dim", self.z_dim))
                    self.num_sources = int(manifest.get("num_sources", num_sources))
                    self._embed_fns[name] = self._bucketed_artifact_call(call)
                elif ckpt is not None:
                    out_size = 50 if name == "wave" else 100
                    fallback = cvae.CVAEConfig(
                        z_dim=z_dim, output_size=out_size, class_hidden_dim=5,
                        num_sources=num_sources, num_classes=num_classes,
                    )
                    params, bn, cfg = hexport.load_model_from_ckpt(
                        ckpt, multimodal=False, fallback_config=fallback
                    )
                    self.z_dim = cfg.z_dim
                    self.num_sources = cfg.num_sources

                    def _lib_embed(data, src, params=params, bn=bn):
                        from hippie_tpu.evaluate import embeddings as emb

                        # Device array: _run_group fetches after all dispatches.
                        return emb.embed_unimodal(params, bn, data, src)

                    self._embed_fns[name] = _lib_embed
                else:
                    raise ValueError(f"provide --{name}-checkpoint or --{name}-artifact")

        # The single-dispatch queue: all device work funnels through here.
        self._queue: "queue.SimpleQueue[_Item]" = queue.SimpleQueue()
        # Largest row bucket a device program has been compiled for. Coalesced
        # groups are capped at this so a concurrency burst can't form a
        # never-seen bucket and stall every waiter behind one fresh XLA
        # compile (measured: a 16-client burst coalesced into a cold 1024-row
        # bucket = 62 s p99). Grows when a single oversized request forces a
        # larger bucket.
        self._max_bucket = 0
        self._worker = threading.Thread(target=self._drain, daemon=True)
        self._worker.start()

    @staticmethod
    def _bucket_rows(n: int) -> int:
        """THE row-bucket rule, shared by the live path (_run_group), the
        coalescer cap (_chunk_to_warm_buckets), artifact calls, and warmup()
        — one function so a warmed bucket is by construction the bucket a
        live request of the same row count pads to (512-floor power of two,
        hippie_tpu/evaluate/embeddings._bucket)."""
        from hippie_tpu.evaluate.embeddings import _bucket

        return _bucket(n)

    @classmethod
    def _bucketed_artifact_call(cls, call):
        from hippie_tpu.evaluate.embeddings import _pad_rows

        def run(*arrays):
            # Power-of-two row bucketing: Exported.call compiles per concrete
            # shape, so raw N would pay a fresh XLA compile per distinct
            # request size. Eval mode means pad rows cannot influence real
            # rows; they are sliced off.
            n = arrays[0].shape[0]
            b = cls._bucket_rows(n)
            out = call(*(_pad_rows(a, b) for a in arrays))
            return out[:n]

        return run

    # ------------------------------------------------------------------
    # Dispatch worker
    # ------------------------------------------------------------------

    def _drain(self):
        while True:
            first = self._queue.get()
            batch = [first]
            while True:  # coalesce whatever arrived while we were busy
                try:
                    batch.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            groups: dict = {}
            for item in batch:
                groups.setdefault(item.key(), []).append(item)
            for items in groups.values():
                for chunk in self._chunk_to_warm_buckets(items):
                    try:
                        self._run_group(chunk)
                    except BaseException as e:  # report to every UNSERVED waiter
                        for it in chunk:
                            # Only this worker thread sets events, so is_set()
                            # exactly marks items whose results were already
                            # published — never turn their success into a 500.
                            if not it.event.is_set():
                                it.err = e
                                it.event.set()

    def _chunk_to_warm_buckets(self, items):
        """Split a coalesced group so each chunk's padded bucket is one the
        device already has a compiled program for. A single request larger
        than every warm bucket runs alone (and warms its bucket)."""
        cap = self._max_bucket
        if cap <= 0:
            # Nothing is warm yet (--warmup-rows 0): run each request alone
            # so one burst can't coalesce into a giant cold bucket that
            # stalls every waiter behind a single fresh compile.
            return [[it] for it in items]
        chunks, cur, cur_rows = [], [], 0
        for it in items:
            c = len(it.wf)
            if cur and self._bucket_rows(cur_rows + c) > cap:
                chunks.append(cur)
                cur, cur_rows = [], 0
            cur.append(it)
            cur_rows += c
        if cur:
            chunks.append(cur)
        return chunks

    def _run_group(self, items):
        """ONE device call for a group of row-concatenable requests."""
        import jax
        import jax.numpy as jnp

        from hippie_tpu.ops import preprocess

        counts = [len(it.wf) for it in items]
        n = sum(counts)
        b = self._bucket_rows(n)
        w_raw = items[0].wf.shape[1]
        i_raw = items[0].isi.shape[1]
        # Width-agnostic path: pad raw widths to the caps and pass the
        # width-specific resample coefficients as a traced argument, so one
        # compiled program per row bucket serves EVERY raw width <= the caps
        # (the warmup ladder then genuinely covers first requests; without
        # this the ladder only warmed its own widths and a live client's
        # first off-width request stalled behind a fresh remote compile).
        padded = (0 < w_raw <= self.max_wave_width
                  and 0 < i_raw <= self.max_isi_width)
        w_cols = self.max_wave_width if padded else w_raw
        i_cols = self.max_isi_width if padded else i_raw
        wf_p = np.zeros((b, w_cols), np.float32)
        isi_p = np.zeros((b, i_cols), np.float32)
        src_p = np.zeros((b,), np.int32)
        off = 0
        for it, c in zip(items, counts):
            wf_p[off:off + c, :w_raw] = it.wf
            isi_p[off:off + c, :i_raw] = it.isi
            src_p[off:off + c] = int(it.source)
            off += c
        normalize = items[0].normalize
        # preprocess_pair* is the JITTED entry (ONE dispatch); the per-op
        # functions would run eagerly — multiple ~65 ms round trips per
        # request on the remote-attached chip.
        # Both preprocess entries ride the AOT executable cache (--aot-dir)
        # like the embed programs below do: on a warm service restart every
        # ladder program loads as a serialized executable instead of paying
        # trace+lower+remote-compile. cache_key hashes arg shapes/dtypes, so
        # row buckets and (for the exact path) raw widths key distinct
        # entries; the padded program's raw widths are traced scalars and
        # share one entry per bucket by design.
        from hippie_tpu.utils import aot

        if padded:
            wave, isi = aot.maybe_cached_call(
                preprocess.preprocess_pair_padded,
                (jnp.asarray(wf_p), jnp.asarray(isi_p),
                 _device_interp_matrix(w_raw, preprocess.WAVE_LEN, w_cols),
                 _device_interp_matrix(i_raw, preprocess.ISI_LEN, i_cols),
                 jnp.int32(w_raw), jnp.int32(i_raw)),
                f"serve_preprocess_padded|norm={normalize}",
                {"normalize": normalize},
            )
        else:
            wave, isi = aot.maybe_cached_call(
                preprocess.preprocess_pair,
                (jnp.asarray(wf_p), jnp.asarray(isi_p)),
                f"serve_preprocess|norm={normalize}",
                {"normalize": normalize},
            )
        src = jnp.asarray(src_p)
        if self.mode == "joint":
            j = np.asarray(jax.device_get(self._embed_fns["joint"](wave, isi, src)))
            w_all = i_all = None
        else:
            # Dispatch BOTH models before fetching anything, then fetch both
            # results in ONE device_get: on the remote-attached chip each
            # blocking fetch costs a full ~40-65 ms round trip, so
            # fetch-after-each-model paid two of them per request.
            w_dev = self._embed_fns["wave"](wave, src)
            i_dev = self._embed_fns["time"](isi, src)
            w_all, i_all = (np.asarray(a) for a in jax.device_get((w_dev, i_dev)))
            j = np.concatenate([w_all, i_all], axis=1)
        off = 0
        now = time.perf_counter()
        with self._lock:
            self.device_dispatches += 1
            self._max_bucket = max(self._max_bucket, b)
            if len(items) > 1:
                self.coalesced_requests += len(items)
        for it, c in zip(items, counts):
            sl = slice(off, off + c)
            it.out = (
                None if w_all is None else w_all[sl],
                None if i_all is None else i_all[sl],
                j[sl],
                now - it.t0,
            )
            off += c
            it.event.set()

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------

    def warmup(self, rows):
        """Pre-compile the given row bucket(s). Accepts one int or a ladder
        of them; duplicates after power-of-two bucketing are skipped. After
        this, ``_max_bucket`` equals the ladder's top, so the coalescer can
        group bursts up to that many rows into ONE device call.

        Entries bucket through ``_bucket_rows`` — the SAME rule the live
        path applies — so a sub-floor ladder entry (e.g. 64) warms the
        floor bucket that a live 64-row request will actually pad to."""
        if isinstance(rows, int):
            rows = [rows]
        # Warm the program live requests will actually take: any raw width
        # <= the caps routes to the PADDED program, so the synthetic widths
        # must stay under the caps too (hardcoded 46/100 would warm the
        # exact-width program instead whenever a cap is smaller, leaving
        # every live bucket cold — the stall the ladder exists to prevent).
        w_w = min(46, self.max_wave_width) if self.max_wave_width > 0 else 46
        w_i = min(100, self.max_isi_width) if self.max_isi_width > 0 else 100
        done = set()
        for r in sorted(int(x) for x in rows):
            b = self._bucket_rows(r) if r > 0 else 0
            if b <= 0 or b in done:
                continue
            done.add(b)
            self.embed(np.zeros((b, w_w), np.float32),
                       np.zeros((b, w_i), np.float32), 0, False)

    def embed(self, waveforms: np.ndarray, isi_dists: np.ndarray, source: int, normalize: bool):
        """Enqueue one request and wait; returns (wave, isi, joint, seconds).
        wave/isi are None in joint mode."""
        item = _Item(np.asarray(waveforms, np.float32),
                     np.asarray(isi_dists, np.float32), source, normalize)
        self._queue.put(item)
        item.event.wait()
        if item.err is not None:
            raise item.err
        w, i, j, dt = item.out
        with self._lock:
            self.requests += 1
            self.rows_embedded += len(j)
            self.total_latency += dt
            self._latencies.append(dt)
        return w, i, j, dt

    def stats(self) -> dict:
        with self._lock:
            lat = np.asarray(self._latencies, np.float64)
            return {
                "mode": self.mode,
                "requests": self.requests,
                "rows_embedded": self.rows_embedded,
                "device_dispatches": self.device_dispatches,
                "coalesced_requests": self.coalesced_requests,
                "mean_latency_ms": round(
                    1000 * self.total_latency / max(self.requests, 1), 3
                ),
                "p50_latency_ms": round(float(np.percentile(lat, 50)) * 1000, 3) if lat.size else 0.0,
                "p99_latency_ms": round(float(np.percentile(lat, 99)) * 1000, 3) if lat.size else 0.0,
            }


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
                self._reply(200, {"status": "ok", "z_dim": service.z_dim,
                                  "mode": service.mode,
                                  "num_sources": service.num_sources})
            elif self.path == "/stats":
                self._reply(200, service.stats())
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
                if not 0 <= source < service.num_sources:
                    raise ValueError(
                        f"source {source} out of range for this model "
                        f"(num_sources={service.num_sources})"
                    )
                normalize = bool(payload.get("normalize", False))
            except (KeyError, ValueError, TypeError, json.JSONDecodeError) as e:
                self._reply(400, {"error": str(e)})
                return
            try:
                w, i, j, dt = service.embed(wf, isi, source, normalize)
            except BaseException as e:
                # A worker-side failure (device error, bad row widths at
                # preprocess) must surface as a JSON 500, not a dropped
                # socket with a server-side traceback.
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})
                return
            out = {"joint": np.asarray(j).tolist(), "latency_ms": round(dt * 1000, 3)}
            if w is not None:
                out["waveform"] = np.asarray(w).tolist()
                out["isi"] = np.asarray(i).tolist()
            self._reply(200, out)

    return Handler


class EmbeddingHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer with a listen backlog sized for client bursts.

    The stdlib default request_queue_size is 5: a 16-client barrier burst
    overflows the accept queue and the kernel RESETs the excess connections
    (measured: 2/16 clients got ECONNRESET before any request was read).
    """

    request_queue_size = 128
    daemon_threads = True


def main(argv=None):
    args = build_parser().parse_args(argv)
    if getattr(args, "aot_dir", None):
        from hippie_tpu.utils import aot

        aot.set_default_dir(args.aot_dir)
    service = EmbeddingService(
        args.wave_checkpoint, args.time_checkpoint,
        z_dim=args.z_dim, num_sources=args.num_sources, num_classes=args.num_classes,
        wave_artifact=args.wave_artifact, time_artifact=args.time_artifact,
        joint_ckpt=args.joint_checkpoint, joint_artifact=args.joint_artifact,
        max_wave_width=args.max_wave_width, max_isi_width=args.max_isi_width,
    )
    ladder = [int(x) for x in args.warmup_buckets.split(",") if x.strip()] \
        if args.warmup_buckets else []
    if args.warmup_rows is not None:
        # legacy flag: 0 disables everything, >0 adds its bucket
        ladder = ladder + [args.warmup_rows] if args.warmup_rows > 0 else []
    def run_warmup():
        print(f"warming up buckets {sorted(set(ladder))}...")
        t0 = time.perf_counter()
        service.warmup(ladder)
        print(f"warmup ladder done in {time.perf_counter() - t0:.1f} s")

    if ladder and not args.warmup_async:
        run_warmup()
    server = EmbeddingHTTPServer((args.host, args.port), make_handler(service))
    if ladder and args.warmup_async:
        # All device work funnels through the service's single-dispatch
        # queue, so ladder compiles and live requests interleave safely —
        # early requests just wait behind whichever warmup entry is in
        # flight instead of behind the WHOLE ladder.
        threading.Thread(target=run_warmup, daemon=True).start()
    print(f"serving {service.mode} embeddings on http://{args.host}:{args.port} (POST /embed)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
