#!/bin/bash
# Round-5 TPU queue 7: serving AOT warm-restart A/B + clean --warmup-async
# measurement (queue4's async run was contaminated: its healthz/embed probes
# hit the orphaned serv_cold process still bound to 8491 — the bash-function
# background kill captured the subshell PID, not python's).
cd /root/repo
while kill -0 $(cat /tmp/queue6.pid) 2>/dev/null; do sleep 30; done
BASE=_r5_eval/base/ckpt/cellexplorer-celltype
log() { echo "[queue7 $(date +%H:%M:%S)] $*" >> _r5_eval/queue7.log; }

AOTD=/tmp/serv_aot_r5
XLAD=/tmp/jax_serv_cache_r5b
rm -rf $AOTD $XLAD

# NB: env-prefixed python run directly in the background so $! IS the
# server's PID (queue4 lesson).
start_server() { # $1=logname, rest = extra args
  name=$1; shift
  JAX_COMPILATION_CACHE_DIR=$XLAD python scripts/serve_embeddings.py \
    --wave-checkpoint ${BASE}_wave_model_supervised.ckpt \
    --time-checkpoint ${BASE}_time_model_supervised.ckpt \
    --aot-dir $AOTD --port 8492 "$@" > _r5_eval/$name.log 2>&1 &
  echo $! > /tmp/serv7.pid
}
stop_server() { kill $(cat /tmp/serv7.pid) 2>/dev/null; sleep 3
  kill -9 $(cat /tmp/serv7.pid) 2>/dev/null; }

measure() { name=$1; shift
  log "START $name"; start_server $name "$@"
  for i in $(seq 1 360); do grep -q "warmup ladder done" _r5_eval/$name.log && break; sleep 5; done
  stop_server
  log "END $name: $(grep 'warmup ladder done' _r5_eval/$name.log || echo TIMEOUT)"; }

# cold: fresh AOT + fresh XLA persistent cache
measure serv_aot_cold
# warm restart: both caches populated — the headline number
measure serv_aot_warm

# clean async liveness: warm caches, fresh process; measure time-to-healthz,
# an /embed served DURING the ladder, and the ladder duration itself
log "START serv_async2"
start_server serv_async2 --warmup-async
t0=$(date +%s%3N)
ok=""
for i in $(seq 1 400); do
  curl -s -m 2 http://127.0.0.1:8492/healthz > /tmp/hz7.json 2>/dev/null && ok=1 && break; sleep 0.25
done
t1=$(date +%s%3N)
log "healthz after $(( t1 - t0 )) ms ok=$ok: $(head -c 120 /tmp/hz7.json 2>/dev/null)"
python - << 'PY' >> _r5_eval/queue7.log 2>&1
import json, time, urllib.request
import numpy as np
rng = np.random.default_rng(0)
body = json.dumps({"waveforms": rng.normal(size=(4, 48)).tolist(),
                   "isi_dists": np.abs(rng.normal(size=(4, 100))).tolist()}).encode()
t0 = time.perf_counter()
r = urllib.request.urlopen(urllib.request.Request(
    "http://127.0.0.1:8492/embed", data=body,
    headers={"Content-Type": "application/json"}), timeout=600)
out = json.loads(r.read())
print(f"[queue7] async /embed during warmup: status {r.status}, "
      f"{time.perf_counter() - t0:.1f} s, keys={sorted(out.keys())}")
PY
for i in $(seq 1 360); do grep -q "warmup ladder done" _r5_eval/serv_async2.log && break; sleep 5; done
log "serv_async2 ladder: $(grep 'warmup ladder done' _r5_eval/serv_async2.log || echo TIMEOUT)"
stop_server
log ALL-DONE
