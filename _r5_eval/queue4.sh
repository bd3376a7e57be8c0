#!/bin/bash
# Round-5 TPU queue 4: refit-lr screen, batch-1024 A/B, serving warm-restart.
cd /root/repo
while kill -0 $(cat /tmp/queue3.pid) 2>/dev/null; do sleep 30; done
BASE=_r5_eval/base/ckpt/cellexplorer-celltype
log() { echo "[queue4 $(date +%H:%M:%S)] $*" >> _r5_eval/queue4.log; }
run() { name=$1; shift; log "START $name"; t0=$(date +%s); "$@" > _r5_eval/$name.log 2>&1; rc=$?; log "END $name rc=$rc elapsed=$(( $(date +%s) - t0 ))s"; }

run kfold_refitlr3e4 python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --wave-checkpoint ${BASE}_wave_model.ckpt --time-checkpoint ${BASE}_time_model.ckpt \
  --refit --refit-supervised-epochs 20 --refit-lr 3e-4 --fold-parallel \
  --output-dir _r5_eval/kfold_refitlr3e4

run b1024_lr2_train python scripts/train_model.py --dataset cellexplorer-celltype \
  --batch-size 1024 --learning-rate 0.002 \
  --pretrain-max-epochs 120 --finetune-max-epochs 120 --supervised-max-epochs 120 \
  --honest-eval --output-dir _r5_eval/b1024_lr2 --checkpoint-dir _r5_eval/b1024_lr2/ckpt

run b1024_lr1_train python scripts/train_model.py --dataset cellexplorer-celltype \
  --batch-size 1024 --learning-rate 0.001 \
  --pretrain-max-epochs 120 --finetune-max-epochs 120 --supervised-max-epochs 120 \
  --honest-eval --output-dir _r5_eval/b1024_lr1 --checkpoint-dir _r5_eval/b1024_lr1/ckpt

for V in lr2 lr1; do
  CK=_r5_eval/b1024_$V/ckpt/cellexplorer-celltype
  run kfold_b1024_$V python scripts/kfold_eval.py --dataset cellexplorer-celltype \
    --wave-checkpoint ${CK}_wave_model.ckpt --time-checkpoint ${CK}_time_model.ckpt \
    --refit --refit-supervised-epochs 20 --fold-parallel \
    --output-dir _r5_eval/kfold_b1024_$V
done

# serving warm-restart: cold persistent cache, then warm, then async liveness
SERV_CACHE=/tmp/jax_serv_cache_r5
rm -rf $SERV_CACHE
serve() { JAX_COMPILATION_CACHE_DIR=$SERV_CACHE python scripts/serve_embeddings.py \
  --wave-checkpoint ${BASE}_wave_model_supervised.ckpt \
  --time-checkpoint ${BASE}_time_model_supervised.ckpt \
  --port 8491 "$@" ; }
measure() { name=$1; shift; log "START $name"; serve "$@" > _r5_eval/$name.log 2>&1 & echo $! > /tmp/serv.pid
  for i in $(seq 1 360); do grep -q "warmup ladder done" _r5_eval/$name.log && break; sleep 5; done
  kill $(cat /tmp/serv.pid) 2>/dev/null; sleep 3
  log "END $name: $(grep 'warmup ladder done' _r5_eval/$name.log || echo TIMEOUT)"; }
measure serv_cold
measure serv_warm

log "START serv_async"
serve --warmup-async > _r5_eval/serv_async.log 2>&1 & echo $! > /tmp/serv.pid
t0=$(date +%s%3N)
for i in $(seq 1 200); do
  curl -s -m 2 http://127.0.0.1:8491/healthz > /tmp/hz.json 2>/dev/null && break; sleep 0.25
done
t1=$(date +%s%3N)
log "healthz after $(( t1 - t0 )) ms: $(cat /tmp/hz.json 2>/dev/null | head -c 120)"
python - << 'PY' >> _r5_eval/queue4.log 2>&1
import json, time, urllib.request
import numpy as np
rng = np.random.default_rng(0)
body = json.dumps({"waveforms": rng.normal(size=(4, 48)).tolist(),
                   "isi_dists": np.abs(rng.normal(size=(4, 100))).tolist()}).encode()
t0 = time.perf_counter()
r = urllib.request.urlopen(urllib.request.Request(
    "http://127.0.0.1:8491/embed", data=body,
    headers={"Content-Type": "application/json"}), timeout=600)
out = json.loads(r.read())
keys = sorted(out.keys())
print(f"[queue4] async /embed during warmup: status {r.status}, "
      f"{time.perf_counter() - t0:.1f} s, keys={keys}")
PY
kill $(cat /tmp/serv.pid) 2>/dev/null
log ALL-DONE
