#!/bin/bash
# Round-5 TPU queue 2: supervised-ckpt baseline kfolds (round-4 protocol),
# then stage-1 pool sweeps (lr then seeds) per modality.
cd /root/repo
while kill -0 $(cat /tmp/queue1.pid) 2>/dev/null; do sleep 30; done
BASE=_r5_eval/base/ckpt/cellexplorer-celltype
log() { echo "[queue2 $(date +%H:%M:%S)] $*" >> _r5_eval/queue2.log; }
run() { name=$1; shift; log "START $name"; t0=$(date +%s); "$@" > _r5_eval/$name.log 2>&1; rc=$?; log "END $name rc=$rc elapsed=$(( $(date +%s) - t0 ))s"; }
winner_lr() { python - "$1" << 'PY'
import json, sys
for line in reversed(open(sys.argv[1]).read().splitlines()):
    line = line.strip()
    if line.startswith("{"):
        print(json.loads(line)["winner_lr"]); break
PY
}

# round-4 protocol baseline: refit from the STAGE-3 supervised ckpts
run kfold_base_sup python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --wave-checkpoint ${BASE}_wave_model_supervised.ckpt \
  --time-checkpoint ${BASE}_time_model_supervised.ckpt \
  --refit --refit-supervised-epochs 20 --output-dir _r5_eval/kfold_base_sup

run kfold_base_sup_fp python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --wave-checkpoint ${BASE}_wave_model_supervised.ckpt \
  --time-checkpoint ${BASE}_time_model_supervised.ckpt \
  --refit --refit-supervised-epochs 20 --fold-parallel --output-dir _r5_eval/kfold_base_sup_fp

JOINTSUP=_r5_eval/base_mm/ckpt/cellexplorer-celltype_joint_model_supervised.ckpt
run kfold_base_joint_sup python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --joint-checkpoint $JOINTSUP \
  --refit --refit-supervised-epochs 20 --output-dir _r5_eval/kfold_base_joint_sup

for MOD in wave time joint; do
  run sweep_${MOD}_lr python scripts/lr_sweep.py --dataset cellexplorer-celltype \
    --modality $MOD --pool pretrain --lrs 3e-3,1e-3,3e-4,1e-4 \
    --max-epochs 120 --patience 30 --progress-every 30 \
    --export-winner _r5_eval/sweep/${MOD}_lr.ckpt
  WLR=$(winner_lr _r5_eval/sweep_${MOD}_lr.log)
  log "winner_lr($MOD)=$WLR"
  run sweep_${MOD}_seeds python scripts/lr_sweep.py --dataset cellexplorer-celltype \
    --modality $MOD --pool pretrain --mode seeds --n-seeds 4 --lr $WLR \
    --max-epochs 120 --patience 30 --progress-every 30 \
    --export-winner _r5_eval/sweep/${MOD}_seed.ckpt
done
log ALL-DONE
