#!/bin/bash
# Round-5 TPU queue 8: CONFIRMATION runs for the stage-1 campaign winner.
# Screening (queues 2-5) picked recipe = baseline wave pool + time pool
# retrained with lr 3e-3 seed winner (sweep/time_seed.ckpt). Screening
# selected the max over ~12 candidates on the SAME seed-42 folds, so the
# deltas are selection-biased; these runs re-measure baseline vs winner on
# FRESH fold partitions (--seed 43/44) with the SAME fold-parallel protocol
# for both sides. Also re-partitions the r4 sup-start protocol for the
# 3-seed pooled paired test.
cd /root/repo
while kill -0 $(cat /tmp/queue7.pid) 2>/dev/null; do sleep 30; done
BASE=_r5_eval/base/ckpt/cellexplorer-celltype
SW=_r5_eval/sweep
log() { echo "[queue8 $(date +%H:%M:%S)] $*" >> _r5_eval/queue8.log; }
run() { name=$1; shift; log "START $name"; t0=$(date +%s); "$@" > _r5_eval/$name.log 2>&1; rc=$?; log "END $name rc=$rc elapsed=$(( $(date +%s) - t0 ))s"; }

for S in 43 44; do
  run kfold_s${S}_pool python scripts/kfold_eval.py --dataset cellexplorer-celltype \
    --wave-checkpoint ${BASE}_wave_model.ckpt --time-checkpoint ${BASE}_time_model.ckpt \
    --refit --refit-supervised-epochs 20 --fold-parallel --seed $S \
    --output-dir _r5_eval/kfold_s${S}_pool

  run kfold_s${S}_final python scripts/kfold_eval.py --dataset cellexplorer-celltype \
    --wave-checkpoint ${BASE}_wave_model.ckpt --time-checkpoint $SW/time_seed.ckpt \
    --refit --refit-supervised-epochs 20 --fold-parallel --seed $S \
    --output-dir _r5_eval/kfold_s${S}_final

  run kfold_s${S}_sup python scripts/kfold_eval.py --dataset cellexplorer-celltype \
    --wave-checkpoint ${BASE}_wave_model_supervised.ckpt \
    --time-checkpoint ${BASE}_time_model_supervised.ckpt \
    --refit --refit-supervised-epochs 20 --fold-parallel --seed $S \
    --output-dir _r5_eval/kfold_s${S}_sup
done
log ALL-DONE
