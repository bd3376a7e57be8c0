#!/bin/bash
# Round-5 TPU queue 11: ds2 confirmation — screened wave candidate 3 +
# BASELINE time pool (the swept 3e-3 time start failed the ds2 screen;
# per-dataset screening is the recipe).
cd /root/repo
DS=juxtacellular-mouse-s1-celltype
B=_r5_eval/ds2_base/ckpt/${DS}
log() { echo "[queue11 $(date +%H:%M:%S)] $*" >> _r5_eval/queue11.log; }
run() { name=$1; shift; log "START $name"; t0=$(date +%s); "$@" > _r5_eval/$name.log 2>&1; rc=$?; log "END $name rc=$rc elapsed=$(( $(date +%s) - t0 ))s"; }
for S in 42 43 44; do
  run ds2_kfold_s${S}_final python scripts/kfold_eval.py --dataset $DS \
    --wave-checkpoint _r5_eval/ds2_wcand_3.ckpt --time-checkpoint ${B}_time_model.ckpt \
    --refit --refit-supervised-epochs 20 --fold-parallel --seed $S \
    --output-dir _r5_eval/ds2_kfold_s${S}_final
done
log ALL-DONE
