#!/bin/bash
# Round-5 TPU queue 9: combined-recipe arm — screened best wave candidate
# (wcand_2, seed sweep @ lr 1e-3) + best time candidate (time_seed @ 3e-3)
# at the screening partition (42) and both confirmation partitions (43/44).
cd /root/repo
while kill -0 $(cat /tmp/queue8.pid) 2>/dev/null; do sleep 30; done
BASE=_r5_eval/base/ckpt/cellexplorer-celltype
SW=_r5_eval/sweep
log() { echo "[queue9 $(date +%H:%M:%S)] $*" >> _r5_eval/queue9.log; }
run() { name=$1; shift; log "START $name"; t0=$(date +%s); "$@" > _r5_eval/$name.log 2>&1; rc=$?; log "END $name rc=$rc elapsed=$(( $(date +%s) - t0 ))s"; }

for S in 42 43 44; do
  run kfold_s${S}_final2 python scripts/kfold_eval.py --dataset cellexplorer-celltype \
    --wave-checkpoint $SW/wcand_2.ckpt --time-checkpoint $SW/time_seed.ckpt \
    --refit --refit-supervised-epochs 20 --fold-parallel --seed $S \
    --output-dir _r5_eval/kfold_s${S}_final2
done
log ALL-DONE
