#!/bin/bash
# Round-5 TPU queue 5: per-modality seed-candidate generation (lr 1e-3,
# export-all) + kfold screening of each candidate start.
cd /root/repo
while kill -0 $(cat /tmp/queue4.pid) 2>/dev/null; do sleep 30; done
BASE=_r5_eval/base/ckpt/cellexplorer-celltype
SW=_r5_eval/sweep
log() { echo "[queue5 $(date +%H:%M:%S)] $*" >> _r5_eval/queue5.log; }
run() { name=$1; shift; log "START $name"; t0=$(date +%s); "$@" > _r5_eval/$name.log 2>&1; rc=$?; log "END $name rc=$rc elapsed=$(( $(date +%s) - t0 ))s"; }

run sweep_time_seeds_1e3 python scripts/lr_sweep.py --dataset cellexplorer-celltype \
  --modality time --pool pretrain --mode seeds --n-seeds 4 --lr 1e-3 \
  --max-epochs 120 --patience 30 --progress-every 30 \
  --export-all $SW/tcand_

run sweep_wave_seeds_1e3 python scripts/lr_sweep.py --dataset cellexplorer-celltype \
  --modality wave --pool pretrain --mode seeds --n-seeds 4 --lr 1e-3 \
  --max-epochs 120 --patience 30 --progress-every 30 \
  --export-all $SW/wcand_

# screen the 3e-3 seed winner time model paired with the baseline wave pool
run kfold_mix_t3e3 python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --wave-checkpoint ${BASE}_wave_model.ckpt --time-checkpoint $SW/time_seed.ckpt \
  --refit --refit-supervised-epochs 20 --fold-parallel \
  --output-dir _r5_eval/kfold_mix_t3e3

for K in 0 1 2 3; do
  run kfold_tcand$K python scripts/kfold_eval.py --dataset cellexplorer-celltype \
    --wave-checkpoint ${BASE}_wave_model.ckpt --time-checkpoint $SW/tcand_$K.ckpt \
    --refit --refit-supervised-epochs 20 --fold-parallel \
    --output-dir _r5_eval/kfold_tcand$K
done
for K in 0 1 2 3; do
  run kfold_wcand$K python scripts/kfold_eval.py --dataset cellexplorer-celltype \
    --wave-checkpoint $SW/wcand_$K.ckpt --time-checkpoint ${BASE}_time_model.ckpt \
    --refit --refit-supervised-epochs 20 --fold-parallel \
    --output-dir _r5_eval/kfold_wcand$K
done
log ALL-DONE
