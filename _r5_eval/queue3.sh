#!/bin/bash
# Round-5 TPU queue 3: grouped-joint verify, sweep-winner screening,
# refit-budget probes, uncontended warm timing re-measures.
cd /root/repo
while kill -0 $(cat /tmp/queue2.pid) 2>/dev/null; do sleep 30; done
BASE=_r5_eval/base/ckpt/cellexplorer-celltype
SW=_r5_eval/sweep
log() { echo "[queue3 $(date +%H:%M:%S)] $*" >> _r5_eval/queue3.log; }
run() { name=$1; shift; log "START $name"; t0=$(date +%s); "$@" > _r5_eval/$name.log 2>&1; rc=$?; log "END $name rc=$rc elapsed=$(( $(date +%s) - t0 ))s"; }

# 1. grouped joint fold-parallel on the real chip (G=5; was OOM at K=10)
run kfold_joint_fp5 python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --joint-checkpoint _r5_eval/base_mm/ckpt/cellexplorer-celltype_joint_model.ckpt \
  --refit --refit-supervised-epochs 20 --fold-parallel --fold-parallel-max-replicas 5 \
  --output-dir _r5_eval/kfold_joint_fp5

# 2-3. sweep-winner screening (dual, fp, 20+20 protocol)
run kfold_swept_lr python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --wave-checkpoint $SW/wave_lr.ckpt --time-checkpoint $SW/time_lr.ckpt \
  --refit --refit-supervised-epochs 20 --fold-parallel \
  --output-dir _r5_eval/kfold_swept_lr

run kfold_swept_seed python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --wave-checkpoint $SW/wave_seed.ckpt --time-checkpoint $SW/time_seed.ckpt \
  --refit --refit-supervised-epochs 20 --fold-parallel \
  --output-dir _r5_eval/kfold_swept_seed

# 4. refit-budget probe from the baseline pool start (fp, 40+40)
run kfold_pool40 python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --wave-checkpoint ${BASE}_wave_model.ckpt --time-checkpoint ${BASE}_time_model.ckpt \
  --refit --refit-epochs 40 --refit-supervised-epochs 40 --fold-parallel \
  --output-dir _r5_eval/kfold_pool40

# 5. joint sweep winner (grouped fp)
run kfold_joint_swept python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --joint-checkpoint $SW/joint_lr.ckpt \
  --refit --refit-supervised-epochs 20 --fold-parallel --fold-parallel-max-replicas 5 \
  --output-dir _r5_eval/kfold_joint_swept

# 6. uncontended warm timings: sequential vs fold-parallel (dual, sup-start)
run kfold_seq_warm2 python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --wave-checkpoint ${BASE}_wave_model_supervised.ckpt \
  --time-checkpoint ${BASE}_time_model_supervised.ckpt \
  --refit --refit-supervised-epochs 20 --output-dir _r5_eval/kfold_seq_warm2

run kfold_fp_warm2 python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --wave-checkpoint ${BASE}_wave_model_supervised.ckpt \
  --time-checkpoint ${BASE}_time_model_supervised.ckpt \
  --refit --refit-supervised-epochs 20 --fold-parallel --output-dir _r5_eval/kfold_fp_warm2

log ALL-DONE
