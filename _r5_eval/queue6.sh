#!/bin/bash
# Round-5 TPU queue 6: warm-timing reruns for fair A/Bs.
cd /root/repo
while kill -0 $(cat /tmp/queue5.pid) 2>/dev/null; do sleep 30; done
log() { echo "[queue6 $(date +%H:%M:%S)] $*" >> _r5_eval/queue6.log; }
run() { name=$1; shift; log "START $name"; t0=$(date +%s); "$@" > _r5_eval/$name.log 2>&1; rc=$?; log "END $name rc=$rc elapsed=$(( $(date +%s) - t0 ))s"; }

# warm batch-512 pipeline (same flags as base) for the B=512 vs B=1024
# wall-clock A/B at equal cache warmth
run base512_warm_train python scripts/train_model.py --dataset cellexplorer-celltype \
  --pretrain-max-epochs 120 --finetune-max-epochs 120 --supervised-max-epochs 120 \
  --honest-eval --output-dir _r5_eval/base512_warm --checkpoint-dir _r5_eval/base512_warm/ckpt

# clean same-revision joint sequential-vs-fold-parallel warm pair
run kfold_joint_seq_warm python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --joint-checkpoint _r5_eval/base_mm/ckpt/cellexplorer-celltype_joint_model.ckpt \
  --refit --refit-supervised-epochs 20 --output-dir _r5_eval/kfold_joint_seq_warm

run kfold_joint_fp5_warm python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --joint-checkpoint _r5_eval/base_mm/ckpt/cellexplorer-celltype_joint_model.ckpt \
  --refit --refit-supervised-epochs 20 --fold-parallel --fold-parallel-max-replicas 5 \
  --output-dir _r5_eval/kfold_joint_fp5_warm

log ALL-DONE
