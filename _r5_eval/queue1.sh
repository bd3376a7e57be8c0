#!/bin/bash
# Round-5 TPU queue 1: joint baseline + baseline kfold evals (serialized)
cd /root/repo
BASE=_r5_eval/base/ckpt/cellexplorer-celltype
log() { echo "[queue1 $(date +%H:%M:%S)] $*" >> _r5_eval/queue1.log; }
run() { name=$1; shift; log "START $name"; t0=$(date +%s); "$@" > _r5_eval/$name.log 2>&1; rc=$?; log "END $name rc=$rc elapsed=$(( $(date +%s) - t0 ))s"; }

run base_mm_train python scripts/train_model_with_multimodal.py \
  --model-type multimodal --dataset cellexplorer-celltype \
  --pretrain-max-epochs 120 --finetune-max-epochs 120 --supervised-max-epochs 120 \
  --honest-eval --output-dir _r5_eval/base_mm --checkpoint-dir _r5_eval/base_mm/ckpt

run kfold_base python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --wave-checkpoint ${BASE}_wave_model.ckpt --time-checkpoint ${BASE}_time_model.ckpt \
  --refit --refit-supervised-epochs 20 --output-dir _r5_eval/kfold_base

run kfold_base_warm python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --wave-checkpoint ${BASE}_wave_model.ckpt --time-checkpoint ${BASE}_time_model.ckpt \
  --refit --refit-supervised-epochs 20 --output-dir _r5_eval/kfold_base_warm

run kfold_base_fp python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --wave-checkpoint ${BASE}_wave_model.ckpt --time-checkpoint ${BASE}_time_model.ckpt \
  --refit --refit-supervised-epochs 20 --fold-parallel --output-dir _r5_eval/kfold_base_fp

run kfold_base_fp_warm python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --wave-checkpoint ${BASE}_wave_model.ckpt --time-checkpoint ${BASE}_time_model.ckpt \
  --refit --refit-supervised-epochs 20 --fold-parallel --output-dir _r5_eval/kfold_base_fp_warm

JOINT=_r5_eval/base_mm/ckpt/cellexplorer-celltype_joint_model.ckpt
run kfold_base_joint python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --joint-checkpoint $JOINT \
  --refit --refit-supervised-epochs 20 --output-dir _r5_eval/kfold_base_joint

run kfold_base_joint_fp python scripts/kfold_eval.py --dataset cellexplorer-celltype \
  --joint-checkpoint $JOINT \
  --refit --refit-supervised-epochs 20 --fold-parallel --output-dir _r5_eval/kfold_base_joint_fp

log ALL-DONE
